"""Skew-mitigation join operator.

The engine's default posture for skewed shuffles is AQE
(``spark.sql.adaptive.skewJoin`` splits oversized sort-merge
partitions at runtime — enabled in ``session.get_spark``), and small
dimension sides should be ``broadcast()`` joined outright. Explicit
salting remains the tool for the cases AQE can't rewrite: stateful
streaming joins, hash-partitioned plans outside sort-merge, or a
single heavy-hitter key so large that even a split partition is one
task's worth of work. Reference context: all reference joins are
user_id equi-joins (SURVEY.md §2.3); user-keyed fixtures are uniform,
so this operator is exercised by an equivalence test rather than an
oracle query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Equi-join with the left side salted ``salt`` ways and the right
    side replicated once per salt value, so a heavy-hitter key's rows
    spread over ``salt`` reducers instead of one.

    The salt is uniform per left row (seeded ``rand`` — deterministic
    per partition, and the join RESULT is salt-independent either way).
    Replication multiplies the right side ×``salt``: use only when the
    right side is modest but too big (or the plan unable) to
    broadcast. ``how`` is restricted to inner/left — for right/full
    joins the replicated unmatched right rows would surface ``salt``
    times.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how='inner'|'left' only")
    if salt < 1:
        raise ValueError("salt must be >= 1")
    salt_col = "__salt"
    lefts = left.withColumn(
        salt_col, F.floor(F.rand(seed=7) * salt).cast("int")
    )
    rights = right.withColumn(
        salt_col, F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return lefts.join(rights, [*on, salt_col], how).drop(salt_col)


def skew_report(
    df: DataFrame,
    key_cols: list[str],
    top_n: int = 10,
) -> DataFrame:
    """Join-key skew profile: the top-``top_n`` heaviest key values
    with their row share and multiple-of-average — the diagnostic
    that decides WHICH mitigation a 100 TB join needs (broadcast the
    dim / AQE skew split / :func:`salted_join` / isolate the hot key).
    A shuffle on ``key_cols`` is about to hash each of these keys to
    ONE reducer; ``x_avg`` is how many average-keys'-worth of rows
    that reducer eats.

    Plan: one map-side-combined count per key (the only shuffle that
    touches data rows), then the totals ride in as a broadcast 1-row
    aggregate of the counts frame. The top-N cut is
    ``orderBy(...).limit(top_n)`` — Spark plans it as
    TakeOrderedAndProject (per-partition heap + driver merge of
    ``top_n``-row heaps), so the billion-key counts frame is never
    funneled through a single-task global window; ``rank`` is then a
    row_number over the already-cut ≤``top_n``-row frame, where a
    one-partition window costs nothing. The totals subtree re-derives
    the counts (Spark shares no uncached subtrees), so the scan runs
    twice — both passes narrow, both map-side-combined; at corpus
    scale checkpoint/cache the counts frame (key-cardinality-sized)
    or feed this operator a materialized counts table. Output is
    deterministic: count-desc with key-asc tie-break, doubles rounded
    before the cut.
    """
    counts = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("n_rows"))
    totals = counts.agg(
        F.sum("n_rows").cast("double").alias("__total"),
        F.count(F.lit(1)).cast("double").alias("__nkeys"),
    )
    order = [F.col("n_rows").desc(), *[F.col(c).asc() for c in key_cols]]
    top = (
        counts.crossJoin(F.broadcast(totals))
        .select(
            *key_cols,
            "n_rows",
            F.round(F.col("n_rows") / F.col("__total"), 6).alias("share"),
            F.round(
                F.col("n_rows") * F.col("__nkeys") / F.col("__total"), 2
            ).alias("x_avg"),
        )
        .orderBy(*order)
        .limit(top_n)
    )
    return top.withColumn("rank", F.row_number().over(Window.orderBy(*order)))


def skew_report_oracle_sql(
    table: str,
    key_cols: list[str],
    top_n: int = 10,
) -> str:
    """DuckDB twin of :func:`skew_report`."""
    keys = ", ".join(key_cols)
    order_keys = ", ".join(f"{c} ASC" for c in key_cols)
    return f"""
    WITH counts AS (
      SELECT {keys}, count(*) AS n_rows FROM {table} GROUP BY {keys}
    ),
    totals AS (
      SELECT CAST(sum(n_rows) AS DOUBLE) AS total,
             CAST(count(*) AS DOUBLE) AS nkeys
      FROM counts
    )
    SELECT {keys}, n_rows, share, x_avg, rank FROM (
      SELECT {keys}, n_rows,
             round(n_rows / t.total, 6) AS share,
             round(n_rows * t.nkeys / t.total, 2) AS x_avg,
             row_number() OVER (
               ORDER BY n_rows DESC, {order_keys}) AS rank
      FROM counts CROSS JOIN totals t
    ) WHERE rank <= {top_n}
    """
