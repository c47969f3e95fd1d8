"""Window / ranking operators (SURVEY.md §2.5)."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def latest_per_key(
    df: DataFrame,
    key_cols: Sequence[str],
    order_col: str,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Newest record per key (reference ``SELECT DISTINCT ON (user_id)
    ... ORDER BY user_id, report_date DESC``, `sql/risk_features.sql:57-72`).

    row_number over a per-key window — one shuffle on the key. The
    optional tiebreak column pins determinism when order_col ties
    (DISTINCT ON in PG is otherwise nondeterministic). At scale this is
    the standard dedup-to-latest pattern; AQE handles key skew.
    """
    order = [F.col(order_col).desc()]
    if tiebreak_col:
        order.append(F.col(tiebreak_col).desc())
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def top_k(df: DataFrame, order_by: Sequence[Column], k: int) -> DataFrame:
    """Global top-K (reference ``ORDER BY ... DESC LIMIT 100``,
    `tests/benchmarks/database_comparison.py:177`). Spark physical plan
    is TakeOrderedAndProject: per-partition top-K then a single merge —
    no full sort, no full shuffle."""
    return df.orderBy(*order_by).limit(k)


def top_k_per_group(
    df: DataFrame,
    key_cols: Sequence[str],
    order_by: Sequence[Column],
    k: int,
    rank_col: str | None = None,
) -> DataFrame:
    """Top-K within each group via row_number — one shuffle on the
    key. ``rank_col`` keeps the 1..k rank in the output (callers must
    make ``order_by`` total for a deterministic rank)."""
    w = Window.partitionBy(*key_cols).orderBy(*order_by)
    out = df.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") <= k
    )
    if rank_col is None:
        return out.drop("__rn")
    return out.withColumnRenamed("__rn", rank_col)


def sessionize(
    df: DataFrame,
    gap_minutes: int = 30,
    key_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Assign a per-key ``session_id`` (1, 2, …) by gap-based
    sessionization: a session extends while the next event arrives
    strictly within ``gap_minutes`` of the previous one (half-open
    boundary — an event exactly at the gap starts a NEW session,
    matching ``F.session_window``'s [start, start+gap) semantics so
    the batch and streaming forms agree).

    The lag + cumulative-flag shape costs one shuffle on the key and
    two window passes over already-sorted partitions — the standard
    distributed sessionization; state per partition is one row.
    Timestamps are compared at second granularity (``unix_timestamp``
    truncates), the documented cross-engine parity choice."""
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    prev = F.lag(ts_col).over(w)
    gap_s = gap_minutes * 60
    new_s = F.when(
        prev.isNull()
        | (
            F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev)
            >= gap_s
        ),
        1,
    ).otherwise(0)
    sess_id = F.sum(new_s).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn("session_id", sess_id)
