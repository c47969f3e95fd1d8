"""Snapshot diff: row-level added/removed/changed audit between two
versions of a keyed table — the check the reference's migration
pipeline runs semantically (`sql/migration_queries.sql` count/spot
validation, `src/pipelines/migration.py`) promoted to a full
data-diff. Used to validate backfills, compare feature-store versions
before a cutover, and quantify feature drift between pipeline runs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str],
    include_values: bool = False,
) -> DataFrame:
    """Full-outer join on the key; per row emit ``status`` in
    {added, removed, changed, unchanged} and, for changed rows,
    ``changed_cols`` — the comma-joined (deterministically sorted)
    names of the columns that differ. Comparisons are null-safe
    (NULL→value and value→NULL both count as a change), so schema-
    compatible snapshots diff exactly.

    ``include_values=True`` additionally emits ``<col>_old`` /
    ``<col>_new`` for every compare column — the Delta CDF
    preimage/postimage analogue that incremental consumers (IVM,
    warehouse sync) need to fold a change into a downstream aggregate
    without re-reading either snapshot.

    Scale shape: ONE shuffle per side on the key (the join), a narrow
    projection of comparison verdicts — no windows, no second pass.
    When both stores are bucketed by the key (`pipelines/store.py`)
    even that shuffle disappears. Output is diff-proportional only if
    the caller filters ``status != 'unchanged'``; the operator keeps
    unchanged rows so completeness is auditable (counts per status
    reconcile to |old ∪ new|).

    ``key_cols`` and ``compare_cols`` must be disjoint: a key column
    listed in both would be renamed to the ``__o_``/``__n_`` compare
    slots and break the equi-join silently, so overlap raises.
    """
    overlap = set(key_cols) & set(compare_cols)
    if overlap:
        raise ValueError(
            "snapshot_diff: key_cols and compare_cols must be disjoint; "
            f"overlapping columns: {sorted(overlap)}"
        )
    cols = sorted(compare_cols)
    o = old.select(
        *key_cols, *cols, F.lit(1).alias("__in_old")
    ).toDF(*[f"__o_{c}" if c in cols else c for c in
             list(key_cols) + cols + ["__in_old"]])
    n = new.select(
        *key_cols, *cols, F.lit(1).alias("__in_new")
    ).toDF(*[f"__n_{c}" if c in cols else c for c in
             list(key_cols) + cols + ["__in_new"]])
    j = o.join(n, list(key_cols), "full_outer")

    diffs = [
        F.when(
            ~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}")), F.lit(c)
        )
        for c in cols
    ]
    changed = F.concat_ws(",", *diffs)
    status = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(changed != "", F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    values = (
        [
            c2
            for c in cols
            for c2 in (
                F.col(f"__o_{c}").alias(f"{c}_old"),
                F.col(f"__n_{c}").alias(f"{c}_new"),
            )
        ]
        if include_values
        else []
    )
    return j.select(
        *key_cols,
        status.alias("status"),
        F.when(status == "changed", changed).alias("changed_cols"),
        *values,
    )


def snapshot_diff_oracle_sql(
    old_sql: str,
    new_sql: str,
    key_cols: Sequence[str],
    compare_cols: Sequence[str],
) -> str:
    """DuckDB twin over two snapshot subqueries: same sorted column
    order, same null-safe IS DISTINCT FROM semantics, same
    NULL-skipping concat_ws. Mirrors the operator's disjointness
    check so misuse fails identically on both sides."""
    overlap = set(key_cols) & set(compare_cols)
    if overlap:
        raise ValueError(
            "snapshot_diff_oracle_sql: key_cols and compare_cols must be "
            f"disjoint; overlapping columns: {sorted(overlap)}"
        )
    cols = sorted(compare_cols)
    keys = ", ".join(key_cols)
    using = ", ".join(key_cols)
    key_sel = ", ".join(f"COALESCE(o.{k}, n.{k}) AS {k}" for k in key_cols)
    cases = ",\n             ".join(
        f"CASE WHEN o.{c} IS DISTINCT FROM n.{c} THEN '{c}' END"
        for c in cols
    )
    return f"""
    WITH o AS (SELECT *, TRUE AS __in_old FROM ({old_sql})),
         n AS (SELECT *, TRUE AS __in_new FROM ({new_sql})),
         j AS (
           SELECT {key_sel},
                  COALESCE(o.__in_old, FALSE) AS in_old,
                  COALESCE(n.__in_new, FALSE) AS in_new,
                  concat_ws(',',
             {cases}) AS changed
           FROM o FULL OUTER JOIN n USING ({using})
         )
    SELECT {keys},
           CASE WHEN NOT in_old THEN 'added'
                WHEN NOT in_new THEN 'removed'
                WHEN changed <> '' THEN 'changed'
                ELSE 'unchanged' END AS status,
           CASE WHEN in_old AND in_new AND changed <> ''
                THEN changed END AS changed_cols
    FROM j
    """


def value_drift_report(
    old: DataFrame,
    new: DataFrame,
    value_col: str,
    buckets_per_decade: int = 4,
) -> DataFrame:
    """Population-stability-index (PSI) drift report between two
    snapshots of a value distribution — the data-quality check a
    feature store runs before trusting a new pipeline run (extends the
    reference's 3σ anomaly gate, `src/pipelines/data_quality.py:44-48`,
    from per-run outliers to run-over-run distribution shift).

    Values land in the same signed log10 buckets the a19 quantile
    sketch stores (``floor(log10(v)·bpd)``, one bucket for v ≤ 0, and
    a DEDICATED bucket for NULL — a shift in NULL rate between
    snapshots is real drift but must not masquerade as v≤0
    distribution drift; both engines route NULLs identically), so
    a deployed store can compute PSI from ALREADY-MATERIALIZED sketch
    partials without rescanning either snapshot. Proportions are
    Laplace-smoothed (+0.5 per bucket over the union of buckets) so a
    bucket empty on one side contributes a finite term.

    Determinism: every proportion is one exact division of
    exactly-representable numbers; the only libm call (ln) is rounded
    to 9 decimals per bucket and the PSI total is a DECIMAL sum of
    those quantized terms — exact and order-free, so the cross-engine
    hash cannot be flipped by float-summation order (the repo-wide
    rule for aggregated doubles). Output: one row per union bucket
    with counts, smoothed shares, the quantized PSI term, and the
    (identical-on-every-row) PSI total + drift flag at the
    conventional 0.2 threshold.

    Scale shape: two map-combined groupBys on the bucket id (or zero,
    served from a19 partials), a full-outer join and windows over
    BUCKET-COUNT rows (dozens), independent of snapshot size.
    """
    from pyspark.sql import Window

    def bucketize(df):
        v = F.col(value_col)
        b = (
            F.when(v.isNull(), F.lit(-(10**9) - 1))
            .when(
                v > 0,
                F.floor(F.log10(v) * buckets_per_decade).cast("bigint"),
            )
            .otherwise(F.lit(-(10**9)))
        )
        return df.select(b.alias("bucket")).groupBy("bucket").agg(
            F.count(F.lit(1)).alias("cnt")
        )

    o = bucketize(old).withColumnRenamed("cnt", "n_old")
    n = bucketize(new).withColumnRenamed("cnt", "n_new")
    j = o.join(n, "bucket", "full_outer").select(
        "bucket",
        F.coalesce("n_old", F.lit(0)).alias("n_old"),
        F.coalesce("n_new", F.lit(0)).alias("n_new"),
    )
    w = Window.orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    B = F.count(F.lit(1)).over(w)
    tot_o = F.sum("n_old").over(w)
    tot_n = F.sum("n_new").over(w)
    p = (F.col("n_old") + 0.5) / (tot_o + 0.5 * B)
    q = (F.col("n_new") + 0.5) / (tot_n + 0.5 * B)
    term = F.round((p - q) * F.log(p / q), 9).cast("decimal(28,9)")
    out = j.select(
        "bucket",
        "n_old",
        "n_new",
        F.round(p, 6).alias("share_old"),
        F.round(q, 6).alias("share_new"),
        term.cast("double").alias("psi_term"),
    )
    psi = F.sum(term).over(w).cast("double")
    return out.withColumn("psi_total", psi).withColumn(
        "drifted", F.col("psi_total") > 0.2
    )


def value_drift_oracle_sql(
    old_sql: str,
    new_sql: str,
    value_col: str,
    buckets_per_decade: int = 4,
) -> str:
    """DuckDB twin: same buckets (incl. the dedicated NULL bucket),
    same smoothing, same per-term quantization and DECIMAL total."""
    bpd = buckets_per_decade
    zero = -(10**9)
    nul = -(10**9) - 1
    return f"""
    WITH o AS (
      SELECT CASE WHEN {value_col} IS NULL THEN {nul}
                  WHEN {value_col} > 0
                  THEN CAST(floor(log10({value_col}) * {bpd}) AS BIGINT)
                  ELSE {zero} END AS bucket, count(*) AS n_old
      FROM ({old_sql}) GROUP BY 1
    ),
    n AS (
      SELECT CASE WHEN {value_col} IS NULL THEN {nul}
                  WHEN {value_col} > 0
                  THEN CAST(floor(log10({value_col}) * {bpd}) AS BIGINT)
                  ELSE {zero} END AS bucket, count(*) AS n_new
      FROM ({new_sql}) GROUP BY 1
    ),
    j AS (
      SELECT COALESCE(o.bucket, n.bucket) AS bucket,
             COALESCE(n_old, 0) AS n_old, COALESCE(n_new, 0) AS n_new
      FROM o FULL OUTER JOIN n ON o.bucket = n.bucket
    ),
    t AS (
      SELECT bucket, n_old, n_new,
             (n_old + 0.5) / (sum(n_old) OVER () + 0.5 * count(*) OVER ())
               AS p,
             (n_new + 0.5) / (sum(n_new) OVER () + 0.5 * count(*) OVER ())
               AS q
      FROM j
    ),
    terms AS (
      SELECT bucket, n_old, n_new, p, q,
             CAST(round((p - q) * ln(p / q), 9) AS DECIMAL(28,9)) AS term
      FROM t
    )
    SELECT bucket,
           CAST(n_old AS BIGINT) AS n_old,
           CAST(n_new AS BIGINT) AS n_new,
           round(p, 6) AS share_old,
           round(q, 6) AS share_new,
           CAST(term AS DOUBLE) AS psi_term,
           CAST(sum(term) OVER () AS DOUBLE) AS psi_total,
           CAST(sum(term) OVER () AS DOUBLE) > 0.2 AS drifted
    FROM terms
    """
