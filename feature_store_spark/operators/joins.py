"""Non-equi join operators (beyond the reference surface — all its
joins are equi on ``user_id``, SURVEY.md §2.3; these are the temporal
join primitives a training-data/feature pipeline needs on top).

See also :func:`feature_store_spark.operators.windows.asof_join`
(point-in-time) and :func:`feature_store_spark.operators.skew.salted_join`
(heavy-hitter equi keys).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def band_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    band_seconds: int = 300,
    suffix: str = "_r",
) -> DataFrame:
    """Inner join of rows sharing ``on`` keys whose timestamps lie
    within ``band_seconds`` of each other (|t_l − t_r| ≤ band) — the
    banded interval join (e.g., "clicks within ±5 minutes of each
    error").

    A naive theta-join on the band predicate degenerates to a per-key
    cross product (O(n·m) comparisons; at corpus scale, a broadcast
    nested loop or worse). This implementation buckets time into
    ``band_seconds``-wide cells: the right side lands in its own cell,
    the left side probes its cell ±1 (explode ×3), and the join is a
    pure EQUI join on (keys, cell) with the exact band predicate as a
    residual filter. |Δt| ≤ band ⇒ cell indices differ by ≤ 1, and
    each right row occupies exactly one cell, so every qualifying pair
    is produced exactly once — no dedup pass. Shuffle is hash on
    (keys, cell); a hot (key, cell) is split by AQE skew handling.

    Timestamps compare at second granularity (``unix_timestamp``
    truncates — the documented cross-engine parity choice; DuckDB
    oracles must use ``epoch(date_trunc('second', ts))``). Right
    columns colliding with left names (other than keys) get
    ``suffix``.
    """
    if band_seconds <= 0:
        raise ValueError(f"band_seconds must be positive: {band_seconds}")
    keys = list(on)
    renamed = right
    for c in right.columns:
        if c not in keys and c in left.columns:
            renamed = renamed.withColumnRenamed(c, c + suffix)
    r_ts = (
        right_ts
        if right_ts in keys or right_ts not in left.columns
        else right_ts + suffix
    )
    lsec = F.unix_timestamp(F.col(left_ts))
    rsec = F.unix_timestamp(F.col(r_ts))
    cell = F.floor(lsec / band_seconds)
    lhs = left.withColumn(
        "__cell", F.explode(F.array(cell - 1, cell, cell + 1))
    )
    rhs = renamed.withColumn("__cell", F.floor(rsec / band_seconds))
    return (
        lhs.join(rhs, keys + ["__cell"])
        .filter(F.abs(lsec - rsec) <= band_seconds)
        .drop("__cell")
    )
