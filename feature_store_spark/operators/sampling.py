"""Sampling operators (beyond the reference's ORDER BY RANDOM()
validation sample, `sql/migration_queries.sql:117-121` / O3).

Training-data curation needs per-stratum rates (e.g., downsample the
dominant language, keep all of a rare source). Engine randomness
(``F.rand``/``sampleBy``) streams differ per engine, partitioning, and
run — useless for differential testing and for reproducible dataset
builds. Sampling here is a pure hash function of the row key: the
same row set comes out on any engine, any cluster size, any run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HASH_SCALE = 1_000_000


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    key_col: str,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Keep each row iff md5-hash(key) mod 1e6 falls under its
    stratum's threshold — deterministic per-stratum Bernoulli sampling
    keyed on the row id (a row's fate never depends on partitioning or
    engine RNG). Strata not listed in ``fractions`` use
    ``default_fraction``.

    Narrow filter, no shuffle; pushdown-safe columns on either side of
    it still prune. Thresholds are integers (round(frac · 1e6)) so the
    predicate is integer-exact across engines.
    """
    h = F.expr(
        f"pmod(cast(conv(substring(md5(cast({key_col} as string)), 1, 15),"
        f" 16, 10) as bigint), {HASH_SCALE})"
    )
    threshold = F.lit(int(round(default_fraction * HASH_SCALE)))
    for stratum, frac in sorted(fractions.items()):
        threshold = F.when(
            F.col(strata_col) == stratum,
            F.lit(int(round(frac * HASH_SCALE))),
        ).otherwise(threshold)
    return df.filter(h < threshold)


def stratified_sample_oracle_sql(
    table: str,
    strata_col: str,
    fractions: dict[str, float],
    key_col: str,
    default_fraction: float = 0.0,
) -> str:
    """DuckDB twin: same 60-bit md5 prefix as an explicit nibble sum
    (DuckDB has no conv()), same integer thresholds."""
    nib = " + ".join(
        f"(strpos('0123456789abcdef', substr(md5(CAST({key_col} AS VARCHAR)),"
        f" {j + 1}, 1)) - 1) * {16 ** (14 - j)}"
        for j in range(15)
    )
    cases = " ".join(
        f"WHEN '{stratum}' THEN {int(round(frac * HASH_SCALE))}"
        for stratum, frac in sorted(fractions.items())
    )
    return f"""
    SELECT * FROM {table}
    WHERE ({nib}) % {HASH_SCALE}
          < (CASE {strata_col} {cases}
             ELSE {int(round(default_fraction * HASH_SCALE))} END)
    """
