"""Multi-dimensional data-layout clustering (Z-order), the
Delta/Iceberg `OPTIMIZE ZORDER BY` primitive re-expressed as plain
relational arithmetic.

Why this is a 100 TB operator and not a toy: parquet scan pruning is
driven by per-row-group min/max statistics, and a table sorted by ONE
column only prunes predicates on that column. Interleaving the bits of
k quantized columns into a single sort key gives every participating
column locality ∝ 2^(-bits/k) per row group, so a box filter
(`user BETWEEN ... AND value BETWEEN ...`) skips row groups on ALL k
dimensions from one layout. The key computation is exact bigint
arithmetic (rank-space quantization + bit interleave), so the same
rows get the same key on any engine, any cluster size — and the
DuckDB twin makes it oracle-checkable.

Scale posture: one tiny min/max aggregate (broadcast back as
literals), then a narrow per-row projection; the clustering write is
``repartitionByRange`` on the key (Spark's range partitioner samples
the key distribution) + ``sortWithinPartitions`` — the standard
distributed sort, no driver involvement. Literature: Morton order
(public domain, Morton 1966); Delta Lake's OPTIMIZE ZORDER publicly
documents the same rank-space interleave.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 16 bits per dimension: 65k rank buckets is finer than any realistic
# row-group count, and 16 bits * up to 3 dims stays far inside int64.
DEFAULT_BITS = 16
MAX_DIMS = 3


def _quantize(col_name: str, bits: int) -> Column:
    """Exact rank-space quantization to [0, 2^bits): floor of
    (v - lo) * (2^bits - 1) / (hi - lo) in pure bigint arithmetic —
    SQL `div` (integer division; operands are non-negative after the
    min-offset, so truncation == floor == DuckDB's `//`). No float
    division anywhere, so the key is bit-identical cross-engine even
    when the scaled numerator exceeds double's 2^53 exact range.
    A constant column (hi == lo) maps everything to bucket 0.

    The numerator (v - lo) * (2^bits - 1) must stay inside int64, so
    the column RANGE is capped at (2^63 - 1) / (2^bits - 1) — ~1.4e14
    at the default 16 bits. Epoch-seconds/millis and cents columns sit
    far inside that; an epoch-MICROS column does not. Rather than let
    ANSI mode abort the whole write mid-job with an opaque
    ARITHMETIC_OVERFLOW, the range is checked in the same broadcast
    bounds row and raises a targeted error naming the column and the
    fix (coarsen the unit, or lower ``bits``)."""
    m = (1 << bits) - 1
    safe = ((1 << 63) - 1) >> bits  # range cap keeps the numerator < 2^63
    c, lo, hi = col_name, f"__lo_{col_name}", f"__hi_{col_name}"
    # The cap comparison itself must not overflow: `hi - lo` wraps when a
    # signed column spans more than int64 (hi>0, lo<0, |hi|+|lo| >= 2^63),
    # which under ANSI mode raises the very ARITHMETIC_OVERFLOW this guard
    # exists to replace. `hi > try_add(lo, safe)` never overflows in the
    # direction that matters: try_add only returns NULL when lo is so large
    # positive that lo+safe exceeds int64 — and then hi-lo < safe by
    # construction (hi <= int64max), so the NULL comparison correctly
    # falls through to the quantize branch. When lo is negative (the only
    # way the old subtraction could wrap), lo+safe is always in range and
    # the guard fires as intended.
    return F.expr(
        f"CASE WHEN {hi} > try_add({lo}, {safe}) THEN "
        f"CAST(raise_error('zorder_key: range of column {c} exceeds the "
        f"exact-arithmetic cap {safe} at bits={bits}; coarsen the unit "
        f"(e.g. epoch seconds, not micros) or lower bits') AS BIGINT) "
        f"WHEN {hi} = {lo} THEN CAST(0 AS BIGINT) ELSE "
        f"((CAST({c} AS BIGINT) - {lo}) * {m}) div ({hi} - {lo}) END"
    )


def _interleave(qs: list[Column], bits: int) -> Column:
    """Morton interleave: output bit (b * len(qs) + i) is bit b of
    quantized column i. Chain of shift/and/or terms — whole-stage
    codegen folds it into straight-line long arithmetic."""
    key = F.lit(0).cast("long")
    n = len(qs)
    for b in range(bits):
        for i, q in enumerate(qs):
            key = key.bitwiseOR(
                F.shiftleft(
                    F.shiftright(q, b).bitwiseAND(F.lit(1)), b * n + i
                )
            )
    return key


def zorder_key(
    df: DataFrame,
    cols: list[str],
    bits: int = DEFAULT_BITS,
    key_name: str = "zkey",
) -> DataFrame:
    """Append the Z-order clustering key over ``cols`` (bigint-valued
    columns — cast dates/timestamps to epoch and doubles to fixed-point
    cents upstream, the repo-wide exact-arithmetic rule).

    One pass: a 1-row global min/max aggregate per column (broadcast
    as a literal cross join — the a7/a22 pattern), then the quantize +
    interleave projection. No shuffle of the data itself.
    """
    if not 1 <= len(cols) <= MAX_DIMS:
        raise ValueError(
            f"zorder_key takes 1..{MAX_DIMS} columns, got {len(cols)}"
        )
    if bits * len(cols) > 62:
        raise ValueError(
            f"bits={bits} x {len(cols)} dims exceeds the int64 key"
        )
    aggs = []
    for c in cols:
        aggs.append(F.min(F.col(c).cast("long")).alias(f"__lo_{c}"))
        aggs.append(F.max(F.col(c).cast("long")).alias(f"__hi_{c}"))
    bounds = df.agg(*aggs)
    joined = df.crossJoin(F.broadcast(bounds))
    qs = [_quantize(c, bits) for c in cols]
    out_cols = [F.col(c) for c in df.columns]
    return joined.select(
        *out_cols, _interleave(qs, bits).alias(key_name)
    )


def cluster_by_zorder(
    df: DataFrame,
    cols: list[str],
    bits: int = DEFAULT_BITS,
    partitions: int | None = None,
) -> DataFrame:
    """The layout op: range-partition + sort by the Z-key so a
    subsequent parquet write gets row groups tight on every clustered
    dimension. The key column is dropped — it is a layout device, not
    data (min/max stats on the ORIGINAL columns do the pruning)."""
    keyed = zorder_key(df, cols, bits=bits, key_name="__zkey")
    parted = (
        keyed.repartitionByRange(partitions, "__zkey")
        if partitions
        else keyed.repartitionByRange("__zkey")
    )
    return parted.sortWithinPartitions("__zkey").drop("__zkey")


def zorder_key_oracle_sql(
    table: str,
    cols: list[str],
    bits: int = DEFAULT_BITS,
    key_name: str = "zkey",
    select_cols: list[str] | None = None,
) -> str:
    """DuckDB twin of :func:`zorder_key` — same bigint quantize (``//``
    floors like Spark's try_divide+cast on the non-negative operands
    produced by the min-offset) and the same interleave unrolled."""
    m = (1 << bits) - 1
    agg = ", ".join(
        f"MIN(CAST({c} AS BIGINT)) AS lo_{c}, "
        f"MAX(CAST({c} AS BIGINT)) AS hi_{c}"
        for c in cols
    )
    q_exprs = []
    for c in cols:
        q_exprs.append(
            f"CASE WHEN hi_{c} = lo_{c} THEN 0 ELSE "
            f"((CAST({c} AS BIGINT) - lo_{c}) * {m}) // (hi_{c} - lo_{c}) "
            f"END AS q_{c}"
        )
    n = len(cols)
    terms = []
    for b in range(bits):
        for i, c in enumerate(cols):
            terms.append(f"(((q_{c} >> {b}) & 1) << {b * n + i})")
    key_expr = " | ".join(terms)
    out = ", ".join(select_cols or cols)
    return f"""
    WITH bounds AS (SELECT {agg} FROM {table}),
    quant AS (
      SELECT t.*, {', '.join(q_exprs)}
      FROM {table} t CROSS JOIN bounds
    )
    SELECT {out}, CAST({key_expr} AS BIGINT) AS {key_name}
    FROM quant
    """
