"""Z-order layout operator: key arithmetic pinned against a Python
model, clustering preserves rows, and the layout measurably prunes
parquet row groups on BOTH dimensions of a box filter (the property
the operator exists for). Cross-engine key equality is covered by the
l1_zorder_key oracle row."""

from __future__ import annotations

import shutil
import tempfile

import duckdb
import pytest
from pyspark.sql import functions as F

from feature_store_spark.operators.layout import (
    DEFAULT_BITS,
    cluster_by_zorder,
    zorder_key,
)


def _model_key(vals, los, his, bits=DEFAULT_BITS):
    """Reference Python model: quantize each dim then Morton-interleave."""
    m = (1 << bits) - 1
    qs = [
        0 if hi == lo else ((v - lo) * m) // (hi - lo)
        for v, lo, hi in zip(vals, los, his)
    ]
    key = 0
    for b in range(bits):
        for i, q in enumerate(qs):
            key |= ((q >> b) & 1) << (b * len(qs) + i)
    return key


def test_zorder_key_matches_python_model(spark):
    rows = [
        (i, (i * 37) % 1000, (i * 911 + 13) % 50_000) for i in range(1000)
    ]
    df = spark.createDataFrame(rows, "rid long, a long, b long")
    out = {
        r["rid"]: r["zkey"]
        for r in zorder_key(df, ["a", "b"]).collect()
    }
    a_vals = [r[1] for r in rows]
    b_vals = [r[2] for r in rows]
    los = (min(a_vals), min(b_vals))
    his = (max(a_vals), max(b_vals))
    for rid, a, b in rows:
        assert out[rid] == _model_key((a, b), los, his), rid


def test_zorder_key_three_dims_and_constant_column(spark):
    df = spark.createDataFrame(
        [(1, 5, 7, 100), (2, 9, 7, 200)], "rid long, a long, b long, c long"
    )
    out = {r["rid"]: r["zkey"] for r in zorder_key(df, ["a", "b", "c"]).collect()}
    # b is constant -> bucket 0 everywhere; a/c span {min,max} -> 0 or max
    assert out[1] == _model_key((5, 7, 100), (5, 7, 100), (9, 7, 200))
    assert out[2] == _model_key((9, 7, 200), (5, 7, 100), (9, 7, 200))


def test_zorder_key_validates_inputs(spark):
    df = spark.createDataFrame([(1, 2)], "a long, b long")
    with pytest.raises(ValueError, match="1..3"):
        zorder_key(df, [])
    with pytest.raises(ValueError, match="int64"):
        zorder_key(df, ["a", "b"], bits=32)


def test_zorder_key_overflow_range_raises_targeted_error(spark):
    """A column whose range exceeds (2^63-1) >> bits (e.g. epoch
    MICROS) must fail with the named-column guard message, not an
    opaque ANSI ARITHMETIC_OVERFLOW mid-write."""
    df = spark.createDataFrame(
        [(0, 0), (1, (1 << 62))], "rid long, t long"
    )
    with pytest.raises(Exception, match="zorder_key: range of column t"):
        zorder_key(df, ["t"]).collect()
    # just inside the cap still computes exactly
    cap = ((1 << 63) - 1) >> DEFAULT_BITS
    ok = spark.createDataFrame([(0, 0), (1, cap)], "rid long, t long")
    out = {r["rid"]: r["zkey"] for r in zorder_key(ok, ["t"]).collect()}
    assert out[0] == 0 and out[1] == (1 << DEFAULT_BITS) - 1


def test_zorder_key_signed_span_guard_does_not_itself_overflow(spark):
    """A signed column spanning more than int64 (hi>0, lo<0,
    |hi|+|lo| >= 2^63) used to make the guard's own `hi - lo`
    subtraction raise ANSI ARITHMETIC_OVERFLOW — the exact opaque
    failure the guard was added to replace. It must fire the targeted
    message instead, and a negative-lo column *inside* the cap must
    still quantize exactly."""
    df = spark.createDataFrame(
        [(0, -(1 << 62)), (1, (1 << 62))], "rid long, t long"
    )
    with pytest.raises(Exception, match="zorder_key: range of column t"):
        zorder_key(df, ["t"]).collect()
    # negative lo, range inside the cap: exact rank-space quantization
    ok = spark.createDataFrame(
        [(0, -1000), (1, 0), (2, 1000)], "rid long, t long"
    )
    out = {r["rid"]: r["zkey"] for r in zorder_key(ok, ["t"]).collect()}
    m = (1 << DEFAULT_BITS) - 1
    assert out == {0: 0, 1: (1000 * m) // 2000, 2: m}


def test_cluster_by_zorder_preserves_rows_and_prunes_groups(spark):
    """The whole point of the layout: same rows, but a stats-driven
    scan of a 2-D box filter reads strictly fewer row groups than the
    unsorted layout (deterministic grid input, fixed group size)."""
    df = spark.range(20_000).select(
        F.col("id").alias("rid"),
        ((F.col("id") * 37) % 1000).alias("a"),
        ((F.col("id") * 911 + 13) % 50_000).alias("b"),
    )
    clustered = cluster_by_zorder(df, ["a", "b"], partitions=1)
    assert "__zkey" not in clustered.columns
    assert clustered.count() == 20_000

    tmp = tempfile.mkdtemp(prefix="zorder_test_")
    try:
        for name, frame in (("plain", df.coalesce(1)), ("z", clustered)):
            (
                frame.write.mode("overwrite")
                .option("parquet.block.size", 32 * 1024)
                .parquet(f"{tmp}/{name}")
            )
        con = duckdb.connect()

        def read_groups(path):
            q = f"""
            WITH rg AS (
              SELECT row_group_id,
                     MAX(CASE WHEN path_in_schema='a'
                         THEN CAST(stats_min AS BIGINT) END) AS a_min,
                     MAX(CASE WHEN path_in_schema='a'
                         THEN CAST(stats_max AS BIGINT) END) AS a_max,
                     MAX(CASE WHEN path_in_schema='b'
                         THEN CAST(stats_min AS BIGINT) END) AS b_min,
                     MAX(CASE WHEN path_in_schema='b'
                         THEN CAST(stats_max AS BIGINT) END) AS b_max
              FROM parquet_metadata('{path}/*.parquet')
              GROUP BY row_group_id
            )
            SELECT COUNT(*),
                   COUNT(*) FILTER (WHERE a_max >= 100 AND a_min <= 200
                                      AND b_max >= 5000 AND b_min <= 10000)
            FROM rg
            """
            return con.execute(q).fetchone()

        total_p, read_p = read_groups(f"{tmp}/plain")
        total_z, read_z = read_groups(f"{tmp}/z")
        assert total_p > 4 and total_z > 4  # group size small enough
        assert read_p == total_p  # unsorted layout prunes nothing
        assert read_z < read_p  # z-order strictly prunes the box scan
        # rows are preserved exactly
        n_p, n_z = con.execute(
            f"""SELECT (SELECT COUNT(*) FROM '{tmp}/plain/*.parquet'),
                       (SELECT COUNT(*) FROM '{tmp}/z/*.parquet')"""
        ).fetchone()
        assert n_p == n_z == 20_000
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
