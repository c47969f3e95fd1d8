"""Measure what Z-order clustering actually buys at the storage layer.

Writes the same orders projection three ways — unsorted (as-loaded),
sorted by o_custkey alone, and Z-ordered on (o_custkey, price_cents) —
with small parquet row groups, then for a family of 2-D box filters
counts how many row groups a min/max-stats-driven scan must read under
each layout (containment computed from parquet_metadata, so the number
is engine-independent: every stats-aware scanner — Spark, DuckDB,
Iceberg readers — prunes exactly these groups).

Run: python scripts_dev/zorder_prune_probe.py [sf_dir]
"""

from __future__ import annotations

import shutil
import sys
import tempfile

sys.path.insert(0, "/root/repo")

import duckdb
from pyspark.sql import functions as F

from feature_store_spark.operators.layout import cluster_by_zorder, zorder_key
from feature_store_spark.session import get_spark
from feature_store_spark.tables import load_table

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
ROWS_PER_GROUP = 4096


def write(df, path):
    (
        df.coalesce(1)
        .write.mode("overwrite")
        .option("parquet.block.size", 64 * 1024)  # small groups
        .parquet(path)
    )


def groups_read(con, path, ck_lo, ck_hi, pc_lo, pc_hi):
    """Row groups whose min/max box intersects the filter box = groups
    a stats-pruned scan reads; plus total groups and rows inside."""
    q = f"""
    WITH rg AS (
      SELECT row_group_id,
             MAX(CASE WHEN path_in_schema = 'o_custkey'
                 THEN CAST(stats_min AS BIGINT) END) AS ck_min,
             MAX(CASE WHEN path_in_schema = 'o_custkey'
                 THEN CAST(stats_max AS BIGINT) END) AS ck_max,
             MAX(CASE WHEN path_in_schema = 'price_cents'
                 THEN CAST(stats_min AS BIGINT) END) AS pc_min,
             MAX(CASE WHEN path_in_schema = 'price_cents'
                 THEN CAST(stats_max AS BIGINT) END) AS pc_max
      FROM parquet_metadata('{path}/*.parquet')
      GROUP BY row_group_id
    )
    SELECT COUNT(*) AS total,
           COUNT(*) FILTER (
             WHERE ck_max >= {ck_lo} AND ck_min <= {ck_hi}
               AND pc_max >= {pc_lo} AND pc_min <= {pc_hi}
           ) AS read
    FROM rg
    """
    total, read = con.execute(q).fetchone()
    return total, read


def main():
    spark = get_spark(
        "zorder_probe",
        shuffle_partitions=8,
        extra_conf={
            "spark.hadoop.parquet.block.size": str(64 * 1024),
        },
    )
    orders = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias(
            "price_cents"
        ),
    )
    tmp = tempfile.mkdtemp(prefix="zorder_probe_")
    con = duckdb.connect()
    try:
        write(orders, f"{tmp}/plain")
        write(
            orders.repartitionByRange(1, "o_custkey").sortWithinPartitions(
                "o_custkey"
            ),
            f"{tmp}/bycust",
        )
        write(
            cluster_by_zorder(
                orders, ["o_custkey", "price_cents"], partitions=1
            ),
            f"{tmp}/zorder",
        )

        lo, hi, plo, phi = con.execute(
            f"""SELECT MIN(o_custkey), MAX(o_custkey),
                      MIN(CAST(round(o_totalprice*100) AS BIGINT)),
                      MAX(CAST(round(o_totalprice*100) AS BIGINT))
               FROM '{SF_DIR}/orders.parquet'"""
        ).fetchone()

        # 10% x 10% box filters at varied corners
        span_c, span_p = hi - lo, phi - plo
        boxes = [
            (lo + int(f_c * span_c), lo + int((f_c + 0.1) * span_c),
             plo + int(f_p * span_p), plo + int((f_p + 0.1) * span_p))
            for f_c in (0.0, 0.45, 0.9)
            for f_p in (0.0, 0.45, 0.9)
        ]
        agg = {"plain": [0, 0], "bycust": [0, 0], "zorder": [0, 0]}
        for box in boxes:
            for layout in agg:
                total, read = groups_read(con, f"{tmp}/{layout}", *box)
                agg[layout][0] += total
                agg[layout][1] += read
        print(f"{len(boxes)} box filters (10% x 10%), "
              f"row groups read / total:")
        for layout, (total, read) in agg.items():
            print(f"  {layout:8s} {read:4d} / {total} "
                  f"({100.0 * read / total:.1f}% read)")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
