"""SparkSession factory tuned for this engine.

Local-mode defaults mirror what we'd set on a real cluster: AQE on
(runtime re-planning, skew-join splitting, partition coalescing),
UTC session timezone (oracle comparability), Arrow enabled for the
few Pandas-UDF paths (LLM extension ops only).

At 100 TB the same code runs with ``master`` unset (cluster manager
provides it) and ``spark.sql.shuffle.partitions`` sized to
~2-3x total executor cores; AQE coalescing makes the exact number
less critical.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "feature_store_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.int96RebaseModeInRead", "CORRECTED")
        .config("spark.sql.parquet.datetimeRebaseModeInRead", "CORRECTED")
        # Fixture events.parquet stores TIMESTAMP(NANOS); read as long
        # and convert in tables.load_table (Spark has no ns timestamps).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # ObjectHashAggregate (collect_set/collect_list/hll paths)
        # falls back to SORT-BASED aggregation after only 128 distinct
        # keys per partition by default — any realistic group count
        # triggers it and the whole aggregate pays a per-partition sort
        # (measured 2.1x on the 1M-row events aggregate at sf~1).
        # 128k keys/partition at ~1-2 KB per small-set buffer bounds
        # the map at ~128-256 MB/partition — safe on 4 GB+ executors;
        # aggregates with UNBOUNDED per-key state should not rely on
        # this and belong in countDistinct/Expand form instead.
        .config(
            "spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
            "131072",
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
