"""Table loaders + schema registry for the driver fixtures.

The driver fixtures (TESTDATA.md) are a TPC-H-ish star schema plus an
``events`` stream table and ``documents``/``embeddings`` LLM-data
tables. FIXTURES.md §1 maps them onto the reference's BNPL entities
(customer↔users, orders↔transactions, events↔login/alert feeds).

Scale posture: loaders are plain ``spark.read.parquet`` so Catalyst
gets full pushdown/pruning; nothing is cached or collected here. On a
real lake the same API points at partitioned table roots and partition
pruning applies transparently.
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Deterministic anchors for time-windowed queries (FIXTURES.md §4):
# never use wall clock. orders/lineitem span 1995-01-01..2001-11-04;
# events span 2024-01-01..2024-01-30.
REF_DATE = "2001-08-01"  # anchor for order/lineitem windows (max o_orderdate)
EVENTS_NOW = "2024-01-31 00:00:00"  # anchor for event-stream windows


# Per-session DataFrame cache: spark.read.parquet costs ~60 ms of
# py4j + DataSource resolution per call, paid by every query that
# loads a table. DataFrames are immutable logical plans, so handing
# the same object to many queries is safe. The cache dict hangs off
# the session object itself so it dies WITH the session — a
# WeakKeyDictionary would never evict here, because each cached
# DataFrame holds a strong reference back to its session
# (DataFrame._session), keeping the weak key alive forever.
_CACHE_ATTR = "_feature_store_table_cache"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    cache = getattr(spark, _CACHE_ATTR, None)
    if cache is None:
        cache = {}
        setattr(spark, _CACHE_ATTR, cache)
    key = (sf_dir, name)
    if key not in cache:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if name == "events" and isinstance(
            df.schema["ts"].dataType, LongType
        ):
            # the fixture events.ts is parquet TIMESTAMP(NANOS) —
            # surfaced as long nanos under
            # spark.sql.legacy.parquet.nanosAsLong; truncate to
            # microseconds exactly like DuckDB's ns→us read-time cast.
            # (A µs-typed events file — e.g., rewritten by another
            # engine — loads as a plain timestamp and is left alone.)
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
        cache[key] = df
    return cache[key]


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for spark.sql use."""
    for n in TABLE_NAMES:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
