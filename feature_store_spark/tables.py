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


def load_flat_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """The flat-parquet fixture read, always — bypasses the bucketed
    redirect (the bucketed materializer itself reads through this)."""
    import os

    # a directory `{sf_dir}/{name}/` is a partitioned table root
    # (write_month_partitioned layout) — partition discovery gives
    # the scan its partition column; the flat fixture stays the
    # single-file read
    root = f"{sf_dir}/{name}"
    path = root if os.path.isdir(root) else f"{root}.parquet"
    df = spark.read.parquet(path)
    if name == "events" and isinstance(df.schema["ts"].dataType, LongType):
        # the fixture events.ts is parquet TIMESTAMP(NANOS) —
        # surfaced as long nanos under
        # spark.sql.legacy.parquet.nanosAsLong; truncate to
        # microseconds exactly like DuckDB's ns→us read-time cast.
        # (A µs-typed events file — e.g., rewritten by another
        # engine — loads as a plain timestamp and is left alone.)
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Fixture loader every query goes through. Under
    ``SPARK_GRAFT_BUCKETED_FACTS=1`` the declared fact tables
    (orders/lineitem/events) are served from their co-bucketed
    catalog layout (pipelines/facts.py — materialized on first
    touch), so every orderkey join and user-keyed events operator
    reads pre-co-partitioned data; otherwise the flat parquet read.
    Results are layout-independent (tests/test_facts_layout.py)."""
    from feature_store_spark.pipelines.facts import (
        FACT_BUCKET_KEYS,
        bucketed_enabled,
        bucketed_fact,
    )

    cache = getattr(spark, _CACHE_ATTR, None)
    if cache is None:
        cache = {}
        setattr(spark, _CACHE_ATTR, cache)
    bucketed = bucketed_enabled() and name in FACT_BUCKET_KEYS
    # bucket count in the key: a mid-session SPARK_GRAFT_FACT_BUCKETS
    # change must not serve a frame built for the old layout
    from feature_store_spark.pipelines.facts import default_fact_buckets

    key = (sf_dir, name, bucketed and default_fact_buckets())
    if key not in cache:
        from feature_store_spark.pipelines.facts import projection_frame

        cache[key] = (
            bucketed_fact(spark, sf_dir, name)
            if bucketed
            # a secondary projection falls back to its logical content
            # computed from the flat fixtures when bucketing is off —
            # same rows, same schema, layout-independent results
            else projection_frame(spark, sf_dir, name)
        )
    return cache[key]


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in TABLE_NAMES}


# ---------------------------------------------------------------------------
# Date-partitioned layout support
# ---------------------------------------------------------------------------
#
# A production 100 TB fact table is date-partitioned. SCALE.md §8's
# probe showed the trap: Spark does NOT infer partition bounds from a
# predicate on a different column — `to_date(o_orderdate) >= ref-31`
# over an `o_month=`-partitioned table prunes NOTHING. Every trailing
# window therefore goes through `window_scan`, which applies the fine
# date predicate AND, when the declared partition column is present in
# the schema, the implied coarse month predicate (so PartitionFilters
# engages: 2 of ~80 month partitions for a 31 d window). On the flat
# fixture files the coarse predicate is simply absent — same results
# either way (probe-verified sym-diff 0; plan test in tests/test_plans).
#
# The coarse predicate is only legal where the query's own filter
# implies it: full-history sides (e.g. the merchant join consuming ALL
# orders) must never pass through window_scan.

MONTH_PARTITIONS = {
    "o_orderdate": "o_month",
    "l_shipdate": "l_month",
}


def prune_months(
    df: DataFrame, date_col: str, ref_date: str, days: int
) -> DataFrame:
    """Coarse-ONLY partition predicate: keep month partitions that can
    contain rows within ``days`` of ``ref_date``. A no-op on flat
    (unpartitioned) inputs. Use directly when the fine predicate is
    more complex than a simple trailing window (e.g. a disjunction of
    windows whose union is bounded) — the caller keeps its own fine
    filter, this only unlocks pruning."""
    import datetime as _dt

    part = MONTH_PARTITIONS.get(date_col)
    if part and part in df.columns:
        cut = (
            _dt.date.fromisoformat(ref_date) - _dt.timedelta(days=days)
        ).strftime("%Y-%m")
        df = df.filter(F.col(part) >= cut)
    return df


def window_scan(
    df: DataFrame, date_col: str, ref_date: str, days: int
) -> DataFrame:
    """Trailing-window scan: rows with ``to_date(date_col) >=
    ref_date - days``, plus the implied partition-column predicate when
    the table carries its declared month-partition column."""
    df = prune_months(df, date_col, ref_date, days)
    ref = F.to_date(F.lit(ref_date))
    return df.filter(F.to_date(date_col) >= F.date_sub(ref, days))


def write_month_partitioned(
    df: DataFrame, path: str, date_col: str
) -> None:
    """Materialize a fact table month-partitioned on its declared
    partition column (the SCALE.md §8 layout): one directory per
    ``yyyy-MM``, clustered so each partition is one file set."""
    part = MONTH_PARTITIONS[date_col]
    (
        df.withColumn(part, F.date_format(date_col, "yyyy-MM"))
        .repartition(part)
        .write.mode("overwrite")
        .partitionBy(part)
        .parquet(path)
    )


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for spark.sql use."""
    for n in TABLE_NAMES:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
