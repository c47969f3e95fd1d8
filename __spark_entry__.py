"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query (the user-features
pipeline, SURVEY.md §3.2) at sf0.001. ``queries()`` /``oracle_sql()``
expose the SURVEY §2 operator sweep from
``feature_store_spark.queries`` — each entry is a (PySpark callable,
DuckDB oracle SQL) pair the driver hash-compares at sf0.01.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from feature_store_spark.queries import driver_oracle_sql, driver_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    qs = driver_queries()
    return qs["pipeline_user_features"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One row per operator FAMILY (≤50 so the driver's sample covers
    everything): flagship queries standalone, the rest folded into
    `suite_*` melt composites that hash-check every member's values in
    one row (see feature_store_spark/queries_composite.py). The full
    per-operator registry remains `feature_store_spark.queries.
    all_queries()` and is exercised by tests/ and bench.py."""
    return driver_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for each queries() key (keys without
    SQL are non-SQL-expressible ops → rows-only check)."""
    return driver_oracle_sql()
