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

from feature_store_spark.queries import all_oracle_sql, all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    qs = all_queries()
    return qs["pipeline_user_features"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for each queries() key (keys without
    SQL are non-SQL-expressible ops → rows-only check)."""
    return all_oracle_sql()
