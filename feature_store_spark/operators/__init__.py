from feature_store_spark.operators.aggregates import (
    completeness_report,
    freshness_report,
    mode_deterministic,
    stats_with_outliers,
)
from feature_store_spark.operators.skew import salted_join
from feature_store_spark.operators.windows import latest_per_key, top_k

__all__ = [
    "completeness_report",
    "freshness_report",
    "mode_deterministic",
    "stats_with_outliers",
    "latest_per_key",
    "top_k",
    "salted_join",
]
