from feature_store_spark.operators.aggregates import (
    completeness_report,
    decayed_aggregate,
    evaluate_alerts,
    freshness_report,
    mode_deterministic,
    stats_with_outliers,
)
from feature_store_spark.operators.diff import (
    snapshot_diff,
    value_drift_report,
)
from feature_store_spark.operators.joins import band_join
from feature_store_spark.operators.layout import (
    cluster_by_zorder,
    zorder_key,
)
from feature_store_spark.operators.sampling import (
    priority_sample,
    stratified_sample,
)
from feature_store_spark.operators.skew import salted_join
from feature_store_spark.operators.windows import (
    asof_join,
    funnel,
    latest_per_key,
    scd2_history,
    sessionize,
    top_k,
    top_k_per_group,
)

__all__ = [
    "asof_join",
    "band_join",
    "cluster_by_zorder",
    "completeness_report",
    "decayed_aggregate",
    "evaluate_alerts",
    "freshness_report",
    "funnel",
    "latest_per_key",
    "mode_deterministic",
    "priority_sample",
    "salted_join",
    "scd2_history",
    "sessionize",
    "snapshot_diff",
    "stats_with_outliers",
    "stratified_sample",
    "top_k",
    "top_k_per_group",
    "value_drift_report",
    "zorder_key",
]
