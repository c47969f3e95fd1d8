"""Engine metrics frame (txn.engine_metrics) + the database/pipeline
alert packs (reference monitoring/alerts/*.yml analogues) firing on
planted threshold breaches through evaluate_alerts."""
from __future__ import annotations

from pyspark.sql import functions as F

from feature_store_spark.operators.aggregates import (
    PIPELINE_ALERT_RULES,
    database_alert_rules,
    evaluate_alerts,
)
from feature_store_spark.pipelines.txn import (
    engine_metrics,
    upsert_manifest,
)


def _mk(spark, root, n=10):
    df = spark.createDataFrame(
        [(i, float(i), 1) for i in range(n)],
        "user_id bigint, score double, ts bigint",
    )
    upsert_manifest(df, root, ["user_id"], "ts")


def test_engine_metrics_gauges(spark, tmp_path):
    root = str(tmp_path / "t")
    _mk(spark, root)
    _mk(spark, root, n=12)  # second commit
    m = engine_metrics(spark, {"feat": root})
    g = {r["metric"]: r["value"] for r in m.collect()}
    assert g["readable"] == 1.0
    assert g["version"] == 2.0
    assert g["rows"] == 12.0
    assert g["commits_retained"] == 2.0
    assert g["bytes"] > 0 and g["files"] >= 1
    assert g["avg_file_bytes"] == g["bytes"] / g["files"]
    assert g["partitions"] == 1.0
    assert g["seconds_since_last_commit"] >= 0.0
    assert all(r["table"] == "feat" for r in m.collect())


def test_engine_metrics_unreadable_table(spark, tmp_path):
    m = engine_metrics(
        spark, {"ghost": str(tmp_path / "missing")}
    ).collect()
    assert [(r["metric"], r["value"]) for r in m] == [("readable", 0.0)]


def test_database_pack_fires_on_planted_breaches(spark, tmp_path):
    root = str(tmp_path / "t")
    _mk(spark, root)
    # plant staleness: evaluate "now" one week after the commit
    import feature_store_spark.pipelines.txn as txn
    committed = txn.read_manifest(root, 1)["committed_at"]
    m = engine_metrics(spark, {"feat": root}, now=committed + 7 * 86400)
    flat = m.select(
        F.concat_ws("_", "table", "metric").alias("metric"), "value"
    )
    out = {
        r["rule"]: r["firing"]
        for r in evaluate_alerts(flat, database_alert_rules("feat")).collect()
    }
    assert out["feat_stale_commits_warning"] is True
    assert out["feat_unreadable_critical"] is False
    assert out["feat_empty_table_critical"] is False
    # tiny local parquet files breach the small-file pressure rule
    assert out["feat_small_files_warning"] is True


def test_database_pack_fires_on_unreadable(spark, tmp_path):
    m = engine_metrics(spark, {"feat": str(tmp_path / "missing")})
    flat = m.select(
        F.concat_ws("_", "table", "metric").alias("metric"), "value"
    )
    out = {
        r["rule"]: (r["firing"], r["value"])
        for r in evaluate_alerts(flat, database_alert_rules("feat")).collect()
    }
    assert out["feat_unreadable_critical"] == (True, 0.0)
    # absent gauges report NULL value + firing FALSE (PromQL absent)
    assert out["feat_stale_commits_warning"] == (False, None)


def test_pipeline_pack_thresholds_match_reference_yaml(spark):
    """Planted gauges one notch past each pipeline_alerts.yml
    threshold fire exactly their rule; one notch inside stay quiet."""
    hot = spark.createDataFrame(
        [
            ("pipeline_runs_error", 1.0),          # > 0
            ("pipeline_duration_seconds", 3601.0),  # > 3600
            ("data_freshness_minutes", 121.0),      # > 120
            ("data_completeness_ratio", 0.94),      # < 0.95
            ("streaming_latency_seconds", 5.5),     # > 5
            ("data_anomaly_rate", 0.11),            # > 0.1
        ],
        "metric string, value double",
    )
    fired = {
        r["rule"]: r["firing"]
        for r in evaluate_alerts(hot, PIPELINE_ALERT_RULES).collect()
    }
    assert all(fired.values()) and len(fired) == 6
    cold = spark.createDataFrame(
        [
            ("pipeline_runs_error", 0.0),
            ("pipeline_duration_seconds", 3599.0),
            ("data_freshness_minutes", 119.0),
            ("data_completeness_ratio", 0.96),
            ("streaming_latency_seconds", 4.5),
            ("data_anomaly_rate", 0.09),
        ],
        "metric string, value double",
    )
    quiet = {
        r["rule"]: r["firing"]
        for r in evaluate_alerts(cold, PIPELINE_ALERT_RULES).collect()
    }
    assert not any(quiet.values())
    sev = {r["rule"]: r["severity"] for r in PIPELINE_ALERT_RULES}
    assert sev["pipeline_failure_critical"] == "critical"
