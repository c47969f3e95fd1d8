"""Co-bucketed fact-table layout (pipelines/facts.py): results must be
layout-independent, and the layout must actually deliver its contract —
zero Exchange on the orderkey join path and a bucketed events scan
feeding the user-keyed aggregate. Reference intent: CLUSTER BY in
`sql/bigquery_schema.sql:22,45,68`."""

from __future__ import annotations

from feature_store_spark.pipelines.facts import (
    FACT_BUCKET_KEYS,
    bucketed_fact,
    materialize_bucketed_facts,
    projection_frame,
)
from feature_store_spark.pipelines.features import serving_features
from feature_store_spark.tables import load_flat_table


def _serving(spark, sf_dir, frames):
    return serving_features(
        load_flat_table(spark, sf_dir, "customer"),
        frames["orders"],
        frames["lineitem"],
        frames["events"],
    )


def test_bucketed_facts_results_are_layout_independent(spark, sf_dir):
    """The full serving derivation (touches every bucketed fact) must
    produce identical rows from the flat and bucketed layouts."""
    flat = {
        n: projection_frame(spark, sf_dir, n) for n in FACT_BUCKET_KEYS
    }
    bucketed = materialize_bucketed_facts(spark, sf_dir)
    for name, df in bucketed.items():
        assert [f.name for f in df.schema.fields] == [
            f.name for f in flat[name].schema.fields
        ], name
    a = _serving(spark, sf_dir, flat)
    b = _serving(spark, sf_dir, bucketed)
    n = a.count()
    assert n > 0 and b.count() == n
    assert a.exceptAll(b).union(b.exceptAll(a)).count() == 0


def test_bucketed_serving_join_has_no_orderkey_exchange(
    spark, sf_dir, monkeypatch
):
    """With SPARK_GRAFT_BUCKETED_FACTS=1 the registry query reads the
    bucketed layout through load_table and the lineitem⋈orders join is
    a map-side merge: no Exchange hashpartitioning on an orderkey
    anywhere in the plan (broadcast disabled to model the 100 TB
    non-broadcastable regime, as in scripts_dev/fact_bucket_probe.py)."""
    from feature_store_spark.queries import SPECS, all_queries

    all_queries()
    monkeypatch.setenv("SPARK_GRAFT_BUCKETED_FACTS", "1")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        df = SPECS["pipeline_serving_join"].fn(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    bad = [
        ln
        for ln in plan.splitlines()
        if "Exchange hashpartitioning" in ln and "orderkey" in ln.lower()
    ]
    assert not bad, bad
    assert "Bucketed: true" in plan


def test_bucketed_fact_rejects_undeclared_table(spark, sf_dir):
    import pytest

    with pytest.raises(ValueError, match="no bucketing key"):
        bucketed_fact(spark, sf_dir, "customer")


def test_bucketed_serving_derivation_hash_matches_oracle(spark, sf_dir, duck):
    """Direct DuckDB-oracle check of the serving derivation READ FROM
    THE BUCKETED LAYOUT (the driver row runs the flat path; this is
    the same rows+schema+hash compare against SERVING_SQL, so the
    layout is oracle-evidenced, not just parity-evidenced)."""
    from feature_store_spark.oracle import compare
    from feature_store_spark.queries import SPECS, all_queries

    all_queries()
    bucketed = materialize_bucketed_facts(spark, sf_dir)
    out = _serving(spark, sf_dir, bucketed)
    assert compare(out, duck, SPECS["pipeline_serving_join"].sql)["ok"]


def test_custkey_projection_kills_pipeline_aggregate_exchange(
    spark, sf_dir, monkeypatch
):
    """VERDICT r7 item 1: the user/risk derivation pipelines aggregate
    orders per customer; with the custkey-bucketed projection routed
    in, pipeline_user_features plans with ZERO Exchange of any kind
    (bucketed scan -> two fused aggregates -> broadcast customer
    join), and pipeline_risk_features keeps at most the pay feed's
    bounded-window custkey exchange (its rows are orderkey-distributed
    by the lineitem join; the full orders scan no longer shuffles)."""
    from feature_store_spark.queries import SPECS, all_queries

    all_queries()
    monkeypatch.setenv("SPARK_GRAFT_BUCKETED_FACTS", "1")

    df = SPECS["pipeline_user_features"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Bucketed: true" in plan
    bad = [ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln]
    assert not bad, bad

    df = SPECS["pipeline_risk_features"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # with the denormalized lineitem_by_custkey projection (round 9)
    # every feed aggregate is exchange-free; the ONE shuffle left is
    # the post-full-outer-join re-distribution of the COALESCED user
    # key (key-cardinality aggregate rows, not fact rows)
    assert "fs_fact_lineitem_by_custkey" in plan
    shuffles = [
        ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln
    ]
    assert len(shuffles) <= 1, shuffles
    fact_ex = [
        ln
        for ln in shuffles
        if "o_custkey" in ln or "orderkey" in ln.lower()
    ]
    assert not fact_ex, fact_ex

    # transaction pipeline: both feeds single-scan exchange-free on
    # the custkey layouts; no shuffle Exchange at all
    df = SPECS["pipeline_transaction_features"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "fs_fact_lineitem_by_custkey" in plan
    shuffles = [
        ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln
    ]
    assert not shuffles, shuffles


def test_custkey_projection_results_are_layout_independent(
    spark, sf_dir, monkeypatch, duck
):
    """The routed pipelines hash-match their DuckDB oracles under the
    bucketed layout — layout changes plans, never results."""
    from feature_store_spark.oracle import compare
    from feature_store_spark.queries import SPECS, all_queries

    all_queries()
    monkeypatch.setenv("SPARK_GRAFT_BUCKETED_FACTS", "1")
    for name in (
        "pipeline_user_features",
        "pipeline_transaction_features",
        "pipeline_risk_features",
    ):
        s = SPECS[name]
        res = compare(s.fn(spark, sf_dir), duck, s.sql)
        assert res["rows_match"] and res["hash_match"], (name, res)


def test_user_features_reads_mergeable_stats_projection(
    spark, sf_dir, monkeypatch
):
    """Under the bucketed layout pipeline_user_features reads the
    orders_user_stats mergeable-aggregate projection (round 11) —
    customer-bounded summary rows, not the raw order history — with
    no exchange below the customer join (the projection is custkey-
    bucketed, and custkey ⊂ both groupBy keys)."""
    from feature_store_spark.queries import SPECS, all_queries

    all_queries()
    monkeypatch.setenv("SPARK_GRAFT_BUCKETED_FACTS", "1")
    df = SPECS["pipeline_user_features"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "fs_fact_orders_user_stats" in plan
    # raw orders must NOT be scanned in this shape
    assert "orders.parquet" not in plan
    assert "fs_fact_orders_by_custkey" not in plan
    bad = [
        ln
        for ln in plan.splitlines()
        if "Exchange hashpartitioning" in ln and "custkey" in ln.lower()
    ]
    assert not bad, bad


def test_events_bucket_sort_elides_window_sorts(spark, sf_dir, monkeypatch):
    """Round 9: the events bucket sorts by (user_id, ts, event_id) —
    exactly the required child ordering of the ASC per-user window
    family — so under the bucketed layout the session/velocity plans
    carry ZERO Sort nodes (the layout pays the sort once at ingest);
    w7 serves from the custkey projection with zero fact-row
    Exchange."""
    from feature_store_spark.queries import SPECS, all_queries

    all_queries()
    monkeypatch.setenv("SPARK_GRAFT_BUCKETED_FACTS", "1")
    conf = "spark.sql.legacy.bucketedTableScan.outputOrdering"
    old = spark.conf.get(conf)
    try:
        # the elision rides the scan REPORTING its in-bucket sort
        # (bench.py sets the same conf; one file per bucket holds)
        spark.conf.set(conf, "true")
        for name in ("st7_session_features", "st5_velocity_features"):
            plan = (
                SPECS[name]
                .fn(spark, sf_dir)
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
            sorts = [ln for ln in plan.splitlines() if "Sort [" in ln]
            assert not sorts, (name, sorts)
        plan = (
            SPECS["w7_rolling_spend"]
            .fn(spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "fs_fact_orders_by_custkey" in plan
        ex = [
            ln
            for ln in plan.splitlines()
            if "Exchange hashpartitioning" in ln
        ]
        assert not ex, ex
    finally:
        spark.conf.set(conf, old)
