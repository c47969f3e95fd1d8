"""Tests for sinks (S6 upsert idempotency, S7 partitioned export,
S11 generator determinism) and the serving layer (SV1-SV5)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from feature_store_spark.pipelines.sinks import (
    export_warehouse,
    generate_synthetic_orders,
    generate_synthetic_users,
    upsert_parquet,
)
from feature_store_spark.serving import FeatureStore
from feature_store_spark.tables import load_table


# ---------------------------------------------------------------------------
# S6 upsert
# ---------------------------------------------------------------------------


def test_upsert_creates_then_merges(spark, tmp_path):
    path = str(tmp_path / "feat")
    v1 = spark.createDataFrame(
        [(1, 10.0, "2024-01-01"), (2, 20.0, "2024-01-01")],
        "user_id long, score double, updated_at string",
    )
    assert upsert_parquet(v1, path, ["user_id"], "updated_at") == 2
    # update user 2, insert user 3
    v2 = spark.createDataFrame(
        [(2, 99.0, "2024-01-02"), (3, 30.0, "2024-01-02")],
        "user_id long, score double, updated_at string",
    )
    assert upsert_parquet(v2, path, ["user_id"], "updated_at") == 3
    rows = {
        r["user_id"]: r["score"]
        for r in spark.read.parquet(path).collect()
    }
    assert rows == {1: 10.0, 2: 99.0, 3: 30.0}


def test_upsert_idempotent_and_last_writer_wins(spark, tmp_path):
    path = str(tmp_path / "feat2")
    v2 = spark.createDataFrame(
        [(1, 1.0, "2024-01-02")], "user_id long, score double, updated_at string"
    )
    upsert_parquet(v2, path, ["user_id"], "updated_at")
    # replay the same batch → no change
    assert upsert_parquet(v2, path, ["user_id"], "updated_at") == 1
    # older update must NOT overwrite newer state
    v1 = spark.createDataFrame(
        [(1, 777.0, "2024-01-01")],
        "user_id long, score double, updated_at string",
    )
    upsert_parquet(v1, path, ["user_id"], "updated_at")
    assert spark.read.parquet(path).collect()[0]["score"] == 1.0


# ---------------------------------------------------------------------------
# S7/S8 export
# ---------------------------------------------------------------------------


def test_export_partitioned_and_pruned(spark, sf_dir, tmp_path):
    path = str(tmp_path / "wh")
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.col("ts").alias("updated_at")
    )
    export_warehouse(ev, path, date_col="updated_at", cluster_col="user_id")
    out = spark.read.parquet(path)
    assert out.count() == ev.count()
    assert "partition_date" in out.columns
    # partition pruning: a date filter reads only matching partitions
    one_day = out.select("partition_date").distinct().limit(1).collect()[0][0]
    pruned = out.filter(F.col("partition_date") == F.lit(one_day))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan or pruned.count() > 0


def test_export_retention_filter(spark, tmp_path):
    path = str(tmp_path / "wh2")
    df = spark.createDataFrame(
        [(1, "2001-08-01 00:00:00"), (2, "1990-01-01 00:00:00")],
        "user_id long, updated_at string",
    ).withColumn("updated_at", F.to_timestamp("updated_at"))
    export_warehouse(
        df, path, retention_days=730, ref_date="2001-08-01"
    )
    assert spark.read.parquet(path).count() == 1  # 1990 row expired


# ---------------------------------------------------------------------------
# S11 generator
# ---------------------------------------------------------------------------


def test_generator_deterministic_and_valid(spark):
    a = generate_synthetic_users(spark, 500, seed=7).collect()
    b = generate_synthetic_users(spark, 500, seed=7).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    ages = [r["age"] for r in a]
    assert min(ages) >= 18 and max(ages) <= 100
    segs = {r["segment"] for r in a}
    assert len(segs) == 5
    orders = generate_synthetic_orders(spark, 100, 5, seed=7)
    assert orders.count() == 500
    assert orders.filter(
        ~F.col("status").isin("completed", "pending", "declined")
    ).count() == 0


# ---------------------------------------------------------------------------
# Serving layer
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def store(spark, sf_dir):
    from feature_store_spark.queries import all_queries

    qs = all_queries()
    uf = qs["pipeline_user_features"](spark, sf_dir).cache()
    tf = qs["pipeline_transaction_features"](spark, sf_dir).cache()
    rf = qs["pipeline_risk_features"](spark, sf_dir).cache()
    return FeatureStore({"user": uf, "transaction": tf, "risk": rf})


def test_point_lookup_and_cache(store):
    r1 = store.get_features(1, ["user"])
    assert not r1.cache_hit
    assert "user" in r1.features
    assert r1.features["user"]["user_id"] == 1
    r2 = store.get_features(1, ["user"])
    assert r2.cache_hit
    assert store.stats()["hits"] == 1


def test_all_types_hit_requires_every_type(store):
    # pick a user present in every feature group (missing groups are
    # not negative-cached, matching the reference's all-types-hit rule)
    uid = (
        store.feature_dfs["transaction"]
        .join(store.feature_dfs["risk"], "user_id", "inner")
        .select("user_id")
        .limit(1)
        .collect()[0][0]
    )
    store.invalidate(uid)
    r = store.get_features(uid)  # all three types
    assert not r.cache_hit
    assert set(r.features) == {"user", "transaction", "risk"}
    r2 = store.get_features(uid)
    assert r2.cache_hit  # now every type is cached


def test_batch_lookup_and_validation(store):
    ids = list(range(1, 31))
    rs = store.get_batch_features(ids, ["user"])
    assert len(rs) == 30
    assert all(r.features.get("user") is not None for r in rs)
    with pytest.raises(ValueError):
        store.get_batch_features(list(range(200)), ["user"])
    with pytest.raises(ValueError):
        store.get_features(1, ["nope"])


def test_ttl_expiry():
    import itertools

    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    df = spark.createDataFrame([(1, 5.0)], "user_id long, score double")
    clock = itertools.count(0, 4000).__next__  # +4000s per call (> TTL)
    fs = FeatureStore({"user": df}, ttl_seconds=3600, clock=clock)
    fs.get_features(1, ["user"])
    r = fs.get_features(1, ["user"])  # clock advanced beyond TTL
    assert not r.cache_hit


def test_invalidate_and_health(store):
    store.get_features(3, ["user"])
    assert store.invalidate(3) >= 1
    health = store.health()
    assert set(health) == {"user", "transaction", "risk"}
    assert all(health.values())


def test_partitioned_upsert_rewrites_only_touched_partitions(
    spark, tmp_path
):
    """The 100 TB upsert: merging updates for one partition_date must
    leave every other partition's files byte-identical on disk
    (dynamic partition overwrite), while merging last-writer-wins
    inside the touched partition."""
    import os

    from feature_store_spark.pipelines.sinks import (
        upsert_parquet_partitioned,
    )

    path = str(tmp_path / "snap")
    v1 = spark.createDataFrame(
        [
            (1, 10.0, "t1", "2024-01-01"),
            (2, 20.0, "t1", "2024-01-01"),
            (1, 11.0, "t1", "2024-01-02"),
            (3, 30.0, "t1", "2024-01-02"),
        ],
        "user_id long, score double, v string, snap_date string",
    )
    assert (
        upsert_parquet_partitioned(
            v1, path, ["user_id"], "v", "snap_date"
        )
        == 4
    )

    def files(day):
        d = os.path.join(path, f"snap_date={day}")
        return {
            f: os.path.getmtime(os.path.join(d, f))
            for f in sorted(os.listdir(d))
            if f.endswith(".parquet")
        }

    before_day1 = files("2024-01-01")
    # update user 3, insert user 4 — only the 01-02 snapshot touched
    v2 = spark.createDataFrame(
        [
            (3, 99.0, "t2", "2024-01-02"),
            (4, 40.0, "t2", "2024-01-02"),
        ],
        "user_id long, score double, v string, snap_date string",
    )
    # merged count covers touched partitions only: users 1,3,4 on 01-02
    assert (
        upsert_parquet_partitioned(
            v2, path, ["user_id"], "v", "snap_date"
        )
        == 3
    )
    assert files("2024-01-01") == before_day1  # untouched on disk
    out = spark.read.parquet(path)
    assert out.count() == 5
    day2 = {
        r["user_id"]: r["score"]
        for r in out.filter("snap_date = '2024-01-02'").collect()
    }
    assert day2 == {1: 11.0, 3: 99.0, 4: 40.0}
    # same-key rows in other snapshots untouched (history preserved)
    day1 = {
        r["user_id"]: r["score"]
        for r in out.filter("snap_date = '2024-01-01'").collect()
    }
    assert day1 == {1: 10.0, 2: 20.0}


def test_generator_status_distribution(spark):
    """Regression: two textually identical rand(seed) instances in one
    CASE desynchronized under lazy branch evaluation, collapsing the
    declined rate ~7x below the designed 5%."""
    orders = generate_synthetic_orders(spark, 4000, 5, seed=7)
    n = orders.count()
    frac = {
        r["status"]: r["cnt"] / n
        for r in orders.groupBy("status")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert abs(frac["completed"] - 0.85) < 0.02
    assert abs(frac["pending"] - 0.10) < 0.02
    assert abs(frac["declined"] - 0.05) < 0.02


def test_upsert_same_timestamp_update_wins(spark, tmp_path):
    """Regression: with equal order_col values the merge kept an
    arbitrary row; the update side must win (same-ref_date re-run
    after an upstream fix)."""
    path = str(tmp_path / "tie")
    v1 = spark.createDataFrame(
        [(u, 1.0, "2024-01-01") for u in range(50)],
        "user_id long, score double, updated_at string",
    )
    upsert_parquet(v1, path, ["user_id"], "updated_at")
    fixed = spark.createDataFrame(
        [(u, 2.0, "2024-01-01") for u in range(50)],
        "user_id long, score double, updated_at string",
    )
    upsert_parquet(fixed, path, ["user_id"], "updated_at")
    scores = {r["score"] for r in spark.read.parquet(path).collect()}
    assert scores == {2.0}
    # and no tmp copy is left behind
    import os

    assert not os.path.exists(path + "__tmp")


def test_batch_lookups_counted_in_stats(spark, sf_dir):
    from feature_store_spark.queries import all_queries

    qs = all_queries()
    uf = qs["pipeline_user_features"](spark, sf_dir)
    s = FeatureStore({"user": uf})
    ids = [r["user_id"] for r in uf.limit(3).collect()]
    s.get_batch_features(ids)          # all misses
    s.get_batch_features(ids)          # all hits
    st = s.stats()
    assert st["hits"] == len(ids)
    assert st["misses"] == len(ids)
    assert st["hit_ratio"] == 0.5


def test_health_reports_broken_store(spark, tmp_path):
    """Regression: health() was vacuously True and raised on a broken
    store instead of reporting it."""
    import shutil

    p = str(tmp_path / "h")
    spark.range(5).selectExpr("id as user_id").write.parquet(p)
    df = spark.read.parquet(p)
    s = FeatureStore({"user": df})
    assert s.health() == {"user": True}
    shutil.rmtree(p)
    assert s.health() == {"user": False}


def test_partitioned_upsert_rejects_null_partition(spark, tmp_path):
    """NULL partition values would dynamic-overwrite
    __HIVE_DEFAULT_PARTITION__ with only the update rows, silently
    discarding previously stored NULL-partition keys — refused."""
    import pytest

    from feature_store_spark.pipelines.sinks import (
        upsert_parquet_partitioned,
    )

    path = str(tmp_path / "snap")
    v1 = spark.createDataFrame(
        [(1, 10.0, "t1", "2024-01-01")],
        "user_id long, score double, v string, snap_date string",
    )
    upsert_parquet_partitioned(v1, path, ["user_id"], "v", "snap_date")
    v2 = spark.createDataFrame(
        [(2, 20.0, "t2", None)],
        "user_id long, score double, v string, snap_date string",
    )
    with pytest.raises(ValueError, match="NULL"):
        upsert_parquet_partitioned(v2, path, ["user_id"], "v", "snap_date")


def test_stats_with_outliers_empty_input_counts_zero(spark):
    """Empty-table parity with the a7 oracle: COUNT of nothing is 0
    (not NULL), outlier_count likewise; the moment stats stay NULL."""
    from feature_store_spark.operators.aggregates import (
        stats_with_outliers,
    )

    empty = spark.createDataFrame([], "o_totalprice double")
    row = stats_with_outliers(empty, "o_totalprice").collect()[0]
    assert row["count_value"] == 0
    assert row["outlier_count"] == 0
    assert row["mean_value"] is None


def test_preload_serves_point_lookups_with_zero_spark_jobs(spark, sf_dir):
    """SV1 hot path: after preload(), point lookups must never touch
    Spark — proven by poisoning feature_dfs (any attribute access on a
    miss would raise) and asserting all-hit stats."""
    from feature_store_spark.queries import all_queries

    uf = all_queries()["pipeline_user_features"](spark, sf_dir)
    fs = FeatureStore({"user": uf})
    n = fs.preload()
    assert n == uf.count() > 0

    class _Poisoned:
        def __getattr__(self, name):  # pragma: no cover - should not run
            raise AssertionError(
                f"Spark touched after preload (attribute {name})"
            )

    fs.feature_dfs = {"user": _Poisoned()}
    ids = [r["user_id"] for r in uf.select("user_id").limit(20).collect()]
    for u in ids:
        r = fs.get_features(u, ["user"])
        assert r.cache_hit and r.features["user"]["user_id"] == u
    assert fs.stats()["hits"] == len(ids) and fs.stats()["misses"] == 0
    # batch path is served from the same warm cache
    batch = fs.get_batch_features(ids[:10], ["user"])
    assert all(b.cache_hit for b in batch)


def test_preload_keyset_only_loads_requested_keys(spark, sf_dir):
    from feature_store_spark.queries import all_queries

    uf = all_queries()["pipeline_user_features"](spark, sf_dir)
    fs = FeatureStore({"user": uf})
    loaded = fs.preload(user_ids=[1, 2, 3])
    assert loaded == 3
    assert fs.get_features(1, ["user"]).cache_hit


def test_partitioned_upsert_preserves_string_partition_type(spark, tmp_path):
    """The staged read-back must not let partition-type inference
    re-type the partition column: a zero-padded string key like
    '00123' would otherwise come back as int 123, permanently
    corrupting the store's keys."""
    path = str(tmp_path / "store")
    v1 = spark.createDataFrame(
        [(1, 10.0, "2024-01-02", "00123"), (2, 20.0, "2024-01-02", "00456")],
        "user_id long, score double, updated_at string, snap string",
    )
    from feature_store_spark.pipelines.sinks import upsert_parquet_partitioned

    assert upsert_parquet_partitioned(
        v1, path, ["user_id"], "updated_at", "snap"
    ) == 2
    # the sink controls what lands on disk: the zero-padded string
    # values must survive as the partition directory names (the old
    # staged read re-typed them to int 123/456 and wrote those dirs)
    import os

    dirs = {d for d in os.listdir(path) if d.startswith("snap=")}
    assert dirs == {"snap=00123", "snap=00456"}
    # a schema-aware reader gets the strings back verbatim (plain
    # reads are subject to Spark's reader-side partition-type
    # inference, which is the READER'S choice, not the sink's)
    back = spark.read.schema(v1.schema).parquet(path)
    assert dict(back.dtypes)["snap"] == "string"
    assert {r["snap"] for r in back.select("snap").collect()} == {
        "00123", "00456",
    }


def test_partitioned_upsert_empty_updates_is_noop(spark, tmp_path):
    from feature_store_spark.pipelines.sinks import upsert_parquet_partitioned

    path = str(tmp_path / "store")
    v1 = spark.createDataFrame(
        [(1, 10.0, "2024-01-02", "a")],
        "user_id long, score double, updated_at string, snap string",
    )
    upsert_parquet_partitioned(v1, path, ["user_id"], "updated_at", "snap")
    empty = v1.limit(0)
    assert upsert_parquet_partitioned(
        empty, path, ["user_id"], "updated_at", "snap"
    ) == 0
    assert spark.read.parquet(path).count() == 1


def test_export_warehouse_refuses_null_dates(spark, tmp_path):
    from feature_store_spark.pipelines.sinks import export_warehouse

    df = spark.createDataFrame(
        [(1, "2024-01-02"), (2, None)], "user_id long, updated_at string"
    )
    with pytest.raises(ValueError, match="NULL/unparseable"):
        export_warehouse(df, str(tmp_path / "wh"))


def test_synthetic_users_layout_independent(spark):
    """Seeded synthetic data must be identical under different
    partition layouts (F.rand would differ: it seeds per partition
    index)."""
    from feature_store_spark.pipelines.sinks import generate_synthetic_users

    a = sorted(
        tuple(r) for r in generate_synthetic_users(spark, 300, seed=7)
        .repartition(1).collect()
    )
    b = sorted(
        tuple(r) for r in generate_synthetic_users(spark, 300, seed=7)
        .repartition(13).collect()
    )
    assert a == b


def test_cache_returns_fresh_copies_and_rejects_empty_type_list(spark, sf_dir):
    from feature_store_spark.queries import all_queries

    uf = all_queries()["pipeline_user_features"](spark, sf_dir)
    fs = FeatureStore({"user": uf})
    fs.preload(user_ids=[1])
    r1 = fs.get_features(1, ["user"])
    r1.features["user"]["total_orders"] = -999  # caller mutation
    r2 = fs.get_features(1, ["user"])
    assert r2.features["user"]["total_orders"] != -999
    with pytest.raises(ValueError, match="at least one feature type"):
        fs.get_features(1, [])
    with pytest.raises(ValueError, match="at least one feature type"):
        fs.get_batch_features([1, 2], [])


def test_compact_parquet_reduces_files_and_preserves_rows(spark, tmp_path):
    from feature_store_spark.pipelines.sinks import compact_parquet

    path = str(tmp_path / "frag")
    df = spark.range(10_000).select(
        F.col("id"), (F.col("id") % 97).alias("k"),
        ((F.col("id") * 31) % 1000).alias("v"),
    )
    df.repartition(64).write.parquet(path)  # 64 tiny files
    before = spark.read.parquet(path)
    n_before = len(before.inputFiles())
    assert n_before >= 32

    report = compact_parquet(spark, path, target_file_bytes=10**9)
    assert report["files_before"] == n_before
    assert report["files_after"] == 1
    assert report["rows"] == 10_000

    after = spark.read.parquet(path)
    assert len(after.inputFiles()) == 1
    assert after.count() == 10_000
    # content identical (orderless)
    assert sorted(r["id"] for r in after.collect()) == list(range(10_000))
    # sums survive exactly
    s = after.agg(F.sum("v").alias("s")).collect()[0]["s"]
    assert s == sum((i * 31) % 1000 for i in range(10_000))


def test_compact_parquet_zorder_layout(spark, tmp_path):
    from feature_store_spark.pipelines.sinks import compact_parquet

    path = str(tmp_path / "fragz")
    spark.range(5_000).select(
        ((F.col("id") * 37) % 500).alias("a"),
        ((F.col("id") * 911 + 13) % 9000).alias("b"),
    ).repartition(16).write.parquet(path)

    report = compact_parquet(
        spark, path, target_file_bytes=10**9, zorder_cols=["a", "b"]
    )
    assert report["files_after"] == 1 and report["rows"] == 5_000
    out = spark.read.parquet(path)
    assert set(out.columns) == {"a", "b"}  # layout key dropped
    assert out.count() == 5_000


def test_compact_parquet_missing_path_raises(spark, tmp_path):
    from feature_store_spark.pipelines.sinks import compact_parquet

    with pytest.raises(Exception):
        compact_parquet(spark, str(tmp_path / "absent"))


def test_cdc_driven_cache_invalidation(spark, tmp_path):
    """ST2 over the table's own log: a manifest-table commit evicts
    exactly the changed users' cache entries via the CDC stream;
    unchanged users keep serving from cache with no Spark job."""
    from feature_store_spark.pipelines.txn import (
        merge_into,
        upsert_manifest,
    )
    from feature_store_spark.serving.store import (
        FeatureStore,
        refresh_serving_from_changes,
    )

    root = str(tmp_path / "feat")
    ckpt = str(tmp_path / "ckpt")
    upsert_manifest(
        spark.createDataFrame(
            [(1, 10.0, 1), (2, 20.0, 1)],
            "user_id bigint, score double, ts bigint",
        ),
        root, ["user_id"], "ts",
    )
    store = FeatureStore({"user": spark.createDataFrame(
        [], "user_id bigint, score double, ts bigint")})
    res = refresh_serving_from_changes(
        spark, store, root, ckpt, "user"
    )
    assert res["batches"] == 1
    # warm both users
    assert store.get_features(1, ["user"]).features["user"]["score"] == 10.0
    assert store.get_features(2, ["user"]).features["user"]["score"] == 20.0
    assert store.get_features(1, ["user"]).cache_hit

    # commit an update to user 1 only
    merge_into(
        spark, root,
        spark.createDataFrame([(1, 99.0)], "user_id bigint, score double"),
        ["user_id"],
        when_matched=[(None, {"score": "s.score"})],
    )
    res = refresh_serving_from_changes(
        spark, store, root, ckpt, "user"
    )
    assert res["batches"] == 1
    # user 1 evicted -> fresh value on a MISS; user 2 still cache-hit
    r1 = store.get_features(1, ["user"])
    assert not r1.cache_hit and r1.features["user"]["score"] == 99.0
    r2 = store.get_features(2, ["user"])
    assert r2.cache_hit and r2.features["user"]["score"] == 20.0

    # drained feed: nothing re-invalidated
    res = refresh_serving_from_changes(spark, store, root, ckpt, "user")
    assert res["batches"] == 0
    assert store.get_features(1, ["user"]).cache_hit
