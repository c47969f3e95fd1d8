"""DELETE WHERE on manifest tables (txn.delete_where)."""
from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from feature_store_spark.pipelines.txn import (
    delete_where,
    read_table,
    table_history,
    upsert_manifest,
    upsert_manifest_partitioned,
    vacuum,
)

D1 = datetime.date(2024, 1, 1)
D2 = datetime.date(2024, 1, 2)
D3 = datetime.date(2024, 1, 3)


def _mk(spark, root):
    rows = (
        [(i, float(i), 1, D1) for i in range(0, 10)]
        + [(i, float(i), 1, D2) for i in range(100, 110)]
        + [(i, float(i), 1, D3) for i in range(200, 210)]
    )
    df = spark.createDataFrame(
        rows, "user_id bigint, score double, ts bigint, p date"
    )
    upsert_manifest_partitioned(
        df, root, ["user_id"], "ts", "p",
        stats_cols=["user_id"], bloom_cols=["user_id"],
    )


def test_delete_touches_only_matching_leaves(spark, tmp_path):
    root = str(tmp_path / "t")
    _mk(spark, root)
    d1_dir_before = None
    full, v1 = read_table(spark, root)
    import feature_store_spark.pipelines.txn as txn
    parts_before = txn.resolve_partitions(root, v1)
    res = delete_where(spark, root, [("user_id", ">=", 200)])
    assert res["committed"] and res["rows_deleted"] == 10
    assert res["partitions_rewritten"] == 0  # D3 fully emptied
    assert res["partitions_removed"] == 1
    got, v2 = read_table(spark, root)
    assert got.count() == 20
    parts_after = txn.resolve_partitions(root, v2)
    # untouched partitions carried forward byte-identically (same dir)
    for pk in parts_after:
        assert parts_after[pk]["dir"] == parts_before[pk]["dir"]
    assert set(parts_before) - set(parts_after) == {"2024-01-03"}
    # history records the delete
    hist = table_history(spark, root).collect()
    assert hist[0]["op"] == "delete"


def test_delete_partial_partition_rewrites_and_restats(spark, tmp_path):
    root = str(tmp_path / "t")
    _mk(spark, root)
    res = delete_where(spark, root, [("user_id", "in", [5, 105])])
    assert res["committed"] and res["rows_deleted"] == 2
    assert res["partitions_rewritten"] == 2
    assert res["partitions_removed"] == 0
    got, _ = read_table(spark, root)
    ids = {r["user_id"] for r in got.collect()}
    assert 5 not in ids and 105 not in ids and len(ids) == 28
    # re-recorded stats still prune: probe for a deleted key finds
    # nothing and the rewritten leaf's bloom excludes it
    probe, _ = read_table(spark, root, where=[("user_id", "=", 5)])
    assert probe.count() == 0
    # a surviving key still resolves to one leaf
    probe2, _ = read_table(spark, root, where=[("user_id", "=", 6)])
    assert [r["user_id"] for r in probe2.collect()] == [6]
    assert len({f.rsplit("/", 1)[0] for f in probe2.inputFiles()}) == 1


def test_delete_null_semantics_keeps_null_rows(spark, tmp_path):
    root = str(tmp_path / "t")
    rows = [(1, None, 1, D1), (2, 9.0, 1, D1), (3, 1.0, 1, D1)]
    df = spark.createDataFrame(
        rows, "user_id bigint, score double, ts bigint, p date"
    )
    upsert_manifest_partitioned(df, root, ["user_id"], "ts", "p")
    res = delete_where(spark, root, [("score", ">", 5.0)])
    assert res["rows_deleted"] == 1
    got, _ = read_table(spark, root)
    # NULL-score row SURVIVES (predicate NULL is not TRUE)
    assert sorted(r["user_id"] for r in got.collect()) == [1, 3]


def test_delete_zero_match_publishes_nothing(spark, tmp_path):
    root = str(tmp_path / "t")
    _mk(spark, root)
    _, v = read_table(spark, root)
    res = delete_where(spark, root, [("user_id", "=", 99999)])
    assert res == {
        "version": v, "rows_deleted": 0, "partitions_rewritten": 0,
        "partitions_removed": 0, "committed": False,
    }
    _, v2 = read_table(spark, root)
    assert v2 == v


def test_delete_time_travel_and_vacuum(spark, tmp_path):
    root = str(tmp_path / "t")
    _mk(spark, root)
    _, v1 = read_table(spark, root)
    delete_where(spark, root, [("user_id", "<", 5)])
    old, _ = read_table(spark, root, version=v1)
    assert old.count() == 30  # pre-delete snapshot intact
    removed = vacuum(root, keep_last=1)
    assert removed  # superseded D1 leaf reclaimed
    new, _ = read_table(spark, root)
    assert new.count() == 25


def test_delete_flat_table(spark, tmp_path):
    root = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, 10, 1), (2, 20, 1), (3, None, 1)],
        "user_id bigint, v bigint, ts bigint",
    )
    upsert_manifest(df, root, ["user_id"], "ts")
    res = delete_where(spark, root, [("v", ">=", 15)])
    assert res["committed"] and res["rows_deleted"] == 1
    got, _ = read_table(spark, root)
    assert sorted(r["user_id"] for r in got.collect()) == [1, 3]
    hist = table_history(spark, root).collect()
    assert hist[0]["op"] == "delete"


def test_delete_validation(spark, tmp_path):
    root = str(tmp_path / "t")
    _mk(spark, root)
    with pytest.raises(ValueError, match="empty predicate"):
        delete_where(spark, root, [])
    with pytest.raises(ValueError, match="not in the table schema"):
        delete_where(spark, root, [("nope", "=", 1)])


def test_table_files_metadata_view(spark, tmp_path):
    from feature_store_spark.pipelines.txn import table_files

    root = str(tmp_path / "t")
    _mk(spark, root)
    files = {r["partition"]: r for r in table_files(spark, root).collect()}
    assert set(files) == {"2024-01-01", "2024-01-02", "2024-01-03"}
    for r in files.values():
        assert r["rows"] == 10 and r["n_files"] >= 1 and r["bytes"] > 0
        assert r["has_stats"] and r["has_bloom"]
    # flat table: one NULL-partition row, no stats flags
    root2 = str(tmp_path / "flat")
    upsert_manifest(
        spark.createDataFrame([(1, 1)], "user_id bigint, ts bigint"),
        root2, ["user_id"], "ts",
    )
    flat = table_files(spark, root2).collect()
    assert len(flat) == 1 and flat[0]["partition"] is None
    with pytest.raises(ValueError, match="no committed versions"):
        table_files(spark, str(tmp_path / "missing"))


# --- UPDATE WHERE ---


def test_update_where_semantics_and_skipping(spark, tmp_path):
    from feature_store_spark.pipelines.txn import update_where

    root = str(tmp_path / "t")
    _mk(spark, root)
    import feature_store_spark.pipelines.txn as txn
    _, v1 = read_table(spark, root)
    before = txn.resolve_partitions(root, v1)
    res = update_where(
        spark, root, [("user_id", "in", [5, 6])], {"score": 0.0}
    )
    assert res["committed"] and res["rows_updated"] == 2
    assert res["partitions_rewritten"] == 1  # only D1 touched
    got, v2 = read_table(spark, root)
    assert got.count() == 30  # UPDATE never changes row counts
    vals = {r["user_id"]: r["score"] for r in got.collect()}
    assert vals[5] == 0.0 and vals[6] == 0.0 and vals[7] == 7.0
    after = txn.resolve_partitions(root, v2)
    for pk in ("2024-01-02", "2024-01-03"):
        assert after[pk]["dir"] == before[pk]["dir"]  # carried forward
    # history op tag
    hist = table_history(spark, root).collect()
    assert hist[0]["op"] == "update"


def test_update_where_null_rows_untouched(spark, tmp_path):
    from feature_store_spark.pipelines.txn import update_where

    root = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, None, 1, D1), (2, 9.0, 1, D1)],
        "user_id bigint, score double, ts bigint, p date",
    )
    upsert_manifest_partitioned(df, root, ["user_id"], "ts", "p")
    res = update_where(spark, root, [("score", ">", 5.0)], {"score": 1.0})
    assert res["rows_updated"] == 1
    got = {r["user_id"]: r["score"] for r in read_table(spark, root)[0].collect()}
    assert got[1] is None and got[2] == 1.0


def test_update_where_zero_match_and_validation(spark, tmp_path):
    from feature_store_spark.pipelines.txn import update_where

    root = str(tmp_path / "t")
    _mk(spark, root)
    res = update_where(spark, root, [("user_id", "=", 9999)], {"score": 0.0})
    assert res["committed"] is False and res["rows_updated"] == 0
    with pytest.raises(ValueError, match="partition column"):
        update_where(spark, root, [("user_id", "=", 5)], {"p": D2})
    with pytest.raises(ValueError, match="not in the table schema"):
        update_where(spark, root, [("user_id", "=", 5)], {"nope": 1})
    with pytest.raises(ValueError, match="set_values is empty"):
        update_where(spark, root, [("user_id", "=", 5)], {})
    with pytest.raises(ValueError, match="empty predicate"):
        update_where(spark, root, [], {"score": 0.0})


def test_update_refreshes_stats_for_probes(spark, tmp_path):
    """After updating a stats/bloom column, probing for the OLD value
    must not return rows, and probing for the NEW one must — the
    rewritten leaf's re-recorded metadata stays truthful."""
    from feature_store_spark.pipelines.txn import update_where

    root = str(tmp_path / "t")
    rows = [(1, "alpha", 1, D1), (2, "beta", 1, D2)]
    df = spark.createDataFrame(
        rows, "user_id bigint, name string, ts bigint, p date"
    )
    upsert_manifest_partitioned(
        df, root, ["user_id"], "ts", "p",
        stats_cols=["name"], bloom_cols=["name"],
    )
    update_where(spark, root, [("name", "=", "alpha")], {"name": "omega"})
    gone, _ = read_table(spark, root, where=[("name", "=", "alpha")])
    assert gone.count() == 0
    found, _ = read_table(spark, root, where=[("name", "=", "omega")])
    assert [r["user_id"] for r in found.collect()] == [1]
    assert len({f.rsplit("/", 1)[0] for f in found.inputFiles()}) == 1


# --- OPTIMIZE ZORDER ---


def test_compact_zorder_flat_disjoint_file_ranges(spark, tmp_path):
    """OPTIMIZE ZORDER on a flat table: rows identical, and the
    range-partitioned output files hold DISJOINT z-key ranges (the
    property that makes parquet row-group pruning effective on every
    clustered dimension)."""
    from feature_store_spark.operators.layout import zorder_key
    from feature_store_spark.pipelines.txn import compact_manifest

    root = str(tmp_path / "t")
    rows = [(i, (i * 37) % 1000, (i * 91) % 1000, 1) for i in range(4000)]
    df = spark.createDataFrame(rows, "user_id bigint, x bigint, y bigint, ts bigint")
    # fragment: several upserts
    upsert_manifest(df.filter("user_id < 2000"), root, ["user_id"], "ts")
    upsert_manifest(df.filter("user_id >= 2000"), root, ["user_id"], "ts")
    res = compact_manifest(
        spark, root, target_file_bytes=16 * 1024,
        zorder_cols=["x", "y"],
    )
    assert res["committed"] and res["files_after"] >= 2
    got, _ = read_table(spark, root)
    assert got.count() == 4000
    assert sorted(r["user_id"] for r in got.collect()) == list(range(4000))
    # capture the file BEFORE zorder_key (input_file_name is not
    # allowed after its broadcast bounds join)
    keyed = zorder_key(
        got.withColumn("f", F.input_file_name()), ["x", "y"], key_name="zk"
    )
    ranges = [
        (r["lo"], r["hi"])
        for r in keyed.groupBy("f")
        .agg(F.min("zk").alias("lo"), F.max("zk").alias("hi"))
        .collect()
    ]
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, "file z-key ranges overlap"


def test_compact_zorder_partitioned_identity_and_validation(spark, tmp_path):
    from feature_store_spark.pipelines.txn import compact_manifest

    root = str(tmp_path / "t")
    _mk(spark, root)
    res = compact_manifest(spark, root, zorder_cols=["user_id"])
    assert res["committed"]
    got, _ = read_table(spark, root)
    assert got.count() == 30
    # stats carried verbatim (reorder never changes min/max): a probe
    # still prunes to one leaf
    probe, _ = read_table(spark, root, where=[("user_id", "=", 205)])
    assert [r["user_id"] for r in probe.collect()] == [205]
    assert len({f.rsplit("/", 1)[0] for f in probe.inputFiles()}) == 1
    with pytest.raises(ValueError, match="must be integral"):
        compact_manifest(spark, root, zorder_cols=["score"])
    with pytest.raises(ValueError, match="not in the table schema"):
        compact_manifest(spark, root, zorder_cols=["nope"])


# --- CHECK constraints + timestampAsOf ---


def _cdf(spark, rows):
    return spark.createDataFrame(
        rows, "user_id bigint, score double, ts bigint, p date"
    )


def test_check_constraints_abort_before_publish(spark, tmp_path):
    from feature_store_spark.pipelines.txn import latest_version

    root = str(tmp_path / "t")
    upsert_manifest_partitioned(
        _cdf(spark, [(1, 5.0, 1, D1)]), root, ["user_id"], "ts", "p",
        constraints=[("score_nonneg", "score >= 0")],
    )
    assert latest_version(root) == 1
    bad = _cdf(spark, [(2, -3.0, 1, D2), (3, -1.0, 1, D2)])
    with pytest.raises(ValueError, match="score_nonneg.*2 row"):
        upsert_manifest_partitioned(
            bad, root, ["user_id"], "ts", "p",
            constraints=[("score_nonneg", "score >= 0")],
        )
    # nothing published, no orphan data dirs beyond v1's
    assert latest_version(root) == 1
    got, _ = read_table(spark, root)
    assert got.count() == 1
    # NULL passes (SQL CHECK semantics)
    upsert_manifest_partitioned(
        _cdf(spark, [(4, None, 1, D3)]), root, ["user_id"], "ts", "p",
        constraints=[("score_nonneg", "score >= 0")],
    )
    assert latest_version(root) == 2


def test_check_constraints_flat_table(spark, tmp_path):
    from feature_store_spark.pipelines.txn import latest_version

    root = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, 10, 1)], "user_id bigint, v bigint, ts bigint"
    )
    upsert_manifest(df, root, ["user_id"], "ts",
                    constraints=[("v_pos", "v > 0")])
    with pytest.raises(ValueError, match="v_pos"):
        upsert_manifest(
            spark.createDataFrame(
                [(2, -1, 1)], "user_id bigint, v bigint, ts bigint"
            ),
            root, ["user_id"], "ts", constraints=[("v_pos", "v > 0")],
        )
    assert latest_version(root) == 1


def test_timestamp_as_of_time_travel(spark, tmp_path):
    import time as _time

    from feature_store_spark.pipelines.txn import version_at_timestamp

    root = str(tmp_path / "t")
    upsert_manifest_partitioned(
        _cdf(spark, [(1, 1.0, 1, D1)]), root, ["user_id"], "ts", "p"
    )
    t1 = _time.time()
    _time.sleep(0.05)
    upsert_manifest_partitioned(
        _cdf(spark, [(2, 2.0, 2, D2)]), root, ["user_id"], "ts", "p"
    )
    assert version_at_timestamp(root, t1) == 1
    old, v = read_table(spark, root, timestamp_as_of=t1)
    assert v == 1 and old.count() == 1
    new, v2 = read_table(spark, root, timestamp_as_of=_time.time())
    assert v2 == 2 and new.count() == 2
    with pytest.raises(ValueError, match="at or before"):
        read_table(spark, root, timestamp_as_of=t1 - 1000)
    with pytest.raises(ValueError, match="not both"):
        read_table(spark, root, version=1, timestamp_as_of=t1)
    # ISO string form — naive strings are UTC by contract, so the
    # test builds one in UTC (would break on a non-UTC box otherwise)
    import datetime as _dt

    iso = _dt.datetime.fromtimestamp(
        t1, tz=_dt.timezone.utc
    ).replace(tzinfo=None).isoformat()
    assert version_at_timestamp(root, iso) == 1


def test_schema_changes_lineage(spark, tmp_path):
    from feature_store_spark.pipelines.txn import schema_changes

    root = str(tmp_path / "t")
    upsert_manifest_partitioned(
        spark.createDataFrame(
            [(1, 1, 1, D1)], "user_id bigint, v int, ts bigint, p date"
        ),
        root, ["user_id"], "ts", "p",
    )
    # v2: widen v to bigint AND add a column
    upsert_manifest_partitioned(
        spark.createDataFrame(
            [(2, 2, "x", 2, D2)],
            "user_id bigint, v bigint, extra string, ts bigint, p date",
        ),
        root, ["user_id"], "ts", "p", allow_schema_evolution=True,
    )
    ch = {(r["version"], r["column"], r["change"]): r
          for r in schema_changes(spark, root).collect()}
    assert (2, "extra", "added") in ch
    assert (2, "v", "retyped") in ch
    assert ch[(2, "v", "retyped")]["from_type"] == "integer"
    assert ch[(2, "v", "retyped")]["to_type"] == "long"
    # no-change commits emit nothing
    upsert_manifest_partitioned(
        spark.createDataFrame(
            [(3, 3, "y", 3, D3)],
            "user_id bigint, v bigint, extra string, ts bigint, p date",
        ),
        root, ["user_id"], "ts", "p",
    )
    assert not [
        r for r in schema_changes(spark, root).collect()
        if r["version"] == 3
    ]


def test_vacuum_dry_run_reports_without_deleting(spark, tmp_path):
    import os

    root = str(tmp_path / "t")
    _mk(spark, root)
    delete_where(spark, root, [("user_id", "<", 5)])  # supersede D1
    dry = vacuum(root, keep_last=1, dry_run=True)
    assert dry  # the superseded D1 leaf would go
    # nothing actually deleted: every reported dir still exists and
    # the old version still time-travels
    for d in dry:
        assert os.path.exists(os.path.join(root, d))
    old, _ = read_table(spark, root, version=1)
    assert old.count() == 30
    # the real run removes exactly what the dry run predicted
    real = vacuum(root, keep_last=1)
    assert sorted(real) == sorted(dry)
    for d in real:
        assert not os.path.exists(os.path.join(root, d))
