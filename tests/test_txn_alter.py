"""ALTER TABLE verbs: persisted CHECK constraints
(add_constraint/drop_constraint, enforced by every write path) and
metadata-only ADD/DROP COLUMN with the retired-physical-name guard."""
from __future__ import annotations

import datetime

import pytest

import feature_store_spark.pipelines.txn as txn
from feature_store_spark.pipelines.txn import (
    add_column,
    add_constraint,
    drop_column,
    drop_constraint,
    merge_into,
    read_table,
    rename_column,
    update_where,
    upsert_manifest,
    upsert_manifest_partitioned,
)

D1 = datetime.date(2024, 1, 1)
D2 = datetime.date(2024, 1, 2)


def _flat(spark, root, rows=None):
    df = spark.createDataFrame(
        rows or [(i, float(i), 1) for i in range(5)],
        "user_id bigint, score double, ts bigint",
    )
    upsert_manifest(df, root, ["user_id"], "ts")


def _part(spark, root):
    rows = [(i, float(i), 1, D1) for i in range(3)] + [
        (i, float(i), 1, D2) for i in range(100, 103)
    ]
    df = spark.createDataFrame(
        rows, "user_id bigint, score double, ts bigint, p date"
    )
    upsert_manifest_partitioned(
        df, root, ["user_id"], "ts", "p", stats_cols=["score"]
    )


# ------------------------------------------------ persisted constraints

def test_constraint_enforced_on_every_write_path(spark, tmp_path):
    root = str(tmp_path / "t")
    _flat(spark, root)
    res = add_constraint(spark, root, "score_nonneg", "score >= 0")
    assert res["committed"]
    v = txn.latest_version(root)
    # upsert violating the persisted constraint aborts pre-publish
    bad = spark.createDataFrame(
        [(9, -1.0, 2)], "user_id bigint, score double, ts bigint"
    )
    with pytest.raises(ValueError, match="score_nonneg"):
        upsert_manifest(bad, root, ["user_id"], "ts")
    assert txn.latest_version(root) == v
    # UPDATE violating it aborts too... (partitioned-only op; see below)
    # MERGE violating it aborts
    with pytest.raises(ValueError, match="score_nonneg"):
        merge_into(
            spark, root, bad.drop("ts"), ["user_id"],
            when_matched=[(None, {"score": "s.score"})],
            when_not_matched=(None, None),
        )
    assert txn.latest_version(root) == v
    # valid writes still pass; NULL passes SQL CHECK semantics
    ok = spark.createDataFrame(
        [(9, None, 2)], "user_id bigint, score double, ts bigint"
    )
    upsert_manifest(ok, root, ["user_id"], "ts")
    assert txn.latest_version(root) == v + 1
    # drop re-allows
    drop_constraint(root, "score_nonneg")
    upsert_manifest(
        spark.createDataFrame(
            [(10, -5.0, 3)], "user_id bigint, score double, ts bigint"
        ),
        root, ["user_id"], "ts",
    )
    got, _ = read_table(spark, root)
    assert got.filter("score = -5.0").count() == 1


def test_constraint_rejects_existing_violation_and_dups(spark, tmp_path):
    root = str(tmp_path / "t")
    _flat(spark, root, rows=[(1, -3.0, 1)])
    with pytest.raises(ValueError, match="nonneg"):
        add_constraint(spark, root, "nonneg", "score >= 0")
    _flat(spark, root, rows=[(1, 3.0, 2)])  # fix the data
    add_constraint(spark, root, "nonneg", "score >= 0")
    with pytest.raises(ValueError, match="already exists"):
        add_constraint(spark, root, "nonneg", "score >= 0")
    with pytest.raises(ValueError, match="not a constraint"):
        drop_constraint(root, "ghost")


def test_constraint_enforced_on_partitioned_update(spark, tmp_path):
    root = str(tmp_path / "t")
    _part(spark, root)
    add_constraint(spark, root, "score_cap", "score <= 1000")
    v = txn.latest_version(root)
    with pytest.raises(ValueError, match="score_cap"):
        update_where(
            spark, root, [("user_id", "=", 0)], {"score": 9999.0}
        )
    assert txn.latest_version(root) == v
    update_where(spark, root, [("user_id", "=", 0)], {"score": 999.0})
    got, _ = read_table(spark, root)
    assert got.filter("user_id = 0").collect()[0]["score"] == 999.0


# ------------------------------------------------------- add/drop column

def test_add_column_metadata_only_nullfills(spark, tmp_path):
    root = str(tmp_path / "t")
    _flat(spark, root)
    d1 = txn.read_manifest(root, 1).get("data_dir")
    res = add_column(root, "tier", "string")
    assert res["committed"]
    assert txn.read_manifest(root, 2)["data_dir"] == d1  # zero data work
    got, _ = read_table(spark, root)
    assert got.columns == ["user_id", "score", "ts", "tier"]
    assert got.filter("tier IS NULL").count() == 5
    # old version reads WITHOUT the column
    old, _ = read_table(spark, root, 1)
    assert "tier" not in old.columns
    # subsequent writes can fill it
    upsert_manifest(
        spark.createDataFrame(
            [(0, 0.0, 2, "gold")],
            "user_id bigint, score double, ts bigint, tier string",
        ),
        root, ["user_id"], "ts",
    )
    got, _ = read_table(spark, root)
    assert got.filter("tier = 'gold'").count() == 1


def test_drop_column_and_retired_physical_guard(spark, tmp_path):
    root = str(tmp_path / "t")
    _part(spark, root)
    res = drop_column(root, "score")
    assert res["committed"]
    got, _ = read_table(spark, root)
    assert "score" not in got.columns and got.count() == 6
    # stats keys stripped from every entry
    parts = txn.resolve_partitions(root, txn.latest_version(root))
    assert all("score" not in (e.get("stats") or {}) for e in parts.values())
    # time travel still shows the column
    old, _ = read_table(spark, root, 1)
    assert "score" in old.columns
    # re-adding the same name would resurrect old bytes -> refused
    with pytest.raises(ValueError, match="RETIRED"):
        add_column(root, "score", "double")
    # renaming another column ONTO the retired LOGICAL name is safe:
    # column mapping keeps the survivor's original physical name
    # ('ts'), so no dropped bytes resurrect
    rename_column(root, "ts", "score")
    got, _ = read_table(spark, root)
    assert {r["score"] for r in got.collect()} == {1}  # old ts values
    # a fresh column under a different name is fine too
    add_column(root, "score2", "double")


def test_drop_column_guards(spark, tmp_path):
    root = str(tmp_path / "t")
    _part(spark, root)
    with pytest.raises(ValueError, match="partition column"):
        drop_column(root, "p")
    add_constraint(spark, root, "cap", "score <= 1e9")
    with pytest.raises(ValueError, match="referenced by CHECK"):
        drop_column(root, "score")
    drop_constraint(root, "cap")
    drop_column(root, "score")
    with pytest.raises(ValueError, match="not a column"):
        drop_column(root, "score")


def test_dropped_column_after_rename_retires_physical(spark, tmp_path):
    """rename a->b then drop b retires PHYSICAL 'a': re-adding a
    column named 'a' must be refused (old leaves hold 'a' bytes)."""
    root = str(tmp_path / "t")
    _flat(spark, root)
    rename_column(root, "score", "points")
    drop_column(root, "points")
    with pytest.raises(ValueError, match="RETIRED"):
        add_column(root, "score", "double")
    add_column(root, "points", "double")  # logical 'points' is free now
    got, _ = read_table(spark, root)
    assert got.filter("points IS NULL").count() == 5
