"""CLONE (shallow/deep) of manifest tables (txn.clone_table)."""
from __future__ import annotations

import datetime
import os

import pytest

import feature_store_spark.pipelines.txn as txn
from feature_store_spark.pipelines.txn import (
    clone_table,
    delete_where,
    read_table,
    upsert_manifest,
    upsert_manifest_partitioned,
    vacuum,
)

D1 = datetime.date(2024, 1, 1)
D2 = datetime.date(2024, 1, 2)


def _flat(spark, root, offset=0):
    df = spark.createDataFrame(
        [(i + offset, float(i), 1 + offset) for i in range(5)],
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
    upsert_manifest_partitioned(df, root, ["user_id"], "ts", "p")


def test_shallow_clone_zero_copy_reads_equal(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    _flat(spark, src)
    res = clone_table(src, dst)
    assert res == {"version": 1, "rows": 5, "source_version": 1,
                   "deep": False}
    got, _ = read_table(spark, dst)
    want, _ = read_table(spark, src)
    assert sorted(got.collect()) == sorted(want.collect())
    # zero copy: no data under the clone's own data/
    assert not os.path.isdir(os.path.join(dst, "data")) or not os.listdir(
        os.path.join(dst, "data")
    )


def test_clone_pins_version_and_divergence(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    _flat(spark, src)            # v1
    _flat(spark, src, offset=10)  # v2 (10 rows)
    clone_table(src, dst, version=1)
    got, _ = read_table(spark, dst)
    assert got.count() == 5
    # clone evolves independently; source untouched
    _flat(spark, dst, offset=50)
    assert read_table(spark, dst)[0].count() == 10
    assert read_table(spark, src)[0].count() == 10  # v2 rows
    src_rows = {r["user_id"] for r in read_table(spark, src)[0].collect()}
    assert not any(u >= 50 for u in src_rows)


def test_partitioned_shallow_clone_and_dml(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    _part(spark, src)
    clone_table(src, dst)
    got, _ = read_table(spark, dst, partition_values=[D2])
    assert got.count() == 3
    # DML on the clone rewrites touched partitions under ITS root,
    # leaves the source alone
    res = delete_where(spark, dst, [("user_id", ">=", 100)])
    assert res["rows_deleted"] == 3
    assert read_table(spark, dst)[0].count() == 3
    assert read_table(spark, src)[0].count() == 6
    # untouched partition still references the source leaf (absolute)
    parts = txn.resolve_partitions(dst, txn.latest_version(dst))
    assert os.path.isabs(parts["2024-01-01"]["dir"])


def test_clone_vacuum_never_reaches_source(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    _part(spark, src)
    clone_table(src, dst)
    # advance the clone twice so v1 becomes prunable, then vacuum
    upsert_manifest_partitioned(
        spark.createDataFrame(
            [(7, 7.0, 2, D1)],
            "user_id bigint, score double, ts bigint, p date",
        ),
        dst, ["user_id"], "ts", "p",
    )
    removed = vacuum(dst, keep_last=1)
    assert all(not os.path.isabs(d) for d in removed)
    # source still fully readable
    assert read_table(spark, src)[0].count() == 6


def test_deep_clone_self_contained(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    _part(spark, src)
    res = clone_table(src, dst, deep=True)
    assert res["deep"] is True
    # obliterate the source: the deep clone must not care
    import shutil
    shutil.rmtree(src)
    got, _ = read_table(spark, dst)
    assert got.count() == 6
    parts = txn.resolve_partitions(dst, 1)
    assert all(not os.path.isabs(e["dir"]) for e in parts.values())


def test_clone_rejects_nonempty_target(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    _flat(spark, src)
    _flat(spark, dst)
    with pytest.raises(ValueError, match="empty"):
        clone_table(src, dst)
