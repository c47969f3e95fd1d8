"""Incremental view maintenance driven by the change feed
(drivers.sync_rollup_from_changes): the streaming CDC source with
pre/post images + MERGE INTO keeping a per-group rollup synchronized
with its source table — verified against full recomputation after
every kind of source mutation."""
from __future__ import annotations

from pyspark.sql import functions as F

import feature_store_spark.pipelines.txn as txn
from feature_store_spark.pipelines.drivers import sync_rollup_from_changes
from feature_store_spark.pipelines.txn import (
    delete_where,
    merge_into,
    read_table,
    upsert_manifest,
)


def _recompute(spark, src_root):
    snap, _ = read_table(spark, src_root)
    return {
        r["grp"]: (r["n"], r["s"])
        for r in snap.groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("cents").cast("bigint").alias("s"),
        )
        .collect()
    }


def _rollup(spark, rollup_root):
    got, _ = read_table(spark, rollup_root)
    return {
        r["grp"]: (r["n_rows"], r["sum_value"]) for r in got.collect()
    }


def _sync(spark, src, dst, ckpt):
    return sync_rollup_from_changes(
        spark, src, dst, ckpt,
        key_col="user_id", group_col="grp", value_col="cents",
    )


def test_rollup_tracks_source_through_all_mutations(spark, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "roll")
    ckpt = str(tmp_path / "ckpt")

    def commit(rows):
        upsert_manifest(
            spark.createDataFrame(
                rows, "user_id bigint, grp string, cents bigint, ts bigint"
            ),
            src, ["user_id"], "ts",
        )

    # v1: initial snapshot
    commit([(1, "a", 10, 1), (2, "a", 20, 1), (3, "b", 5, 1)])
    res = _sync(spark, src, dst, ckpt)
    assert res["batches"] == 1
    assert _rollup(spark, dst) == _recompute(spark, src)
    assert _rollup(spark, dst) == {"a": (2, 30), "b": (1, 5)}

    # v2: value change + group MOVE + brand-new key/group
    commit([(1, "a", 15, 2), (3, "c", 5, 2), (4, "c", 7, 2)])
    # v3: row-level delete empties group b? (3 moved to c; delete 2)
    delete_where(spark, src, [("user_id", "=", 2)])
    res = _sync(spark, src, dst, ckpt)
    assert res["batches"] == 2
    assert _rollup(spark, dst) == _recompute(spark, src)
    assert _rollup(spark, dst) == {"a": (1, 15), "c": (2, 12)}

    # v4: MERGE on the source (update + delete + insert in one commit)
    srcdf = spark.createDataFrame(
        [(1, "D", 0), (4, "U", 100), (9, "I", 50)],
        "user_id bigint, flag string, cents bigint",
    )
    merge_into(
        spark, src, srcdf, ["user_id"],
        when_matched=[
            ("s.flag = 'D'", "delete"),
            (None, {"cents": "s.cents"}),
        ],
        when_not_matched=(None, {
            "user_id": "s.user_id", "grp": "'i'",
            "cents": "s.cents", "ts": "9",
        }),
    )
    _sync(spark, src, dst, ckpt)
    assert _rollup(spark, dst) == _recompute(spark, src)
    assert _rollup(spark, dst) == {"c": (2, 105), "i": (1, 50)}

    # drained stream: replay changes nothing
    v = txn.latest_version(dst)
    res = _sync(spark, src, dst, ckpt)
    assert res["batches"] == 0
    assert txn.latest_version(dst) == v


def test_rollup_crash_between_merge_and_cursor_advance_is_exactly_once(
    spark, tmp_path
):
    """ADVICE r7 (medium): a crash AFTER the rollup merge commits but
    BEFORE the CDC cursor advances redelivers the batch; the deltas
    are additive, so re-merging them would double counts/sums. The
    transactional watermark (txn app-version in the rollup manifest)
    must make the redelivered batch a no-op — for both the bootstrap
    batch and a later merge batch."""
    import json
    import os

    src = str(tmp_path / "src")
    dst = str(tmp_path / "roll")
    ckpt = str(tmp_path / "ckpt")
    off = os.path.join(ckpt, "offset.json")

    def commit(rows):
        upsert_manifest(
            spark.createDataFrame(
                rows, "user_id bigint, grp string, cents bigint, ts bigint"
            ),
            src, ["user_id"], "ts",
        )

    def rewind(to_version):
        with open(off, "w") as f:
            json.dump({"version": to_version}, f)

    # --- bootstrap window: crash after bootstrap commit, cursor at 0
    commit([(1, "a", 10, 1), (2, "b", 20, 1)])
    _sync(spark, src, dst, ckpt)
    before = _rollup(spark, dst)
    v_before = txn.latest_version(dst)
    rewind(0)  # simulate: process died before the cursor advanced
    _sync(spark, src, dst, ckpt)
    assert _rollup(spark, dst) == before == {"a": (1, 10), "b": (1, 20)}
    assert txn.latest_version(dst) == v_before  # nothing re-applied

    # --- merge window: crash after a later batch's merge commit
    commit([(1, "a", 15, 2), (3, "a", 5, 2)])  # change + insert
    _sync(spark, src, dst, ckpt)
    before = _rollup(spark, dst)
    assert before == _recompute(spark, src) == {"a": (2, 20), "b": (1, 20)}
    v_before = txn.latest_version(dst)
    rewind(1)  # redeliver the v2 batch
    _sync(spark, src, dst, ckpt)
    assert _rollup(spark, dst) == before
    assert txn.latest_version(dst) == v_before
