"""RESTORE (tip roll-back as a new commit) and the streaming CDC
source (checkpointed per-commit consumption of table_changes)."""
from __future__ import annotations

import datetime

import pytest

import feature_store_spark.pipelines.txn as txn
from feature_store_spark.pipelines.txn import (
    read_changes_stream,
    read_table,
    restore,
    table_changes,
    table_history,
    upsert_manifest,
    upsert_manifest_partitioned,
    vacuum,
)

D1 = datetime.date(2024, 1, 1)
D2 = datetime.date(2024, 1, 2)


def _commit(spark, root, rows, partitioned=False):
    if partitioned:
        df = spark.createDataFrame(
            rows, "user_id bigint, score double, ts bigint, p date"
        )
        upsert_manifest_partitioned(df, root, ["user_id"], "ts", "p")
    else:
        df = spark.createDataFrame(
            rows, "user_id bigint, score double, ts bigint"
        )
        upsert_manifest(df, root, ["user_id"], "ts")


# ---------------------------------------------------------------- restore

def test_restore_reads_like_time_travel(spark, tmp_path):
    root = str(tmp_path / "t")
    _commit(spark, root, [(1, 1.0, 1), (2, 2.0, 1)])
    _commit(spark, root, [(2, 20.0, 2), (3, 3.0, 2)])   # v2
    _commit(spark, root, [(4, 4.0, 3)])                  # v3
    res = restore(root, version=1)
    assert res["committed"] and res["version"] == 4
    got, v = read_table(spark, root)
    want, _ = read_table(spark, root, 1)
    assert v == 4
    assert sorted(got.collect()) == sorted(want.collect())
    hist = table_history(spark, root).collect()
    assert hist[0]["op"] == "restore"
    # history intact: the rolled-back versions still time-travel
    v3, _ = read_table(spark, root, 3)
    assert v3.count() == 4


def test_restore_tip_is_noop(spark, tmp_path):
    root = str(tmp_path / "t")
    _commit(spark, root, [(1, 1.0, 1)])
    res = restore(root, version=1)
    assert not res["committed"]
    assert txn.latest_version(root) == 1


def test_restore_partitioned_zero_data_work_and_cdc_inverse(spark, tmp_path):
    root = str(tmp_path / "t")
    _commit(spark, root, [(1, 1.0, 1, D1), (2, 2.0, 1, D2)], True)
    _commit(spark, root, [(2, 20.0, 2, D2), (3, 3.0, 2, D2)], True)  # v2
    parts_v1 = txn.resolve_partitions(root, 1)
    res = restore(root, version=1)
    assert res["committed"] and res["version"] == 3
    # leaves carried BY REFERENCE — same dirs as v1, no data copied
    parts_v3 = txn.resolve_partitions(root, 3)
    assert {pk: e["dir"] for pk, e in parts_v3.items()} == {
        pk: e["dir"] for pk, e in parts_v1.items()
    }
    # CDC across the restore is the inverse of the v1->v2 diff
    fwd = {
        (r["user_id"], r["status"])
        for r in table_changes(spark, root, 1, 2, ["user_id"]).collect()
        if r["status"] != "unchanged"
    }
    back = {
        (r["user_id"], r["status"])
        for r in table_changes(spark, root, 2, 3, ["user_id"]).collect()
        if r["status"] != "unchanged"
    }
    assert fwd == {(2, "changed"), (3, "added")}
    assert back == {(2, "changed"), (3, "removed")}


def test_restore_by_timestamp_and_vacuum_safety(spark, tmp_path):
    root = str(tmp_path / "t")
    _commit(spark, root, [(1, 1.0, 1)])
    t1 = txn.read_manifest(root, 1)["committed_at"]
    _commit(spark, root, [(2, 2.0, 2)])
    res = restore(root, timestamp_as_of=t1)
    assert res["restored_version"] == 1 and res["version"] == 3
    # vacuum keeping only the tip must NOT reclaim v1's data dir —
    # the restore manifest references it
    vacuum(root, keep_last=1)
    got, _ = read_table(spark, root)
    assert {r["user_id"] for r in got.collect()} == {1}


def test_restore_rejects_bad_args(spark, tmp_path):
    root = str(tmp_path / "t")
    _commit(spark, root, [(1, 1.0, 1)])
    with pytest.raises(ValueError, match="exactly one"):
        restore(root)
    with pytest.raises(ValueError, match="exactly one"):
        restore(root, version=1, timestamp_as_of=0)
    with pytest.raises(ValueError, match="beyond the tip"):
        restore(root, version=99)


# ------------------------------------------------- streaming CDC source

def _drain(spark, root, ckpt, **kw):
    batches = []

    def sink(df, version):
        batches.append((version, df.collect()))

    res = read_changes_stream(spark, root, ckpt, sink, ["user_id"], **kw)
    return res, batches


def test_stream_equals_batch_changes_across_commits(spark, tmp_path):
    root = str(tmp_path / "t")
    ckpt = str(tmp_path / "ckpt")
    _commit(spark, root, [(1, 1.0, 1), (2, 2.0, 1)])       # v1
    _commit(spark, root, [(2, 20.0, 2), (3, 3.0, 2)])      # v2
    _commit(spark, root, [(1, -1.0, 3)])                    # v3 (update)
    res, batches = _drain(spark, root, ckpt)
    assert res == {"batches": 3, "from_version": 0, "to_version": 3}
    assert [v for v, _ in batches] == [1, 2, 3]
    # batch 1: initial snapshot as 'added'
    assert {(r["user_id"], r["status"]) for r in batches[0][1]} == {
        (1, "added"), (2, "added"),
    }
    # batches 2..3 equal the per-commit batch table_changes
    for v, rows in batches[1:]:
        want = {
            (r["user_id"], r["status"])
            for r in table_changes(
                spark, root, v - 1, v, ["user_id"]
            ).collect()
            if r["status"] != "unchanged"
        }
        assert {(r["user_id"], r["status"]) for r in rows} == want
        assert all(r["_commit_version"] == v for r in rows)


def test_stream_replay_from_checkpoint_adds_zero(spark, tmp_path):
    root = str(tmp_path / "t")
    ckpt = str(tmp_path / "ckpt")
    _commit(spark, root, [(1, 1.0, 1)])
    _commit(spark, root, [(2, 2.0, 2)])
    res1, b1 = _drain(spark, root, ckpt)
    assert res1["batches"] == 2
    # drained stream replays nothing
    res2, b2 = _drain(spark, root, ckpt)
    assert res2["batches"] == 0 and b2 == []
    # a new commit resumes exactly where the cursor stopped
    _commit(spark, root, [(3, 3.0, 3)])
    res3, b3 = _drain(spark, root, ckpt)
    assert res3 == {"batches": 1, "from_version": 2, "to_version": 3}
    assert {(r["user_id"], r["status"]) for r in b3[0][1]} == {
        (3, "added")
    }


def test_stream_crash_redelivers_unacked_batch(spark, tmp_path):
    """process() raising before the cursor advances re-delivers the
    SAME commit on restart — at-least-once with _commit_version as
    the idempotency key."""
    root = str(tmp_path / "t")
    ckpt = str(tmp_path / "ckpt")
    _commit(spark, root, [(1, 1.0, 1)])
    _commit(spark, root, [(2, 2.0, 2)])
    seen = []

    def crashy(df, version):
        if version == 2:
            raise RuntimeError("boom")
        seen.append(version)

    with pytest.raises(RuntimeError, match="boom"):
        read_changes_stream(spark, root, ckpt, crashy, ["user_id"])
    assert seen == [1]
    res, batches = _drain(spark, root, ckpt)   # restart
    assert [v for v, _ in batches] == [2]      # redelivered, not lost


def test_stream_max_batches_and_wrong_table_guard(spark, tmp_path):
    root = str(tmp_path / "t")
    ckpt = str(tmp_path / "ckpt")
    for i in range(3):
        _commit(spark, root, [(i, float(i), i + 1)])
    res, _ = _drain(spark, root, ckpt, max_batches=2)
    assert res["batches"] == 2 and res["to_version"] == 2
    res, _ = _drain(spark, root, ckpt)
    assert res["batches"] == 1
    # pointing the same checkpoint at a shorter table raises
    root2 = str(tmp_path / "t2")
    _commit(spark, root2, [(9, 9.0, 1)])
    with pytest.raises(ValueError, match="beyond the tip"):
        _drain(spark, root2, ckpt)


def test_stream_fresh_cursor_on_vacuumed_v1_targeted_error(spark, tmp_path):
    """ADVICE r7: a fresh checkpoint (cursor 0) on a table whose v1
    was vacuumed must raise a targeted ValueError naming
    starting_version, not a raw FileNotFoundError from read_table."""
    root = str(tmp_path / "t")
    ckpt = str(tmp_path / "ck")
    _commit(spark, root, [(1, 1.0, 1)])
    _commit(spark, root, [(2, 2.0, 2)])
    _commit(spark, root, [(3, 3.0, 3)])
    vacuum(root, keep_last=1)  # v1, v2 gone
    with pytest.raises(ValueError, match="starting_version"):
        read_changes_stream(
            spark, root, ckpt, lambda df, v: df.count(), ["user_id"]
        )
    # the documented recovery works: start at the oldest retained tip
    res = read_changes_stream(
        spark, root, str(tmp_path / "ck2"),
        lambda df, v: df.count(), ["user_id"], starting_version=3,
    )
    assert res["batches"] == 0


def _backdate(root, version, hours_ago):
    """Rewrite a manifest's committed_at into the past (test-only)."""
    import json
    import time

    p = txn._manifest_path(root, version)
    with open(p) as f:
        m = json.load(f)
    m["committed_at"] = time.time() - hours_ago * 3600.0
    with open(p, "w") as f:
        json.dump(m, f)


def test_vacuum_retain_hours_prunes_only_older_than_horizon(spark, tmp_path):
    """Delta `VACUUM ... RETAIN n HOURS` ergonomics: versions
    committed within the horizon are retained (contiguous suffix up
    to the tip); older ones prune. dry_run lists exactly what the
    real run removes; retained versions still time-travel and the
    pruned ones raise."""
    root = str(tmp_path / "t")
    for i in range(5):
        _commit(spark, root, [(i, float(i), i + 1)])  # v1..v5
    # v1,v2 committed 48h ago; v3 committed 10h ago; v4,v5 now
    _backdate(root, 1, 48)
    _backdate(root, 2, 48)
    _backdate(root, 3, 10)
    dry = vacuum(root, keep_last=1, retain_hours=24, dry_run=True)
    removed = vacuum(root, keep_last=1, retain_hours=24)
    assert sorted(dry) == sorted(removed) and removed
    vers = txn._list_versions(root)
    assert vers == [3, 4, 5]  # horizon keeps v3..tip, prunes v1,v2
    for v in (3, 4, 5):
        got, _ = read_table(spark, root, v)
        assert got.count() == v
    with pytest.raises(FileNotFoundError):
        txn.read_manifest(root, 1)
    # horizon larger than history: nothing prunes
    assert vacuum(root, keep_last=1, retain_hours=1000) == []
    with pytest.raises(ValueError, match="retain_hours"):
        vacuum(root, retain_hours=-1)


def test_vacuum_retain_hours_contiguity_and_unknown_dates(spark, tmp_path):
    """An undated (pre-op-tag) version inside the scan is
    conservatively retained, and retention always keeps a CONTIGUOUS
    suffix — a kept version can never chain through a pruned one."""
    import json

    root = str(tmp_path / "t")
    for i in range(4):
        _commit(spark, root, [(i, float(i), i + 1)])  # v1..v4
    for v in (1, 2, 3):
        _backdate(root, v, 48)
    # strip v2's committed_at: commit time unknowable -> retained,
    # and contiguity then also retains v3 above it
    p = txn._manifest_path(root, 2)
    with open(p) as f:
        m = json.load(f)
    del m["committed_at"]
    with open(p, "w") as f:
        json.dump(m, f)
    removed = vacuum(root, keep_last=1, retain_hours=24)
    assert txn._list_versions(root) == [2, 3, 4]
    assert removed  # v1 pruned
    got, _ = read_table(spark, root, 3)
    assert got.count() == 3
