"""MERGE INTO with conditional clauses (txn.merge_into) — the
composed Delta-style verb over manifest tables. Reference analogue:
the unconditional ``INSERT … ON CONFLICT DO UPDATE`` at
`src/pipelines/batch_pipeline.py:221-310` is its degenerate form."""
from __future__ import annotations

import datetime

import pytest

import feature_store_spark.pipelines.txn as txn
from feature_store_spark.pipelines.txn import (
    merge_into,
    read_table,
    table_changes,
    table_history,
    upsert_manifest,
    upsert_manifest_partitioned,
)

D1 = datetime.date(2024, 1, 1)
D2 = datetime.date(2024, 1, 2)
D3 = datetime.date(2024, 1, 3)


def _flat(spark, root):
    df = spark.createDataFrame(
        [(i, float(i), 1) for i in range(10)],
        "user_id bigint, score double, ts bigint",
    )
    upsert_manifest(df, root, ["user_id"], "ts")


def _part(spark, root):
    rows = (
        [(i, float(i), 1, D1) for i in range(0, 5)]
        + [(i, float(i), 1, D2) for i in range(100, 105)]
        + [(i, float(i), 1, D3) for i in range(200, 205)]
    )
    df = spark.createDataFrame(
        rows, "user_id bigint, score double, ts bigint, p date"
    )
    upsert_manifest_partitioned(
        df, root, ["user_id"], "ts", "p",
        stats_cols=["user_id"], bloom_cols=["user_id"],
    )


def _src(spark, rows, schema="user_id bigint, flag string, val double"):
    return spark.createDataFrame(rows, schema)


def test_update_only_clause(spark, tmp_path):
    root = str(tmp_path / "t")
    _flat(spark, root)
    src = _src(spark, [(3, "U", 30.0), (4, "U", 40.0), (99, "U", 1.0)])
    res = merge_into(
        spark, root, src, ["user_id"],
        when_matched=[(None, {"score": "s.val"})],
    )
    assert res["committed"]
    assert (res["rows_updated"], res["rows_deleted"], res["rows_inserted"]) \
        == (2, 0, 0)
    got, _ = read_table(spark, root)
    m = {r["user_id"]: r["score"] for r in got.collect()}
    assert m[3] == 30.0 and m[4] == 40.0 and m[5] == 5.0
    assert 99 not in m  # no insert clause -> unmatched source ignored
    assert table_history(spark, root).collect()[0]["op"] == "merge"


def test_delete_on_match_condition(spark, tmp_path):
    root = str(tmp_path / "t")
    _flat(spark, root)
    src = _src(
        spark, [(1, "D", 0.0), (2, "K", 20.0), (3, "D", 0.0)]
    )
    res = merge_into(
        spark, root, src, ["user_id"],
        when_matched=[
            ("s.flag = 'D'", "delete"),
            (None, {"score": "s.val"}),
        ],
    )
    assert (res["rows_updated"], res["rows_deleted"]) == (1, 2)
    got, _ = read_table(spark, root)
    ids = {r["user_id"] for r in got.collect()}
    assert ids == set(range(10)) - {1, 3}
    assert got.filter("user_id = 2").collect()[0]["score"] == 20.0


def test_insert_only(spark, tmp_path):
    root = str(tmp_path / "t")
    _flat(spark, root)
    src = spark.createDataFrame(
        [(50, 500.0, 9), (3, 999.0, 9)],
        "user_id bigint, score double, ts bigint",
    )
    res = merge_into(
        spark, root, src, ["user_id"], when_not_matched=(None, None)
    )
    # matched row 3 untouched (no matched clause), 50 inserted by name
    assert (res["rows_updated"], res["rows_inserted"]) == (0, 1)
    got, _ = read_table(spark, root)
    m = {r["user_id"]: r["score"] for r in got.collect()}
    assert m[50] == 500.0 and m[3] == 3.0 and len(m) == 11


def test_mixed_clauses_and_conditional_insert(spark, tmp_path):
    root = str(tmp_path / "t")
    _flat(spark, root)
    src = _src(
        spark,
        [(0, "D", 0.0), (1, "U", 11.0), (2, "X", 0.0),
         (60, "I", 600.0), (61, "X", 610.0)],
    )
    res = merge_into(
        spark, root, src, ["user_id"],
        when_matched=[
            ("s.flag = 'D'", "delete"),
            ("s.flag = 'U'", {"score": "s.val + t.score"}),
        ],
        when_not_matched=("s.flag = 'I'", {
            "user_id": "s.user_id", "score": "s.val", "ts": "2",
        }),
    )
    assert (res["rows_updated"], res["rows_deleted"], res["rows_inserted"]) \
        == (1, 1, 1)
    got, _ = read_table(spark, root)
    m = {r["user_id"]: (r["score"], r["ts"]) for r in got.collect()}
    assert 0 not in m                       # deleted
    assert m[1] == (12.0, 1)                # updated: 11 + 1
    assert m[2] == (2.0, 1)                 # flag X: no clause applied
    assert m[60] == (600.0, 2)              # conditional insert fired
    assert 61 not in m                      # condition false -> dropped


def test_null_condition_is_false(spark, tmp_path):
    """SQL semantics: a NULL-valued condition applies NO clause —
    the row falls through to the next clause / stays unchanged."""
    root = str(tmp_path / "t")
    _flat(spark, root)
    src = _src(spark, [(1, None, 10.0), (2, "D", 0.0)])
    res = merge_into(
        spark, root, src, ["user_id"],
        when_matched=[("s.flag = 'D'", "delete")],
    )
    # row 1: NULL = 'D' is NULL -> false -> kept; row 2 deleted
    assert (res["rows_updated"], res["rows_deleted"]) == (0, 1)
    got, _ = read_table(spark, root)
    ids = {r["user_id"] for r in got.collect()}
    assert 1 in ids and 2 not in ids


def test_not_matched_by_source(spark, tmp_path):
    root = str(tmp_path / "t")
    _flat(spark, root)
    src = _src(spark, [(0, "K", 0.0), (1, "K", 0.0)])
    res = merge_into(
        spark, root, src, ["user_id"],
        when_matched=[(None, {"score": "t.score + 100"})],
        when_not_matched_by_source=[
            ("t.user_id >= 8", "delete"),
            (None, {"score": "-1.0"}),
        ],
    )
    assert res["rows_deleted"] == 2          # 8, 9
    assert res["rows_updated"] == 2 + 6      # matched 0,1 + nbs 2..7
    got, _ = read_table(spark, root)
    m = {r["user_id"]: r["score"] for r in got.collect()}
    assert m[0] == 100.0 and m[1] == 101.0
    assert all(m[i] == -1.0 for i in range(2, 8))
    assert 8 not in m and 9 not in m


def test_duplicate_source_keys_raise(spark, tmp_path):
    root = str(tmp_path / "t")
    _flat(spark, root)
    src = _src(spark, [(3, "U", 1.0), (3, "U", 2.0), (77, "U", 1.0)])
    with pytest.raises(ValueError, match="multiple source rows"):
        merge_into(
            spark, root, src, ["user_id"],
            when_matched=[(None, {"score": "s.val"})],
        )
    # duplicates only on keys ABSENT from the target are fine
    src2 = _src(spark, [(77, "U", 1.0), (77, "U", 2.0), (3, "U", 30.0)])
    res = merge_into(
        spark, root, src2, ["user_id"],
        when_matched=[(None, {"score": "s.val"})],
    )
    assert res["rows_updated"] == 1


def test_noop_merge_publishes_no_version(spark, tmp_path):
    root = str(tmp_path / "t")
    _flat(spark, root)
    v0 = txn.latest_version(root)
    src = _src(spark, [(999, "U", 1.0)])
    res = merge_into(
        spark, root, src, ["user_id"],
        when_matched=[(None, {"score": "s.val"})],
    )
    assert not res["committed"]
    assert txn.latest_version(root) == v0


def test_partitioned_touched_only_rewrite(spark, tmp_path):
    root = str(tmp_path / "t")
    _part(spark, root)
    v1 = txn.latest_version(root)
    parts_before = txn.resolve_partitions(root, v1)
    src = spark.createDataFrame(
        [(0, 100.0, 2, D1), (300, 300.0, 2, D3), (400, 400.0, 2,
          datetime.date(2024, 1, 4))],
        "user_id bigint, score double, ts bigint, p date",
    )
    res = merge_into(
        spark, root, src, ["user_id"],
        when_matched=[(None, {"score": "s.score"})],
        when_not_matched=(None, None),
    )
    assert res["committed"]
    assert (res["rows_updated"], res["rows_inserted"]) == (1, 2)
    # D2 untouched -> byte-identical carry-forward; D1/D3 rewritten;
    # 2024-01-04 is a brand-new partition from the insert
    parts_after = txn.resolve_partitions(root, txn.latest_version(root))
    assert parts_after["2024-01-02"]["dir"] == parts_before["2024-01-02"]["dir"]
    assert parts_after["2024-01-01"]["dir"] != parts_before["2024-01-01"]["dir"]
    assert "2024-01-04" in parts_after
    assert parts_after["2024-01-04"]["rows"] == 1
    assert res["partitions_rewritten"] == 3
    got, _ = read_table(spark, root)
    assert got.count() == 17
    m = {r["user_id"]: r["score"] for r in got.collect()}
    assert m[0] == 100.0 and m[300] == 300.0 and m[400] == 400.0
    # stats/bloom re-recorded on rewritten + new leaves (same posture
    # as the old entries)
    for pk in ("2024-01-01", "2024-01-03", "2024-01-04"):
        assert "user_id" in (parts_after[pk].get("stats") or {})
        assert "user_id" in (parts_after[pk].get("bloom") or {})
    # data skipping still prunes with the refreshed stats
    probe, _ = read_table(spark, root, where=[("user_id", "=", 400)])
    assert probe.count() == 1


def test_partitioned_delete_empties_partition(spark, tmp_path):
    root = str(tmp_path / "t")
    _part(spark, root)
    src = spark.createDataFrame(
        [(i,) for i in range(200, 205)], "user_id bigint"
    )
    res = merge_into(
        spark, root, src, ["user_id"],
        when_matched=[(None, "delete")],
    )
    assert res["rows_deleted"] == 5
    assert res["partitions_removed"] == 1
    assert res["partitions_rewritten"] == 0
    got, _ = read_table(spark, root)
    assert got.count() == 10
    parts = txn.resolve_partitions(root, txn.latest_version(root))
    assert "2024-01-03" not in parts


def test_partition_column_set_refused(spark, tmp_path):
    root = str(tmp_path / "t")
    _part(spark, root)
    src = spark.createDataFrame([(0, D2)], "user_id bigint, p date")
    with pytest.raises(ValueError, match="partition column"):
        merge_into(
            spark, root, src, ["user_id"],
            when_matched=[(None, {"p": "s.p"})],
        )


def test_cdc_across_merge(spark, tmp_path):
    """table_changes over a merge version shows exactly the
    inserted/updated/deleted rows; untouched partitions are skipped
    by byte-identity."""
    root = str(tmp_path / "t")
    _part(spark, root)
    v1 = txn.latest_version(root)
    src = spark.createDataFrame(
        [(0, 50.0, 2, D1), (200, 0.0, 2, D3)],
        "user_id bigint, score double, ts bigint, p date",
    )
    merge_into(
        spark, root, src, ["user_id"],
        when_matched=[
            ("s.score = 0.0", "delete"),
            (None, {"score": "s.score"}),
        ],
    )
    ch = table_changes(
        spark, root, v1, txn.latest_version(root), ["user_id"]
    ).collect()
    kinds = {(r["user_id"], r["status"]) for r in ch if r["status"] != "unchanged"}
    assert kinds == {(200, "removed"), (0, "changed")}


def test_concurrent_merges_lose_no_update(spark, tmp_path):
    """Two live threads interleaving MERGEs over disjoint key ranges:
    the optimistic retry (accounting-mismatch recompute) must land
    every update from both writers."""
    import threading

    root = str(tmp_path / "t")
    _flat(spark, root)  # users 0..9, score = user_id
    errors = []

    def merger(lo):
        try:
            for i in range(3):
                src = spark.createDataFrame(
                    [(lo + i, "U", float(1000 + lo + i))],
                    "user_id bigint, flag string, val double",
                )
                merge_into(
                    spark, root, src, ["user_id"],
                    when_matched=[(None, {"score": "s.val"})],
                    when_not_matched=(None, {
                        "user_id": "s.user_id", "score": "s.val",
                        "ts": "7",
                    }),
                )
        except Exception as e:  # pragma: no cover - surfaced below
            errors.append(e)

    t1 = threading.Thread(target=merger, args=(0,))     # updates 0..2
    t2 = threading.Thread(target=merger, args=(50,))    # inserts 50..52
    t1.start(); t2.start(); t1.join(); t2.join()
    assert not errors
    got, _ = read_table(spark, root)
    m = {r["user_id"]: r["score"] for r in got.collect()}
    assert all(m[i] == 1000.0 + i for i in range(3))
    assert all(m[50 + i] == 1050.0 + i for i in range(3))
    assert len(m) == 13
    assert txn.latest_version(root) == 7  # 1 base + 6 merge commits


def test_merge_nondeterministic_source_is_materialized(spark, tmp_path):
    """ADVICE r7: merge_into evaluates the source several times
    (dup guard, accounting, rewrite); a nondeterministic source plan
    (unseeded rand filter) must be pinned once, so the merge commits
    with accounting consistent with the written rows instead of
    burning retries on cross-evaluation drift."""
    from pyspark.sql import functions as F

    root = str(tmp_path / "t")
    _flat(spark, root)  # user_ids 0..9
    base = spark.range(200).select(
        (F.col("id") + 1000).alias("user_id"),
        F.lit("I").alias("flag"),
        F.col("id").cast("double").alias("val"),
    )
    src = base.filter(F.rand() < 0.5)  # nondeterministic row set
    res = merge_into(
        spark, root, src, ["user_id"],
        when_not_matched=(None, {
            "user_id": "s.user_id", "score": "s.val", "ts": "2",
        }),
    )
    assert res["committed"]
    got, _ = read_table(spark, root)
    assert got.count() == 10 + res["rows_inserted"]
    # and the inserted set is exactly one coherent evaluation
    ins = got.filter("user_id >= 1000").count()
    assert ins == res["rows_inserted"]


def test_merge_txn_watermark_idempotency(spark, tmp_path):
    """txn=(app_id, version) — the Delta txnAppId/txnVersion
    idempotent-write contract: a replayed (app_id, version) is
    skipped; a higher version applies; watermarks are per-app and
    survive unrelated commits."""
    root = str(tmp_path / "t")
    _flat(spark, root)
    src = _src(spark, [(3, "U", 30.0)])
    res = merge_into(
        spark, root, src, ["user_id"],
        when_matched=[(None, {"score": "s.val"})], txn=("appA", 7),
    )
    assert res["committed"] and not res["txn_skipped"]
    v = res["version"]
    # replay: same app, same + lower version -> skipped, no commit
    for ver in (7, 6):
        r = merge_into(
            spark, root, src, ["user_id"],
            when_matched=[(None, {"score": "s.val + 1"})],
            txn=("appA", ver),
        )
        assert r["txn_skipped"] and not r["committed"]
        assert txn.latest_version(root) == v
    # a DIFFERENT app at the same version applies
    r = merge_into(
        spark, root, src, ["user_id"],
        when_matched=[(None, {"score": "s.val + 1"})], txn=("appB", 7),
    )
    assert r["committed"] and not r["txn_skipped"]
    # watermark survives an unrelated (txn-less) commit in between
    upsert_manifest(
        spark.createDataFrame([(50, 5.0, 9)],
                              "user_id bigint, score double, ts bigint"),
        root, ["user_id"], "ts",
    )
    r = merge_into(
        spark, root, src, ["user_id"],
        when_matched=[(None, {"score": "0.0"})], txn=("appA", 7),
    )
    assert r["txn_skipped"]
    got, _ = read_table(spark, root)
    m = {x["user_id"]: x["score"] for x in got.collect()}
    assert m[3] == 31.0  # appA's replay never re-applied
    # higher version for appA applies
    r = merge_into(
        spark, root, src, ["user_id"],
        when_matched=[(None, {"score": "99.0"})], txn=("appA", 8),
    )
    assert r["committed"]
    # upsert_manifest honors the same watermark
    upd = spark.createDataFrame([(3, 1.0, 99)],
                                "user_id bigint, score double, ts bigint")
    n = upsert_manifest(upd, root, ["user_id"], "ts", txn=("appA", 8))
    got, _ = read_table(spark, root)
    assert {x["score"] for x in got.filter("user_id = 3").collect()} == {99.0}
    assert n == got.count()  # skip returns the tip's row count
    with pytest.raises(ValueError, match="app_id"):
        merge_into(spark, root, src, ["user_id"],
                   when_matched=[(None, {"score": "s.val"})], txn=("", 1))


def test_merge_schema_evolution_adds_source_columns(spark, tmp_path):
    """Delta autoMerge analogue: with allow_schema_evolution=True the
    columns the merge LANDS evolve the schema — assignment targets of
    SET/INSERT dicts, or every source column under INSERT *. A helper
    column the clauses merely read (val) never changes the table.
    Pre-existing rows read NULL for appended columns."""
    root = str(tmp_path / "t")
    _flat(spark, root)  # user_id bigint, score double, ts bigint
    src = spark.createDataFrame(
        [(3, 30.0, "gold", 7), (1000, 1.5, "new", 9)],
        "user_id bigint, val double, tier string, bonus int",
    )
    # evolution off: naming the new column raises the existing guard
    with pytest.raises(ValueError, match="not in the table schema"):
        merge_into(
            spark, root, src, ["user_id"],
            when_matched=[(None, {"tier": "s.tier"})],
        )
    res = merge_into(
        spark, root, src, ["user_id"],
        when_matched=[(None, {"score": "s.val", "tier": "s.tier"})],
        when_not_matched=(None, {
            "user_id": "s.user_id", "score": "s.val",
            "tier": "s.tier", "bonus": "s.bonus",
        }),
        allow_schema_evolution=True,
    )
    assert res["committed"]
    got, _ = read_table(spark, root)
    # val was read, never landed -> not in the schema
    assert set(got.columns) == {"user_id", "score", "ts", "tier", "bonus"}
    rows = {r["user_id"]: r for r in got.collect()}
    assert rows[3]["tier"] == "gold" and rows[3]["bonus"] is None
    assert rows[1000]["tier"] == "new" and rows[1000]["bonus"] == 9
    assert rows[5]["tier"] is None and rows[5]["bonus"] is None  # history
    # time travel: v1 still reads under its own (old) schema
    old, _ = read_table(spark, root, 1)
    assert set(old.columns) == {"user_id", "score", "ts"}
    # INSERT * lands EVERY source column (Delta insertAll): a second
    # evolution through the star form appends val too
    src2 = spark.createDataFrame(
        [(2000, 4.5, "x", 1)],
        "user_id bigint, val double, tier string, bonus int",
    )
    merge_into(
        spark, root, src2, ["user_id"],
        when_not_matched=(None, None),
        allow_schema_evolution=True,
    )
    got, _ = read_table(spark, root)
    assert "val" in got.columns
    rows = {r["user_id"]: r for r in got.collect()}
    assert rows[2000]["val"] == 4.5 and rows[3]["val"] is None


def test_merge_schema_evolution_widens_shared_column(spark, tmp_path):
    root = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, 10, 1), (2, 20, 1)], "user_id bigint, score int, ts bigint"
    )
    upsert_manifest(df, root, ["user_id"], "ts")
    src = spark.createDataFrame(
        [(1, 2_000_000_000_000)], "user_id bigint, score bigint"
    )
    # not widenable the other way: bigint source over int target widens
    res = merge_into(
        spark, root, src, ["user_id"],
        when_matched=[(None, {"score": "s.score"})],
        allow_schema_evolution=True,
    )
    assert res["committed"]
    got, _ = read_table(spark, root)
    assert got.schema["score"].dataType.simpleString() == "bigint"
    m = {r["user_id"]: r["score"] for r in got.collect()}
    assert m[1] == 2_000_000_000_000 and m[2] == 20
    # an UNSAFE retype still raises
    bad = spark.createDataFrame([(1, "x")], "user_id bigint, score string")
    with pytest.raises(ValueError, match="not a safe widening"):
        merge_into(
            spark, root, bad, ["user_id"],
            when_matched=[(None, {"score": "s.score"})],
            allow_schema_evolution=True,
        )


def test_merge_schema_evolution_respects_retired_and_constraints(
    spark, tmp_path
):
    from feature_store_spark.pipelines.txn import add_constraint, drop_column

    root = str(tmp_path / "t")
    _flat(spark, root)
    drop_column(root, "score")  # retires the physical name
    src = spark.createDataFrame(
        [(3, 1.0)], "user_id bigint, score double"
    )
    with pytest.raises(ValueError, match="RETIRED"):
        merge_into(
            spark, root, src, ["user_id"],
            when_not_matched=(None, None),
            allow_schema_evolution=True,
        )
    # constraint enforcement fires on evolved merges too
    add_constraint(spark, root, "uid_pos", "user_id >= 0")
    bad = spark.createDataFrame(
        [(-5, "x")], "user_id bigint, tag string"
    )
    with pytest.raises(ValueError, match="uid_pos"):
        merge_into(
            spark, root, bad, ["user_id"],
            when_not_matched=(None, None),
            allow_schema_evolution=True,
        )


def test_merge_schema_evolution_partitioned_untouched_leaves(
    spark, tmp_path
):
    """Partitioned evolution: only touched partitions rewrite; the
    untouched partition's old-schema leaf carries forward and reads
    the appended column as NULL (and a widened column via the parquet
    type-widening read)."""
    root = str(tmp_path / "t")
    _part(spark, root)  # D1: 0-4, D2: 100-104, D3: 200-204
    src = spark.createDataFrame(
        [(0, 99.0, "hit", D1)],
        "user_id bigint, val double, tag string, p date",
    )
    res = merge_into(
        spark, root, src, ["user_id"],
        when_matched=[(None, {"score": "s.val", "tag": "s.tag"})],
        allow_schema_evolution=True,
    )
    assert res["committed"] and res["partitions_rewritten"] == 1
    got, _ = read_table(spark, root)
    assert "tag" in got.columns
    rows = {r["user_id"]: r for r in got.collect()}
    assert rows[0]["tag"] == "hit" and rows[0]["score"] == 99.0
    assert rows[200]["tag"] is None and rows[200]["score"] == 200.0
    assert got.count() == 15
