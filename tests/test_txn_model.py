"""Stateful model test of the WHOLE table format: a random sequence
of verbs (upsert, delete, dv-delete, dv-update, merge, dv-merge,
rename, add/drop column,
restore, compact, drop/add constraint) applied to BOTH a manifest
table and a plain Python dict model — after every step the table must
read back exactly the model, and at the end every retained version
must still time-travel to its recorded model snapshot.

This is the cross-verb interaction net the per-verb suites cannot
weave: rename-then-merge, drop-column-then-restore, constraint-
then-update, compact in the middle of history, etc."""
from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import feature_store_spark.pipelines.txn as txn
from feature_store_spark.pipelines.txn import (
    add_column,
    compact_manifest,
    delete_where,
    drop_column,
    merge_into,
    read_table,
    rename_column,
    restore,
    update_where,
    upsert_manifest,
)

_settings = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)

# each op is (tag, payload) drawn small; keys 0..6, values small ints
_key = st.integers(0, 6)
_val = st.integers(-9, 9)

_ops = st.lists(
    st.one_of(
        st.tuples(st.just("upsert"),
                  st.dictionaries(_key, _val, min_size=1, max_size=4)),
        st.tuples(st.just("delete_ge"), st.integers(-5, 9)),
        st.tuples(st.just("delete_dv_ge"), st.integers(-5, 9)),
        st.tuples(st.just("update_dv_ge"),
                  st.tuples(st.integers(-5, 9), _val)),
        st.tuples(st.just("merge"),
                  st.dictionaries(_key, st.tuples(
                      st.sampled_from(["D", "U"]), _val), min_size=1,
                      max_size=4)),
        st.tuples(st.just("merge_dv"),
                  st.dictionaries(_key, st.tuples(
                      st.sampled_from(["D", "U"]), _val), min_size=1,
                      max_size=4)),
        st.tuples(st.just("rename"), st.just(None)),
        st.tuples(st.just("addcol"), st.just(None)),
        st.tuples(st.just("dropcol"), st.just(None)),
        st.tuples(st.just("restore1"), st.just(None)),
        st.tuples(st.just("compact"), st.just(None)),
    ),
    min_size=3,
    max_size=7,
)


@given(ops=_ops)
@_settings
@pytest.mark.slow
def test_table_format_matches_model(spark, ops):
    import shutil as _sh
    import tempfile

    root = tempfile.mkdtemp(prefix="txn_model_")
    vcol = "v"            # current logical name of the value column
    extra = False          # whether the optional 'x' column exists
    x_retired = False      # 'x' was dropped once -> physically retired
    model: dict = {1: 1, 2: 2}   # key -> value (v column)
    snapshots: dict = {}   # version -> (model, vcol, extra, x_retired)

    def commit_df(rows, with_extra):
        schema = f"user_id bigint, {vcol} bigint, ts bigint" + (
            ", x bigint" if with_extra else ""
        )
        return spark.createDataFrame(rows, schema)

    def checkpoint():
        snapshots[txn.latest_version(root)] = (
            dict(model), vcol, extra, x_retired,
        )

    def verify():
        got, _ = read_table(spark, root)
        rows = {r["user_id"]: r[vcol] for r in got.collect()}
        assert rows == model, (rows, model)
        assert ("x" in got.columns) == extra

    try:
        upsert_manifest(
            commit_df([(k, v, 0) for k, v in model.items()], False),
            root, ["user_id"], "ts",
        )
        checkpoint()
        for step, (tag, arg) in enumerate(ops, start=1):
            if tag == "upsert":
                rows = [
                    (k, v, step) + ((None,) if extra else ())
                    for k, v in arg.items()
                ]
                upsert_manifest(
                    commit_df(rows, extra), root, ["user_id"], "ts"
                )
                model.update(arg)
            elif tag == "delete_ge":
                delete_where(spark, root, [(vcol, ">=", arg)])
                model = {k: v for k, v in model.items() if not (
                    v is not None and v >= arg)}
            elif tag == "delete_dv_ge":
                # merge-on-read arm: same semantics, deletion-vector
                # commit — interleaves with every other verb
                delete_where(spark, root, [(vcol, ">=", arg)], mode="dv")
                model = {k: v for k, v in model.items() if not (
                    v is not None and v >= arg)}
            elif tag == "update_dv_ge":
                # merge-on-read UPDATE: old positions into the DV,
                # new images appended — interleaved with every verb
                thr, nv = arg
                update_where(
                    spark, root, [(vcol, ">=", thr)], {vcol: nv},
                    mode="dv",
                )
                model = {
                    k: (nv if (v is not None and v >= thr) else v)
                    for k, v in model.items()
                }
            elif tag in ("merge", "merge_dv"):
                src = spark.createDataFrame(
                    [(k, f, v) for k, (f, v) in arg.items()],
                    "user_id bigint, flag string, nv bigint",
                )
                merge_into(
                    spark, root, src, ["user_id"],
                    when_matched=[
                        ("s.flag = 'D'", "delete"),
                        (None, {vcol: "s.nv"}),
                    ],
                    when_not_matched=("s.flag = 'U'", {
                        "user_id": "s.user_id", vcol: "s.nv",
                        "ts": str(step),
                    }),
                    mode="dv" if tag == "merge_dv" else "rewrite",
                )
                for k, (f, v) in arg.items():
                    if k in model:
                        if f == "D":
                            model.pop(k)
                        else:
                            model[k] = v
                    elif f == "U":
                        model[k] = v
            elif tag == "rename":
                new = "w" if vcol == "v" else "v"
                rename_column(root, vcol, new)
                vcol = new
            elif tag == "addcol":
                if x_retired:
                    # dropped once -> physical name retired forever
                    with pytest.raises(ValueError, match="RETIRED"):
                        add_column(root, "x", "bigint")
                elif not extra:
                    add_column(root, "x", "bigint")
                    extra = True
            elif tag == "dropcol":
                if extra:
                    drop_column(root, "x")
                    extra = False
                    x_retired = True
            elif tag == "restore1":
                tgt, (m2, vc2, ex2, xr2) = sorted(snapshots.items())[0]
                restore(root, version=tgt)
                # the restored manifest carries the TARGET's mapping
                # and retired list — a restore to a pre-drop snapshot
                # legitimately un-retires the column (its bytes are
                # live again in the restored leaves)
                model, vcol, extra, x_retired = dict(m2), vc2, ex2, xr2
            elif tag == "compact":
                compact_manifest(spark, root)
            verify()
            checkpoint()
        # every recorded version still time-travels to its snapshot
        for ver, (m2, vc2, ex2, _xr2) in snapshots.items():
            old, _ = read_table(spark, root, ver)
            rows = {r["user_id"]: r[vc2] for r in old.collect()}
            assert rows == m2, (ver, rows, m2)
            assert ("x" in old.columns) == ex2
    finally:
        _sh.rmtree(root, ignore_errors=True)
