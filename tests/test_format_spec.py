"""FORMAT.md is the NORMATIVE on-disk spec — pin it to the code
(VERDICT r8 item 6): the §6 feature table must equal the engine's
READER_FEATURES/WRITER_FEATURES, and a table round-tripped through
every feature-establishing verb must stamp exactly the spec'd
features. Drift between the document and `_carry_mapping`'s guard
set fails here, not in production."""

from __future__ import annotations

import os
import re

import feature_store_spark.pipelines.txn as txn
from feature_store_spark.pipelines.txn import (
    READER_FEATURES,
    WRITER_FEATURES,
    add_constraint,
    clone_table,
    delete_where,
    drop_column,
    read_manifest,
    read_table,
    rename_column,
    update_where,
    upsert_manifest,
)

SPEC = os.path.join(os.path.dirname(os.path.dirname(__file__)), "FORMAT.md")


def _spec_features() -> dict[str, tuple[bool, bool]]:
    """Parse FORMAT.md §6's feature table: {feature: (reader, writer)}."""
    text = open(SPEC).read()
    sec = text.split("## 6. Protocol")[1].split("## 7.")[0]
    out = {}
    for line in sec.splitlines():
        m = re.match(r"\|\s*`(\w+)`\s*\|\s*(yes|—)\s*\|\s*(yes|—)\s*\|", line)
        if m:
            out[m.group(1)] = (m.group(2) == "yes", m.group(3) == "yes")
    return out


def test_spec_feature_table_matches_engine_guards():
    spec = _spec_features()
    assert spec, "FORMAT.md §6 feature table not parseable"
    spec_readers = {f for f, (r, _) in spec.items() if r}
    spec_writers = {f for f, (_, w) in spec.items() if w}
    assert spec_readers == set(READER_FEATURES)
    assert spec_writers == set(WRITER_FEATURES)
    # every spec'd reader feature binds writers too (§6 rule the
    # stamp enforces via `w |= r & READER_FEATURES`)
    assert spec_readers <= spec_writers


def test_full_feature_roundtrip_stamps_exactly_the_spec(spark, tmp_path):
    """One table through every feature-establishing verb; the final
    manifest's protocol must equal FORMAT.md §6's full table — a new
    feature added in code without a spec row (or vice versa) fails."""
    spec = _spec_features()
    root = str(tmp_path / "t")
    upsert_manifest(
        spark.createDataFrame(
            [(i, float(i), i, 1) for i in range(8)],
            "user_id bigint, score double, extra bigint, ts bigint",
        ),
        root, ["user_id"], "ts",
    )
    rename_column(root, "score", "points")           # column_mapping
    drop_column(root, "extra")                       # retired_physical
    add_constraint(spark, root, "pos", "points >= 0")  # constraints
    upsert_manifest(                                 # app_versions
        spark.createDataFrame(
            [(50, 1.0, 2)], "user_id bigint, points double, ts bigint"
        ),
        root, ["user_id"], "ts", txn=("app", 1),
    )
    delete_where(spark, root, [("user_id", "=", 7)], mode="dv")  # deletion_vectors
    update_where(                                    # extra_dirs
        spark, root, [("user_id", "=", 6)], {"points": 9.0}, mode="dv"
    )
    shallow = str(tmp_path / "clone")
    clone_table(root, shallow, deep=False)           # absolute_paths
    m = read_manifest(shallow, 1)
    got_readers = set(m["protocol"]["reader"])
    got_writers = set(m["protocol"]["writer"])
    spec_readers = {f for f, (r, _) in spec.items() if r}
    spec_writers = {f for f, (_, w) in spec.items() if w}
    assert got_readers == spec_readers, (got_readers, spec_readers)
    assert got_writers == spec_writers, (got_writers, spec_writers)
    # and the fully-featured clone still READS correctly
    got, _ = read_table(spark, shallow)
    rows = {r["user_id"]: r["points"] for r in got.collect()}
    assert 7 not in rows and rows[6] == 9.0 and rows[50] == 1.0
    assert len(rows) == 8  # 8 original - 1 deleted + 1 upserted


def test_spec_op_list_matches_committed_ops():
    """§2's op vocabulary covers every op string the code commits."""
    text = open(SPEC).read()
    sec = text.split("## 2. Commit protocol")[1].split("## 3.")[0]
    m = re.search(r"`op` \(([^)]*)\)", sec, re.S)
    assert m, "FORMAT.md §2 op list not parseable"
    spec_ops = {t.strip().strip("`") for t in m.group(1).split("/")}
    src = open(txn.__file__).read()
    code_ops = set(re.findall(r'"op": "(\w+)"', src))
    missing = code_ops - spec_ops
    assert not missing, f"ops committed by code but absent from FORMAT.md §2: {missing}"
