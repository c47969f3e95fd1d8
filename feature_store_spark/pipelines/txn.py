"""Transactional multi-writer upsert: manifest-commit parquet tables.

``upsert_parquet`` (pipelines/sinks.py) is crash-safe via its staged
tmp-path rename, but two CONCURRENT writers can still interleave
read-merge-overwrite and silently lose one writer's keys — the
reference never has this problem because its merge is an atomic
per-statement ``INSERT … ON CONFLICT (user_id) DO UPDATE``
(`src/pipelines/batch_pipeline.py:221-310`). This module closes the
gap with the standard lake-format answer re-implemented minimally
(the Delta/Iceberg commit protocol, public in both projects' specs):

- **Immutable data, versioned manifests.** Every commit writes its
  full merged snapshot to a fresh ``data/<uuid>/`` directory, then
  publishes it by creating ``_manifests/v{N+1}.json``. Data files are
  never mutated or deleted by writers.
- **Atomic publish.** The manifest file is created with
  ``O_CREAT|O_EXCL`` — on a POSIX filesystem exactly ONE writer can
  create a given version file; the loser sees ``FileExistsError``,
  discards its orphan data directory, re-reads the new snapshot,
  re-merges, and retries (optimistic concurrency — exactly Delta's
  loop). On an object store the same protocol rides a conditional
  put (S3 If-None-Match / GCS x-goog-if-generation-match); the
  POSIX create is the local-filesystem instance of it.
- **Snapshot-isolated readers.** A reader resolves the newest
  committed manifest once and reads ONLY that manifest's data
  directory — a crash mid-write (data written, manifest not) is
  invisible, and concurrent commits never tear a read.

Scale posture: the protocol adds no Spark-side work — one manifest
file per commit, the same full-snapshot merge cost as
``upsert_parquet`` (at 100 TB, pair it with the partition-scoped
merge so each commit's data dir holds only touched partitions, or
swap the whole module for Delta — the call-site contract is
identical). ``vacuum`` reclaims data directories referenced only by
pruned manifests, plus — behind an explicit grace window —
crash-orphaned dirs no manifest ever referenced.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import uuid
from collections.abc import Sequence

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from feature_store_spark.operators.windows import latest_per_key

MANIFEST_DIR = "_manifests"
DATA_DIR = "data"
# \d{8,}: _manifest_path zero-pads to 8 digits but versions past
# 99,999,999 format wider — an exact {8} would make them invisible to
# _list_versions and wedge every later writer on the same version
_MANIFEST_RE = re.compile(r"v(\d{8,})\.json")


def _manifest_path(root: str, version: int) -> str:
    return os.path.join(root, MANIFEST_DIR, f"v{version:08d}.json")


def _list_versions(root: str) -> list[int]:
    """All committed version numbers on disk, ascending — the ONE
    manifest-scan used by latest_version and both vacuum passes."""
    d = os.path.join(root, MANIFEST_DIR)
    if not os.path.isdir(d):
        return []
    return sorted(
        int(m.group(1))
        for f in os.listdir(d)
        if (m := _MANIFEST_RE.fullmatch(f))
    )


def latest_version(root: str) -> int:
    """Newest committed version; 0 means no committed table."""
    return max(_list_versions(root), default=0)


def read_manifest(root: str, version: int) -> dict:
    with open(_manifest_path(root, version)) as f:
        return json.load(f)


def _manifest_dirs(m: dict) -> list[str]:
    """Every data directory a manifest references: the single
    snapshot dir (unpartitioned, format 1) or one leaf dir per live
    partition (partitioned, format 2)."""
    if "partitions" in m:
        return [e["dir"] for e in m["partitions"].values()]
    return [m["data_dir"]]


def _rmdir_if_no_live_children(path: str, root: str, kept: set[str]) -> None:
    """Reclaim a format-2 commit directory once vacuum has pruned its
    last referenced partition leaf: when no SUBDIRECTORY remains (only
    write markers like _SUCCESS) and nothing under it is in ``kept``,
    the whole dir is dead weight. No-ops for format-1 dirs (their
    parent is data/ itself, which always has live siblings kept)."""
    rel = os.path.relpath(path, root)
    if rel in (DATA_DIR, ".", "") or rel in kept:
        return
    try:
        entries = os.listdir(path)
    except FileNotFoundError:
        return
    if any(os.path.isdir(os.path.join(path, e)) for e in entries):
        return
    shutil.rmtree(path, ignore_errors=True)


def read_table(
    spark: SparkSession, root: str, version: int | None = None
) -> tuple[DataFrame | None, int]:
    """(snapshot, version) pinned to ONE committed manifest — or
    (None, 0) for a table with no commits. Passing ``version`` time-
    travels to that commit (manifests are retained until vacuumed)."""
    v = latest_version(root) if version is None else version
    if v == 0:
        return None, 0
    m = read_manifest(root, v)
    schema = StructType.fromJson(m["schema"])
    df = spark.read.schema(schema).parquet(
        os.path.join(root, m["data_dir"])
    )
    return df, v


def _guard_foreign_store(root: str) -> None:
    """Refuse to treat a plain ``upsert_parquet`` store as an empty
    transactional table. A root previously written by the non-txn sink
    has part files directly under it but no ``_manifests/``; silently
    committing a first manifest there would publish a snapshot that
    drops every previously upserted key (and pollute the plain store
    with data/ + _manifests/ subdirs for the reverse toggle). The
    mirror guard lives in ``sinks.upsert_parquet``."""
    if not os.path.isdir(root):
        return
    for e in os.listdir(root):
        if (
            e.startswith("part-")
            or e.endswith(".parquet")
            or e == "_SUCCESS"
        ):
            raise ValueError(
                f"{root!r} holds a non-transactional parquet store "
                f"(found {e!r}); committing a manifest on top would "
                "silently drop its keys. Migrate explicitly: read the "
                "old store, upsert_manifest it into a FRESH root, then "
                "retire the old path"
            )


def _try_commit(
    root: str,
    version: int,
    data_dir: str,
    rows: int,
    schema: StructType,
    base_version: int,
) -> bool:
    """Atomically publish ``version``; False when another writer won
    the race for this version number (the optimistic-retry signal).

    Publish is link-based, not O_EXCL+write: an exclusive create
    followed by the payload write would expose an EMPTY manifest to a
    concurrent reader between the two syscalls. Writing the full
    payload to a private temp file first and then hard-linking it to
    the version name makes the manifest appear with its content
    already durable — link() is the POSIX atomic
    create-if-absent-with-content; on an object store the same step
    is a conditional put of the complete object."""
    os.makedirs(os.path.join(root, MANIFEST_DIR), exist_ok=True)
    payload = json.dumps(
        {
            "version": version,
            "base_version": base_version,
            "data_dir": data_dir,
            "rows": rows,
            "schema": schema.jsonValue(),
        }
    )
    target = _manifest_path(root, version)
    tmp = f"{target}.w{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        f.write(payload)
        f.flush()
        os.fsync(f.fileno())
    try:
        os.link(tmp, target)
        return True
    except FileExistsError:
        return False
    finally:
        os.unlink(tmp)


def upsert_manifest(
    updates: DataFrame,
    root: str,
    key_cols: Sequence[str],
    order_col: str,
    max_retries: int = 20,
    allow_schema_evolution: bool = False,
) -> int:
    """``upsert_parquet`` semantics (last-writer-wins per key on
    ``order_col``, update beats store on ties) with SERIALIZABLE
    multi-writer safety: concurrent upserts cannot lose each other's
    keys — the loser of a version race re-merges against the winner's
    snapshot and commits on top (pytest: two interleaved writers, no
    lost update; crash mid-write leaves the old snapshot readable).
    Returns the committed snapshot's row count.

    ``allow_schema_evolution=True`` is the Delta ``mergeSchema``
    analogue: the merge unions by name with missing columns allowed,
    so a NEW update column lands with NULLs on pre-existing rows and
    a column the update dropped survives with NULLs on its rows; the
    evolved schema is pinned in the new manifest, and every prior
    version still time-travels under its own schema. Off by default —
    an accidental column rename silently forking into two NULL-y
    columns is the failure mode the flag gates."""
    spark = updates.sparkSession
    if latest_version(root) == 0:
        _guard_foreign_store(root)
    for _ in range(max_retries):
        base, v = read_table(spark, root)
        if base is not None:
            merged = latest_per_key(
                base.withColumn("__src", F.lit(0)).unionByName(
                    updates.withColumn("__src", F.lit(1)),
                    allowMissingColumns=allow_schema_evolution,
                ),
                list(key_cols),
                order_col,
                tiebreak_col="__src",
            ).drop("__src")
        else:
            merged = latest_per_key(updates, list(key_cols), order_col)
        data_rel = f"{DATA_DIR}/{uuid.uuid4().hex}"
        data_path = os.path.join(root, data_rel)
        obs = Observation()
        merged.observe(obs, F.count(F.lit(1)).alias("rows")).write.parquet(
            data_path
        )
        n = int(obs.get["rows"])
        if _try_commit(root, v + 1, data_rel, n, merged.schema, v):
            return n
        # another writer published v+1 first: our snapshot is stale.
        # Drop the orphan data dir and re-merge against the new tip.
        shutil.rmtree(data_path, ignore_errors=True)
    raise RuntimeError(
        f"upsert_manifest: gave up after {max_retries} version races "
        f"at {root!r} — contention this hot needs a coordinator or a "
        "real lake format"
    )


def table_changes(
    spark: SparkSession,
    root: str,
    from_version: int,
    to_version: int | None = None,
    key_cols: Sequence[str] = ("user_id",),
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Row-level change feed between two committed versions — the CDC
    read every lake format exposes (Delta ``table_changes`` / Iceberg
    ``changelog``), derived here from the retained manifests:
    :func:`operators.diff.snapshot_diff` of the two pinned snapshots,
    emitting (keys, status ∈ added/removed/changed/unchanged,
    changed_cols). Consumers feed downstream incrementally (cache
    invalidation, warehouse sync) without replaying full snapshots.
    ``compare_cols`` defaults to every non-key column of the newer
    snapshot. Scale shape inherits snapshot_diff's: one shuffle per
    side, zero when the snapshots are key-bucketed."""
    from feature_store_spark.operators.diff import snapshot_diff

    try:
        new, v_new = read_table(spark, root, to_version)
        old, v_old = read_table(spark, root, from_version)
    except FileNotFoundError as e:
        raise ValueError(
            f"table_changes: version range {from_version}.."
            f"{to_version or 'latest'} not readable at {root!r} "
            "(manifest missing — vacuumed or never committed)"
        ) from e
    if old is None or new is None:
        raise ValueError(
            f"table_changes: versions {from_version}..{v_new or to_version}"
            f" not readable at {root!r} (table empty at one endpoint)"
        )
    if v_old >= v_new:
        raise ValueError(
            f"table_changes: from_version {v_old} must precede "
            f"to_version {v_new}"
        )
    if compare_cols is None:
        compare_cols = [c for c in new.columns if c not in set(key_cols)]
    return snapshot_diff(old, new, list(key_cols), list(compare_cols))


def vacuum(
    root: str,
    keep_last: int = 1,
    orphan_grace_seconds: float | None = None,
) -> list[str]:
    """Delete data directories referenced by no retained manifest
    (retention: the newest ``keep_last`` versions). Returns the
    removed data dirs. Concurrency: the tip is snapshotted once and
    only versions ≤ that tip are ever pruned, so a commit landing
    mid-vacuum (which is necessarily newer than the snapshotted tip)
    can never have its manifest or data deleted; in-flight writers'
    uncommitted data dirs are likewise untouched by the
    manifest-driven prune.

    Crash-orphaned data dirs (written, never published — a writer
    died between data write and manifest link) are reclaimed only
    when ``orphan_grace_seconds`` is set: any ``data/`` subdirectory
    referenced by NO manifest whose mtime is older than the grace
    window is removed. The grace window is what makes this safe —
    an in-flight writer's dir is also unreferenced, so pick a grace
    comfortably above the longest plausible commit (Delta's
    tombstone-retention rule); ``None`` (default) leaves orphans
    alone."""
    if keep_last < 1:
        raise ValueError("vacuum must keep at least the newest version")
    removed: list[str] = []
    on_disk = _list_versions(root)
    tip = max(on_disk, default=0)
    if tip:
        # only versions that actually exist can be kept or pruned —
        # an earlier, more aggressive vacuum may have removed part of
        # the keep window already (keep_last grew between runs)
        keep_versions = {
            v for v in on_disk if v > tip - keep_last
        }
        # a version published AFTER the tip snapshot is a live
        # concurrent commit — pruning it would destroy committed
        # data; everything newer than the snapshot is left alone
        prunable = [v for v in on_disk if v <= tip and v not in keep_versions]
        # every read/remove in the prune pass tolerates a CONCURRENT
        # vacuum having already deleted the manifest between our
        # _list_versions snapshot and the access — mirroring the
        # orphan pass below; without it two simultaneous vacuums crash
        # one with FileNotFoundError
        kept_dirs = set()
        for v in keep_versions:
            try:
                kept_dirs.update(_manifest_dirs(read_manifest(root, v)))
            except FileNotFoundError:
                continue
        for v in prunable:
            try:
                data_dirs = _manifest_dirs(read_manifest(root, v))
            except FileNotFoundError:
                continue
            for data_dir in data_dirs:
                if data_dir not in kept_dirs:
                    path = os.path.join(root, data_dir)
                    shutil.rmtree(path, ignore_errors=True)
                    if not os.path.exists(path):  # report real removals
                        removed.append(data_dir)
                    _rmdir_if_no_live_children(
                        os.path.dirname(path), root, kept_dirs
                    )
            try:
                os.remove(_manifest_path(root, v))
            except FileNotFoundError:
                continue
    if orphan_grace_seconds is not None:
        # runs even on a zero-commit table: a writer that crashed
        # before its FIRST publish is exactly the 'no manifest ever
        # referenced it' case
        import time

        referenced = set()
        for v in _list_versions(root):
            try:
                dirs = _manifest_dirs(read_manifest(root, v))
            except FileNotFoundError:  # concurrent vacuum pruned it
                continue
            for d in dirs:
                # a format-2 leaf (data/<uuid>/__part=x) keeps its
                # whole commit dir (data/<uuid>) off the orphan list
                referenced.add("/".join(d.split("/")[:2]))
        data_root = os.path.join(root, DATA_DIR)
        cutoff = time.time() - orphan_grace_seconds
        subs = sorted(os.listdir(data_root)) if os.path.isdir(data_root) else []
        for sub in subs:
            rel = f"{DATA_DIR}/{sub}"
            path = os.path.join(data_root, sub)
            if rel in referenced:
                continue
            try:
                mtime = os.path.getmtime(path)
            except FileNotFoundError:
                # a losing writer's own cleanup (or a concurrent
                # vacuum) removed it between listdir and stat
                continue
            if mtime <= cutoff:
                shutil.rmtree(path, ignore_errors=True)
                if not os.path.exists(path):
                    removed.append(rel)
    return removed
