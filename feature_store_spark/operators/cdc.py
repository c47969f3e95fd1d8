"""CDC apply: fold an ordered insert/update/delete change feed into a
keyed base snapshot — the lakehouse MERGE the reference's upsert path
(`src/pipelines/feature_updates.py` last-writer-wins refresh) implies
but never generalizes to deletes. This is the Debezium/Delta-CDF
compaction shape: a change log with per-key sequence numbers replayed
into the next table version.

Semantics are per-key last-writer-wins over the change feed:

- the change with the highest ``seq_col`` wins its key;
- winning op ``'D'`` removes the key from the snapshot (even if it
  exists in the base);
- winning op ``'I'``/``'U'`` upserts the change's payload (both carry
  a full row image — Debezium ``c``/``u``; a ``'U'`` for a key absent
  from the base inserts it, and an ``'I'``/``'U'`` after a ``'D'``
  resurrects the key — op codes are advisory, the row image is truth);
- keys untouched by the feed keep their base row bit-for-bit.

Well-formed feeds have unique (key, seq); if a producer violates that,
ties break deterministically on ``op_col`` descending ('U' > 'I' >
'D'), so replays stay idempotent rather than partition-order-lucky.

Scale shape: the change feed — the SMALL side in every real CDC cycle
— is shuffled once on the key for the latest-wins window; the base is
touched by ONE left-anti join against the window's (distinct-key)
output, which AQE broadcasts whenever the batch is broadcastable, and
which is shuffle-free entirely when the base is bucketed by the key
(`pipelines/store.py` contract). Cost is O(changes) + one pass over
the base; the base is never windowed, never sorted.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from feature_store_spark.operators.windows import latest_per_key


def latest_changes(
    changes: DataFrame,
    key_cols: Sequence[str],
    seq_col: str = "seq",
    op_col: str = "op",
) -> DataFrame:
    """Per-key winning change: highest ``seq_col``, op-desc tiebreak.
    Output = the non-key/meta columns plus ``__seq``/``__op``.
    Malformed op codes fail loudly (a silent typo'd op would drop or
    keep rows wrong); the check rides inside the ``__op`` column every
    downstream filter reads, so column pruning cannot elide it."""
    key_cols = list(key_cols)
    payload = [
        c for c in changes.columns
        if c not in key_cols and c not in (seq_col, op_col)
    ]
    op_checked = F.when(
        F.col(op_col).isin("I", "U", "D"), F.col(op_col)
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit("cdc: bad op code "),
                F.coalesce(F.col(op_col), F.lit("NULL")),
            )
        )
    )
    projected = changes.select(
        *key_cols,
        *payload,
        F.col(seq_col).alias("__seq"),
        op_checked.alias("__op"),
    )
    # the desc-order + desc-tiebreak dedup is the shared W1 primitive
    return latest_per_key(projected, key_cols, "__seq", tiebreak_col="__op")


def apply_cdc(
    base: DataFrame,
    changes: DataFrame,
    key_cols: Sequence[str],
    seq_col: str = "seq",
    op_col: str = "op",
    checkpoint_feed: bool = True,
) -> DataFrame:
    """Return the next snapshot of ``base`` after replaying
    ``changes``. ``changes`` must carry every ``base`` column plus
    ``seq_col`` (orders a key's changes; highest wins) and ``op_col``
    ('I'/'U'/'D'). Output schema == base schema.

    ``checkpoint_feed``: materialize the per-key winning-change table
    (lazy ``localCheckpoint``) so both consumers read it once instead
    of re-planning the feed subtree twice — right for the common
    batch-apply call. The trade: checkpoint blocks are held in
    executor storage until the session (or the RDD) is GC'd, and the
    truncated lineage means executor loss fails the job rather than
    recomputing. A LONG-LIVED session applying many CDC cycles
    (streaming-style callers; foreachBatch loops) should pass
    ``checkpoint_feed=False`` to avoid accumulating storage, or
    unpersist between cycles.
    """
    key_cols = list(key_cols)
    payload = [c for c in base.columns if c not in key_cols]
    missing = [c for c in base.columns if c not in changes.columns]
    if missing:
        raise ValueError(
            f"apply_cdc: changes feed lacks base columns {missing}"
        )
    # The winning-change table is materialized once (lazy
    # localCheckpoint, round 10): it is consumed twice — upserts and
    # the anti-join key set — and per-consumer column pruning would
    # otherwise re-plan the whole feed subtree for each, reading the
    # change source twice (s12's synthesized feed is 4 unioned scans:
    # 8 scans before, 4 after). `latest` is one narrow row per
    # touched key — the smallest possible thing to pin; in a real CDC
    # cycle it is batch-sized. The anti-join side is exactly the
    # window output's key column (one row per key by construction —
    # no distinct aggregate needed; the old `changes.distinct()`
    # repeated the full feed pass).
    latest = latest_changes(
        changes.select(*key_cols, *payload, seq_col, op_col),
        key_cols,
        seq_col,
        op_col,
    )
    if checkpoint_feed:
        latest = latest.localCheckpoint(eager=False)
    upserts = latest.filter(F.col("__op") != "D").select(
        *key_cols, *payload
    )
    touched = latest.select(*key_cols)
    kept = base.join(touched, key_cols, "left_anti")
    return kept.unionByName(upserts)


def apply_cdc_oracle_sql(
    base_sql: str,
    changes_sql: str,
    key_cols: Sequence[str],
    payload_cols: Sequence[str],
    seq_col: str = "seq",
    op_col: str = "op",
) -> str:
    """DuckDB twin: same latest-wins window, same anti-join + union.
    ``base_sql`` / ``changes_sql`` are subqueries producing the two
    inputs; columns follow the same contract as :func:`apply_cdc`."""
    keys = ", ".join(key_cols)
    cols = ", ".join(list(key_cols) + list(payload_cols))
    on = " AND ".join(f"b.{k} = t.{k}" for k in key_cols)
    return f"""
    WITH base AS ({base_sql}),
    changes AS ({changes_sql}),
    latest AS (
      SELECT * FROM (
        SELECT {cols}, {op_col} AS __op,
               row_number() OVER (
                 PARTITION BY {keys}
                 ORDER BY {seq_col} DESC, {op_col} DESC) AS __rn
        FROM changes
      ) WHERE __rn = 1
    )
    SELECT {cols} FROM base b
    WHERE NOT EXISTS (SELECT 1 FROM latest t WHERE {on})
    UNION ALL
    SELECT {cols} FROM latest WHERE __op <> 'D'
    """
