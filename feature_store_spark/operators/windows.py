"""Window / ranking operators (SURVEY.md §2.5)."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def gap_fill(
    df: DataFrame,
    key_col: str,
    date_col: str,
    value_cols: Sequence[str],
    fill: str = "zero",
) -> DataFrame:
    """Calendar gap filling per key — the time-series densification a
    training pipeline needs before rolling/decay features (a missing
    day must read as an explicit zero/carried row, not silently skip
    the frame). For each key, every calendar day between its first
    and last observed ``date_col`` gets a row: observed days keep
    their values; gap days take 0 (``fill='zero'``) or the previous
    observed value (``fill='ffill'``). ``is_filled`` marks synthetic
    rows.

    JOIN-FREE single-shuffle shape: one window per key orders the
    observed days and ``lead`` finds each row's successor; the row
    then explodes into ``sequence(day, next_day - 1)`` — itself plus
    exactly its following gap. No per-key spine aggregate, no second
    exchange, no join: per-key output is bounded by the key's date
    span, so the explode is linear in the DENSIFIED output (the
    minimum any gap-filler must write)."""
    if fill not in ("zero", "ffill"):
        raise ValueError(f"fill must be 'zero' or 'ffill', got {fill!r}")
    if fill == "zero":
        from pyspark.sql.types import NumericType

        bad = [
            c
            for c in value_cols
            if not isinstance(df.schema[c].dataType, NumericType)
        ]
        if bad:
            raise ValueError(
                f"gap_fill: fill='zero' requires numeric value_cols; "
                f"{bad!r} are not numeric — use fill='ffill' (or cast "
                "first)"
            )
    w = Window.partitionBy(key_col).orderBy(date_col)
    withnext = df.withColumn("__next", F.lead(F.col(date_col)).over(w))
    return withnext.select(
        F.col(key_col),
        F.explode(
            F.expr(
                f"sequence({date_col}, "
                f"coalesce(date_sub(__next, 1), {date_col}))"
            )
        ).alias("__day"),
        *[F.col(c) for c in value_cols],
        F.col(date_col).alias("__obs"),
    ).select(
        key_col,
        F.col("__day").alias(date_col),
        *[
            (
                F.when(F.col("__day") == F.col("__obs"), F.col(c)).otherwise(
                    # typed zero: a bare int literal would widen/narrow
                    # the branch type (decimal value cols narrow to int)
                    F.col(c)
                    if fill == "ffill"
                    else F.lit(0).cast(df.schema[c].dataType)
                )
            ).alias(c)
            for c in value_cols
        ],
        (F.col("__day") != F.col("__obs")).alias("is_filled"),
    )


def latest_per_key(
    df: DataFrame,
    key_cols: Sequence[str],
    order_col: str,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Newest record per key (reference ``SELECT DISTINCT ON (user_id)
    ... ORDER BY user_id, report_date DESC``, `sql/risk_features.sql:57-72`).

    row_number over a per-key window — one shuffle on the key. The
    optional tiebreak column pins determinism when order_col ties
    (DISTINCT ON in PG is otherwise nondeterministic). At scale this is
    the standard dedup-to-latest pattern; AQE handles key skew.
    """
    order = [F.col(order_col).desc()]
    if tiebreak_col:
        order.append(F.col(tiebreak_col).desc())
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def top_k(df: DataFrame, order_by: Sequence[Column], k: int) -> DataFrame:
    """Global top-K (reference ``ORDER BY ... DESC LIMIT 100``,
    `tests/benchmarks/database_comparison.py:177`). Spark physical plan
    is TakeOrderedAndProject: per-partition top-K then a single merge —
    no full sort, no full shuffle."""
    return df.orderBy(*order_by).limit(k)


def top_k_per_group(
    df: DataFrame,
    key_cols: Sequence[str],
    order_by: Sequence[Column],
    k: int,
    rank_col: str | None = None,
) -> DataFrame:
    """Top-K within each group via row_number — one shuffle on the
    key. ``rank_col`` keeps the 1..k rank in the output (callers must
    make ``order_by`` total for a deterministic rank)."""
    if rank_col is not None and rank_col in df.columns:
        raise ValueError(
            f"rank_col {rank_col!r} already exists in the input — "
            "renaming would produce two identically named columns"
        )
    w = Window.partitionBy(*key_cols).orderBy(*order_by)
    out = df.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") <= k
    )
    if rank_col is None:
        return out.drop("__rn")
    return out.withColumnRenamed("__rn", rank_col)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    direction: str = "backward",
) -> DataFrame:
    """Point-in-time (as-of) left join: each left row is paired with
    the single right row sharing its keys whose timestamp is the
    nearest at-or-before it (``backward``, the training-set /
    feature-lookup direction — no future leakage) or at-or-after it
    (``forward``). Left rows with no match keep NULL right columns.

    The feature-store primitive the reference approximates with
    latest-per-key snapshots (`sql/risk_features.sql:57-72` W1); an
    as-of join is its generalization from "latest as of now" to
    "latest as of each observation timestamp".

    Implementation is NOT a range join (which explodes into
    O(left × right-per-key) comparisons): both sides are unioned,
    sorted per key by time, and right values are carried forward with
    ``last(ignorenulls)`` over an unbounded-preceding frame — one
    shuffle on the key, linear in rows, the standard distributed as-of
    shape. At equal timestamps the right row sorts before the left row,
    so an exactly-simultaneous right row IS visible (ASOF ``>=``
    semantics). Right side must be unique per (keys, ts) — pre-dedup
    with :func:`latest_per_key` otherwise; the carried value at a
    duplicate timestamp would be whichever sorted last.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward/forward: {direction}")
    keys = list(on)
    # SQL join semantics: a NULL key matches nothing. The window
    # partition would otherwise group NULL-keyed left rows WITH
    # NULL-keyed right rows and carry their values; dropping
    # NULL-keyed right rows leaves those left rows unmatched (NULL
    # right columns), exactly like an equi join.
    for k in keys:
        right = right.filter(F.col(k).isNotNull())
    # A NULL right timestamp can never satisfy the asof comparison
    # (l.ts >= NULL is never true) — and under asc/NULLS FIRST it
    # would otherwise sort before everything and leak into every row.
    right = right.filter(F.col(right_ts).isNotNull())
    payload = [c for c in right.columns if c not in keys and c != right_ts]
    # The matched right row is carried as ONE struct: per-column
    # last(ignorenulls) would backfill a NULL field of the matched row
    # from an OLDER row, fabricating a mixed row that matches no real
    # right row (in training sets: point-in-time leakage of a stale
    # feature into a snapshot where it is legitimately NULL).
    r_struct = F.struct(
        *[F.col(c).alias(c) for c in payload],
        F.col(right_ts).alias("__ts"),
    )
    lhs = left.select(
        *[F.col(c) for c in left.columns],
        F.col(left_ts).alias("__asof_ts"),
        F.lit(1).alias("__is_left"),
        F.lit(None)
        .cast(right.select(r_struct.alias("r")).schema["r"].dataType)
        .alias("__r"),
    )
    rhs = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c not in keys],
        *[F.col(c) for c in keys],
        F.col(right_ts).alias("__asof_ts"),
        F.lit(0).alias("__is_left"),
        r_struct.alias("__r"),
    )
    merged = lhs.unionByName(rhs)
    # backward: ascending time, right-before-left on ties, carry last
    # seen right row forward; forward: descending time (same frame
    # carries the nearest at-or-after row instead).
    ts_order = (
        F.col("__asof_ts").asc()
        if direction == "backward"
        else F.col("__asof_ts").desc()
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(ts_order, F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # a NULL left timestamp matches nothing in either direction
    # (comparison semantics) — mask the carried struct for those rows
    carried_struct = F.when(
        F.col("__asof_ts").isNotNull(),
        F.last("__r", ignorenulls=True).over(w),
    )
    carried = [
        carried_struct[c].alias(c if c not in left.columns else f"{c}_right")
        for c in payload
    ]
    carried.append(
        carried_struct["__ts"].alias(
            right_ts if right_ts not in left.columns else f"{right_ts}_right"
        )
    )
    return (
        merged.select(*left.columns, "__is_left", *carried)
        .filter(F.col("__is_left") == 1)
        .drop("__is_left")
    )


def sessionize(
    df: DataFrame,
    gap_minutes: int = 30,
    key_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Assign a per-key ``session_id`` (1, 2, …) by gap-based
    sessionization: a session extends while the next event arrives
    strictly within ``gap_minutes`` of the previous one (half-open
    boundary — an event exactly at the gap starts a NEW session,
    matching ``F.session_window``'s [start, start+gap) semantics so
    the batch and streaming forms agree).

    The lag + cumulative-flag shape costs one shuffle on the key and
    two window passes over already-sorted partitions — the standard
    distributed sessionization; state per partition is one row.
    Timestamps are compared at second granularity (``unix_timestamp``
    truncates), the documented cross-engine parity choice."""
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    prev = F.lag(ts_col).over(w)
    gap_s = gap_minutes * 60
    new_s = F.when(
        prev.isNull()
        | (
            F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev)
            >= gap_s
        ),
        1,
    ).otherwise(0)
    sess_id = F.sum(new_s).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn("session_id", sess_id)


def scd2_history(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    state_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Build a slowly-changing-dimension type-2 history from a change
    log: one row per EFFECTIVE state change with ``[valid_from,
    valid_to)`` validity and an ``is_current`` flag — the point-in-time
    join target a feature store serves training labels against (the
    batch-build complement of the reference's last-writer upsert,
    `src/pipelines/batch_pipeline.py:222`; the as-of join in
    `asof_join` consumes exactly this shape).

    Consecutive records with an unchanged state are collapsed (a
    heartbeat re-emitting the same value must not fragment validity):
    a lag-compare keeps only change points, then lead() over the
    SURVIVORS closes each interval. Both windows hash on the key —
    ONE shuffle, two passes over sorted partitions, state = one row.
    Ordering is (ts, tiebreak) so same-timestamp flaps resolve
    deterministically; timestamps compare at native precision here
    (no cross-engine truncation — the operator itself is exact).
    State comparison is null-safe: NULL→value and value→NULL are
    change points, consecutive NULLs collapse like any repeat.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    # first-row detection via a lag'd constant marker, NOT
    # lag(state).isNull() — that would conflate "no previous row" with
    # "previous state was NULL"; the comparison itself is null-safe so
    # NULL→value and value→NULL transitions are real change points and
    # NULL→NULL heartbeats collapse like any other repeat
    first_row = F.lag(F.lit(True)).over(w).isNull()
    changed = first_row | ~F.lag(state_col).over(w).eqNullSafe(
        F.col(state_col)
    )
    points = df.select(
        key_col, ts_col, state_col, tiebreak_col
    ).withColumn("__chg", changed).filter("__chg")
    w2 = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    return points.select(
        F.col(key_col),
        F.col(state_col).alias("state"),
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w2).alias("valid_to"),
        F.lead(ts_col).over(w2).isNull().alias("is_current"),
    )


def scd2_history_oracle_sql(
    table: str,
    key_col: str,
    ts_col: str,
    state_col: str,
    tiebreak_col: str,
) -> str:
    return f"""
    WITH points AS (
      SELECT {key_col}, {ts_col}, {state_col}, {tiebreak_col}
      FROM (
        SELECT *,
               lag({state_col}) OVER win AS prev_state,
               lag(TRUE) OVER win IS NULL AS first_row
        FROM {table}
        WINDOW win AS (PARTITION BY {key_col}
                       ORDER BY {ts_col}, {tiebreak_col})
      )
      WHERE first_row OR prev_state IS DISTINCT FROM {state_col}
    )
    SELECT {key_col},
           {state_col} AS state,
           {ts_col} AS valid_from,
           lead({ts_col}) OVER w AS valid_to,
           lead({ts_col}) OVER w IS NULL AS is_current
    FROM points
    WINDOW w AS (PARTITION BY {key_col} ORDER BY {ts_col}, {tiebreak_col})
    """


def funnel(
    df: DataFrame,
    stages: Sequence[tuple[str, Column]],
    user_col: str = "user_id",
    ts_col: str = "ts",
    depth_col: str = "funnel_depth",
    max_gap: float | Sequence[float | None] | None = None,
) -> DataFrame:
    """N-stage ordered funnel conversion: per ``user_col``, the first
    event matching stage 1, then the first event matching stage k
    AT-OR-AFTER the stage-(k-1) timestamp — the stage-progression
    query behind every product-analytics funnel (and the label-
    construction step for conversion models). ``stages`` is an
    ordered list of (name, row-predicate Column) pairs; the output is
    one row per user with ``t_<name>`` per stage plus ``depth_col`` =
    the deepest stage reached (0 = none).

    ``max_gap`` adds a conversion window: stage k only counts within
    ``max_gap`` seconds of the stage-(k-1) anchor (a number applies to
    every transition; a sequence of len(stages)-1 values sets
    per-transition windows, None entries unbounded). Works for
    timestamp and numeric ``ts_col`` alike; the window changes only
    the per-row predicate — the plan shape (one Exchange) is
    unchanged.

    Plan shape: the sequential dependence (each stage anchors on the
    previous stage's timestamp) is expressed as N chained conditional
    window-mins over ONE user partitioning followed by the final
    group-by on the same key — a single Exchange, zero joins, zero
    re-scans of the events table. A join-per-stage formulation would
    re-shuffle the full events table N times; this shape is flat in
    stage count, which is what survives a 100× scale-up. (W10's
    3-stage driver row pins the fixed instance against exactly that
    join-per-stage oracle; `tests/test_operators.py` pins a 4-stage
    funnel against a join-per-stage model.)"""
    if len(stages) < 2:
        raise ValueError("funnel needs at least 2 stages")
    names = [n for n, _ in stages]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate stage names: {names!r}")
    clash = [n for n in names if f"t_{n}" in df.columns]
    if clash:
        # withColumn would silently REPLACE the user's column, and a
        # stage predicate referencing it would resolve to the anchor
        raise ValueError(
            f"funnel: input already has column(s) "
            f"{[f't_{n}' for n in clash]!r} — anchor names are "
            "reserved; rename the column or the stage"
        )
    if max_gap is None or isinstance(max_gap, (int, float)):
        gaps = [max_gap] * (len(stages) - 1)
    else:
        gaps = list(max_gap)
        if len(gaps) != len(stages) - 1:
            raise ValueError(
                f"max_gap needs one value per transition "
                f"({len(stages) - 1}), got {len(gaps)}"
            )
    is_ts = dict(df.dtypes)[ts_col].startswith("timestamp")
    w = Window.partitionBy(user_col)
    out = df
    prev: str | None = None
    for i, (name, pred) in enumerate(stages):
        if prev is None:
            cond = pred
        else:
            cond = pred & (F.col(ts_col) >= F.col(prev))
            gap = gaps[i - 1]
            if gap is not None:
                # make_interval, not an f-string INTERVAL literal:
                # floats that format in scientific notation (1e-07)
                # would produce an unparseable literal
                bound = (
                    F.col(prev)
                    + F.make_interval(secs=F.lit(float(gap)))
                    if is_ts
                    else F.col(prev) + F.lit(gap)
                )
                cond = cond & (F.col(ts_col) <= bound)
        out = out.withColumn(
            f"t_{name}",
            F.min(F.when(cond, F.col(ts_col))).over(w),
        )
        prev = f"t_{name}"
    firsts = [F.max(f"t_{n}").alias(f"t_{n}") for n in names]
    depth = F.lit(0)
    for i, n in enumerate(names):
        depth = F.when(
            F.max(f"t_{n}").isNotNull(), F.lit(i + 1)
        ).otherwise(depth)
    return out.groupBy(user_col).agg(
        *firsts, depth.cast("bigint").alias(depth_col)
    )
