"""Sampling operators (beyond the reference's ORDER BY RANDOM()
validation sample, `sql/migration_queries.sql:117-121` / O3).

Training-data curation needs per-stratum rates (e.g., downsample the
dominant language, keep all of a rare source). Engine randomness
(``F.rand``/``sampleBy``) streams differ per engine, partitioning, and
run — useless for differential testing and for reproducible dataset
builds. Sampling here is a pure hash function of the row key: the
same row set comes out on any engine, any cluster size, any run.
``_hash_expr`` / ``_nibble_sql`` are the single definition of that
hash — Spark and DuckDB sides of every sampler derive from them, so
composed operators subsample from one consistent stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

HASH_SCALE = 1_000_000


def _hash_expr(key_col: str) -> str:
    """60-bit md5 prefix folded to [0, HASH_SCALE) — the shared
    deterministic-uniform primitive (Spark SQL form)."""
    return (
        f"pmod(cast(conv(substring(md5(cast({key_col} as string)), 1, 15),"
        f" 16, 10) as bigint), {HASH_SCALE})"
    )


def _nibble_sql(key_col: str) -> str:
    """DuckDB twin of ``_hash_expr``: the same 60-bit md5 prefix as an
    explicit nibble sum (DuckDB has no conv()), pre-modulo."""
    return " + ".join(
        f"(strpos('0123456789abcdef', substr(md5(CAST({key_col} AS VARCHAR)),"
        f" {j + 1}, 1)) - 1) * {16 ** (14 - j)}"
        for j in range(15)
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    key_col: str,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Keep each row iff md5-hash(key) mod 1e6 falls under its
    stratum's threshold — deterministic per-stratum Bernoulli sampling
    keyed on the row id (a row's fate never depends on partitioning or
    engine RNG). Strata not listed in ``fractions`` use
    ``default_fraction``.

    Narrow filter, no shuffle; pushdown-safe columns on either side of
    it still prune. Thresholds are integers (round(frac · 1e6)) so the
    predicate is integer-exact across engines.
    """
    h = F.expr(_hash_expr(key_col))
    threshold = F.lit(int(round(default_fraction * HASH_SCALE)))
    for stratum, frac in sorted(fractions.items()):
        threshold = F.when(
            F.col(strata_col) == stratum,
            F.lit(int(round(frac * HASH_SCALE))),
        ).otherwise(threshold)
    return df.filter(h < threshold)


def stratified_sample_oracle_sql(
    table: str,
    strata_col: str,
    fractions: dict[str, float],
    key_col: str,
    default_fraction: float = 0.0,
) -> str:
    """DuckDB twin: same hash via ``_nibble_sql``, same integer
    thresholds."""
    cases = " ".join(
        f"WHEN '{stratum}' THEN {int(round(frac * HASH_SCALE))}"
        for stratum, frac in sorted(fractions.items())
    )
    return f"""
    SELECT * FROM {table}
    WHERE ({_nibble_sql(key_col)}) % {HASH_SCALE}
          < (CASE {strata_col} {cases}
             ELSE {int(round(default_fraction * HASH_SCALE))} END)
    """


def priority_sample(
    df: DataFrame, key_col: str, weight_col: str, k: int
) -> DataFrame:
    """Weighted sample of ``k`` rows WITHOUT replacement by priority
    sampling (Duffield, Lund & Thorup, JACM 2007): each row gets
    priority ``w / u`` with ``u`` uniform in (0, 1]; the ``k`` largest
    priorities are the sample, and ``est_weight = max(w, tau)`` (tau =
    the (k+1)-th priority) makes any subset-sum unbiasedly estimable
    from the sample alone — the right primitive for "give me 10k
    documents weighted by length, with reweighting factors" corpus
    draws. If the input has ≤ k rows the whole input is the sample and
    ``est_weight = w`` exactly.

    Determinism & cross-engine exactness: ``u = (h+1)/HASH_SCALE``
    with ``h`` the md5-derived integer — so ``priority = w ·
    HASH_SCALE / (h+1)``, one multiply of exactly-representable
    integers and one correctly-rounded IEEE division: bit-identical in
    any engine, no RNG stream, no transcendental calls (ln/pow of the
    classic Efraimidis–Spirakis key would be libm-dependent). Ties
    (identical priorities) break on the key.

    Scale shape: global top-(k+1) compiles to TakeOrderedAndProject —
    per-partition heaps merged on the driver, no global sort, no
    shuffle of the losers. The window pass afterwards runs on k+1
    rows. Rows with non-positive or NULL weight are excluded (zero
    weight means "never sample" in the estimator).
    """
    pri = (
        F.col(weight_col).cast("double")
        * HASH_SCALE
        / (F.expr(_hash_expr(key_col)) + F.lit(1))
    )
    top = (
        df.filter(F.col(weight_col) > 0)
        .select(
            F.col(key_col),
            F.col(weight_col).cast("double").alias("weight"),
            pri.alias("priority"),
        )
        .orderBy(F.desc("priority"), F.asc(key_col))
        .limit(k + 1)
    )
    w_all = Window.orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w_rank = Window.orderBy(F.desc("priority"), F.asc(key_col))
    ranked = top.select(
        key_col,
        "weight",
        "priority",
        F.row_number().over(w_rank).alias("sample_rank"),
        F.count(F.lit(1)).over(w_all).alias("__n"),
        F.min("priority").over(w_all).alias("__tau"),
    )
    return ranked.filter(F.col("sample_rank") <= k).select(
        key_col,
        "weight",
        "priority",
        "sample_rank",
        F.when(F.col("__n") <= k, F.col("weight"))
        .otherwise(F.greatest(F.col("weight"), F.col("__tau")))
        .alias("est_weight"),
    )


def priority_sample_oracle_sql(
    table: str, key_col: str, weight_col: str, k: int
) -> str:
    """DuckDB twin: same hash via ``_nibble_sql``, same exact
    arithmetic, same (priority DESC, key ASC) order and k+1 cutoff."""
    return f"""
    WITH top AS (
      SELECT {key_col},
             CAST({weight_col} AS DOUBLE) AS weight,
             CAST({weight_col} AS DOUBLE) * {HASH_SCALE}
               / ((({_nibble_sql(key_col)}) % {HASH_SCALE}) + 1) AS priority
      FROM {table}
      WHERE {weight_col} > 0
      ORDER BY priority DESC, {key_col} ASC
      LIMIT {k + 1}
    ),
    ranked AS (
      SELECT *,
             row_number() OVER (ORDER BY priority DESC, {key_col} ASC)
               AS sample_rank,
             count(*) OVER () AS n,
             min(priority) OVER () AS tau
      FROM top
    )
    SELECT {key_col}, weight, priority, CAST(sample_rank AS INT) AS sample_rank,
           CASE WHEN n <= {k} THEN weight
                ELSE greatest(weight, tau) END AS est_weight
    FROM ranked WHERE sample_rank <= {k}
    """


def dataset_split(
    df: DataFrame,
    key_col: str,
    fractions: tuple[tuple[str, float], ...] = (
        ("train", 0.9),
        ("val", 0.05),
        ("test", 0.05),
    ),
) -> DataFrame:
    """Deterministic train/val/test assignment — the split step every
    training-data pipeline runs before packing. Each row's split is a
    pure hash of its key (salted with 'ds|' so the split stream is
    independent of the sampling stream): same assignment on any
    engine, any cluster size, any run, and STABLE under corpus growth
    (adding documents never reassigns existing ones — the property
    engine-RNG `randomSplit` cannot give and that train/test
    contamination audits depend on).

    Scale shape: one narrow projection, no shuffle; the split column
    is a partition-friendly write key (`partitionBy("split")`).
    """
    total = sum(f for _, f in fractions)
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    if len(fractions) < 2:
        raise ValueError("need at least two splits")
    salted = f"concat('ds|', cast({key_col} as string))"
    h = F.expr(_hash_expr(salted))
    chain = None
    cum = 0.0
    for name, frac in fractions[:-1]:
        cum += frac
        cond = h < int(round(cum * HASH_SCALE))
        chain = (
            F.when(cond, name) if chain is None else chain.when(cond, name)
        )
    split = chain.otherwise(fractions[-1][0])
    return df.withColumn("split", split)


def dataset_split_oracle_sql(
    table: str,
    key_col: str,
    fractions: tuple[tuple[str, float], ...] = (
        ("train", 0.9),
        ("val", 0.05),
        ("test", 0.05),
    ),
    select_cols: str = "* EXCLUDE (__h)",
) -> str:
    """DuckDB twin: same salted 60-bit md5 hash, same integer
    cumulative thresholds. The default projection EXCLUDEs the
    internal ``__h`` hash column so the output matches the operator's
    (original columns, split) schema."""
    salted = f"concat('ds|', CAST({key_col} AS VARCHAR))"
    cases = []
    cum = 0.0
    for name, frac in fractions[:-1]:
        cum += frac
        cases.append(
            f"WHEN __h < {int(round(cum * HASH_SCALE))} THEN '{name}'"
        )
    case_sql = " ".join(cases)
    return f"""
    SELECT {select_cols},
           CASE {case_sql} ELSE '{fractions[-1][0]}' END AS split
    FROM (
      SELECT *, ({_nibble_sql(salted)}) % {HASH_SCALE} AS __h
      FROM {table}
    ) t
    """


def _hash60_expr(key_sql: str) -> str:
    """Pre-modulo 60-bit md5 prefix (Spark SQL form) — the same
    primitive as ``_hash_expr`` with the range reduction left to the
    caller (negative sampling reduces mod the CATALOG size, a runtime
    column, not the fixed ``HASH_SCALE``)."""
    return (
        f"cast(conv(substring(md5({key_sql}), 1, 15), 16, 10) as bigint)"
    )


def negative_samples(
    users: DataFrame,
    items: DataFrame,
    k: int,
    user_col: str = "user_id",
    item_col: str = "item_id",
    positives: DataFrame | None = None,
    seed: int = 7,
    broadcast_catalog: bool = True,
) -> DataFrame:
    """Deterministic negative sampling for contrastive / two-tower
    training: ``k`` pseudo-random catalog items per user — slot ``s``
    of user ``u`` draws item index md5(u|s|seed) mod |catalog|, so the
    sample is reproducible on any engine/partitioning and stable
    under re-runs (the md5-uniform rule every sampler here follows).
    Draws are with replacement across slots; rows colliding with
    ``positives`` (user, item) pairs are dropped, so callers needing
    exactly-k oversample slots and re-cut.

    Scale shape: the catalog gets a dense index from ONE global
    row_number window — a dimension-sided sort (items are the small
    side of every real two-tower setup; the user side never sorts).
    Slots explode users ×k (narrow rows), join the indexed catalog on
    the computed index, and the positives check is a left-anti join
    on (user, item) — the only fact-sized shuffle, and skippable when
    ``positives`` is None. ``broadcast_catalog`` pins the index join
    to a broadcast (the windowed subtree has no size estimate, so the
    static planner won't pick it alone); set it False for a catalog
    too big for the driver — the join falls back to a shuffle on the
    index, still never a cross product.
    """
    if k < 1:
        raise ValueError("negative_samples: k must be >= 1")
    idx = F.row_number().over(Window.orderBy(item_col)) - 1
    items_idx = items.select(
        F.col(item_col), idx.alias("__idx").cast("bigint")
    )
    n_items = items_idx.agg(
        F.count(F.lit(1)).cast("bigint").alias("__n")
    )
    key_sql = (
        f"concat(cast({user_col} as string), '|', "
        f"cast(__slot as string), '|', '{seed}')"
    )
    slots = (
        users.select(user_col)
        .distinct()
        .select(
            user_col,
            F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("__slot"),
        )
        .crossJoin(F.broadcast(n_items))
        .select(
            user_col,
            F.col("__slot").alias("slot"),
            # Empty-catalog guard: pmod(h, 0) raises an opaque
            # DIVIDE_BY_ZERO under ANSI mode, while the DuckDB twin's
            # `% n` yields NULL and returns no rows. Short-circuit the
            # index to NULL so an empty catalog yields an empty result
            # on BOTH engines regardless of plan shape (AQE's
            # empty-relation propagation already empties the join when
            # it fires, but a non-propagated plan would still evaluate
            # this projection). Rides the existing 1-row broadcast —
            # no extra driver-side count job.
            F.expr(
                "CASE WHEN __n = 0 THEN CAST(NULL AS BIGINT) ELSE "
                f"pmod({_hash60_expr(key_sql)}, __n) END"
            ).alias("__idx"),
        )
    )
    catalog = F.broadcast(items_idx) if broadcast_catalog else items_idx
    out = slots.join(catalog, "__idx").select(user_col, "slot", item_col)
    if positives is not None:
        out = out.join(
            positives.select(user_col, item_col).distinct(),
            [user_col, item_col],
            "left_anti",
        )
    return out


def negative_samples_oracle_sql(
    users_sql: str,
    items_sql: str,
    k: int,
    user_col: str = "user_id",
    item_col: str = "item_id",
    positives_sql: str | None = None,
    seed: int = 7,
) -> str:
    """DuckDB twin: same dense catalog index, same 60-bit md5 slot
    draw (nibble-sum form — DuckDB has no conv), same anti-join."""
    key_sql = (
        f"CAST({user_col} AS VARCHAR) || '|' || "
        f"CAST(slot AS VARCHAR) || '|' || '{seed}'"
    )
    anti = ""
    if positives_sql is not None:
        anti = f"""
    WHERE NOT EXISTS (
      SELECT 1 FROM ({positives_sql}) p
      WHERE p.{user_col} = s.{user_col} AND p.{item_col} = s.{item_col})"""
    return f"""
    WITH items_idx AS (
      SELECT {item_col},
             row_number() OVER (ORDER BY {item_col}) - 1 AS idx
      FROM ({items_sql})
    ),
    n AS (SELECT count(*) AS n FROM items_idx),
    slots AS (
      SELECT u.{user_col}, s.slot,
             ({_nibble_sql_raw(key_sql)}) % n.n AS idx
      FROM (SELECT DISTINCT {user_col} FROM ({users_sql})) u
      CROSS JOIN (SELECT unnest(range({k})) AS slot) s
      CROSS JOIN n
    ),
    sampled AS (
      SELECT s.{user_col}, s.slot, i.{item_col}
      FROM slots s JOIN items_idx i USING (idx)
    )
    SELECT {user_col}, slot, {item_col} FROM sampled s{anti}
    """


def _nibble_sql_raw(key_sql: str) -> str:
    """``_nibble_sql`` over an arbitrary VARCHAR expression (the
    shared 60-bit md5 prefix, pre-modulo)."""
    return " + ".join(
        f"(strpos('0123456789abcdef', substr(md5({key_sql}),"
        f" {j + 1}, 1)) - 1) * {16 ** (14 - j)}"
        for j in range(15)
    )
