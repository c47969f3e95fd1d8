"""Pretraining-corpus preparation operators (beyond-reference §2
extensions, SURVEY.md §2.12 family): the steps a large-scale
training-data pipeline runs AFTER per-document cleaning (llm/text.py)
and dedup (llm/dedup.py) and BEFORE tokenizer hand-off.

- **contamination_report**: train/eval n-gram-collision decontamination
  (the GPT-3/PaLM appendix recipe): any eval document sharing a long
  token n-gram with a training document is flagged, with the overlap
  evidence. Inverted-index join — never all-pairs.
- **repetition_stats**: Gopher/MassiveText repetition quality rules —
  top-unigram / top-bigram mass fraction, duplicate-trigram fraction —
  one tagged explode, one doc-keyed shuffle.
- **pii_scrub**: regex masking of emails / IPv4 / phone numbers with
  per-kind redaction counts. RE2-safe patterns (no lookaround) so the
  exact same regex runs in Spark (Java) and the DuckDB (RE2) oracle.
- **temperature_mixture**: per-source sampling quotas ∝ n_s^alpha
  (the multilingual/multi-domain temperature-sampling mix), realized
  deterministically by md5 rank within each source.
- **pack_token_budget**: fixed-order packing of documents into
  context-window chunks by cumulative token count (the streaming
  sequence-packing shape; documents are not split).

Everything is native column expressions + joins/windows — zero Python
UDFs; each operator ships a DuckDB oracle twin generated from the same
constants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from feature_store_spark.llm.text import (
    TOKEN_RE,
    shingles,
    shingles_oracle_sql,
    token_count,
    tokens,
)


def _kgram_expr(k: int) -> str:
    """Spark-SQL expression for the k-gram array over the ``__t``
    token column — the ONE definition shared by repetition_stats and
    dup_span_stats (hand-copies of the tokenizer/n-gram generators are
    exactly the drift contamination_oracle_sql warns against).

    Built as ``zip_with`` folds over k shifted ``slice`` views instead
    of a per-position ``slice(__t, i, k)`` + ``concat_ws`` (which
    allocates a k-element array PER GRAM): measured at sf≈1 the
    zip_with form is 3.4× faster for bigrams and 2.3× for trigrams,
    output verified element-identical."""
    if k == 1:
        return "__t"
    n = f"size(__t) - {k - 1}"
    acc = f"slice(__t, 1, {n})"
    for i in range(2, k + 1):
        acc = (
            f"zip_with({acc}, slice(__t, {i}, {n}), "
            "(a, b) -> concat(a, ' ', b))"
        )
    return f"CASE WHEN size(__t) >= {k} THEN {acc} ELSE array() END"

# ---------------------------------------------------------------------------
# Train/eval contamination (n-gram collision decontamination)
# ---------------------------------------------------------------------------


def contamination_report(
    train: DataFrame,
    eval_: DataFrame,
    n: int = 8,
    max_df: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per eval document: how many train documents share at least one
    token ``n``-gram with it, and the largest shared-n-gram count over
    any single train doc. Eval docs with no collision are reported with
    zeros (the all-clear certificate matters as much as the hits).

    Scale shape: both corpora shingle into (id, n-gram) postings; the
    join is an equi-join on the shingle — candidate-proportional, like
    the dedup inverted index (`ngram_jaccard_pairs`), never eval×train.
    ``max_df`` optionally drops n-grams appearing in more than that
    many TRAIN docs before the join; at 13-gram decontamination scale
    hub n-grams are boilerplate (licenses, headers) and a single one
    would otherwise fan out to millions of pairs. Dropping them trades
    recall on boilerplate-only overlap for a bounded join — the same
    trade public decontamination pipelines make; leave ``None`` to
    keep the check exact.
    """
    tr = shingles(train, n=n, id_col=id_col, text_col=text_col).select(
        F.col(id_col).alias("__train_id"), "shingle"
    )
    if max_df is not None:
        keep = (
            tr.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("__df"))
            .filter(F.col("__df") <= max_df)
        )
        tr = tr.join(keep.select("shingle"), "shingle")
    ev = shingles(eval_, n=n, id_col=id_col, text_col=text_col).select(
        F.col(id_col).alias("__eval_id"), "shingle"
    )
    hits = (
        ev.join(tr, "shingle")
        .groupBy("__eval_id", "__train_id")
        .agg(F.count(F.lit(1)).alias("__shared"))
        .groupBy("__eval_id")
        .agg(
            F.count(F.lit(1)).alias("n_contaminating_docs"),
            F.max("__shared").alias("max_shared_ngrams"),
        )
    )
    return (
        eval_.select(F.col(id_col).alias("eval_doc_id"))
        .join(hits, F.col("eval_doc_id") == F.col("__eval_id"), "left")
        .select(
            "eval_doc_id",
            F.coalesce("n_contaminating_docs", F.lit(0))
            .cast("bigint")
            .alias("n_contaminating_docs"),
            F.coalesce("max_shared_ngrams", F.lit(0))
            .cast("bigint")
            .alias("max_shared_ngrams"),
            (F.coalesce("n_contaminating_docs", F.lit(0)) > 0).alias(
                "contaminated"
            ),
        )
    )


def contamination_oracle_sql(
    table: str = "documents",
    eval_max_id: int = 100,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """Oracle for the fixture wiring: eval = doc_id < eval_max_id,
    train = the rest of the same table. The shingle CTE is the shared
    generator from llm/text.py — hand-copying it here would let a
    tokenizer change silently desynchronize this oracle from the Spark
    side."""
    sh = shingles_oracle_sql(table, n, id_col, text_col)
    return f"""
    WITH sh AS ({sh}),
    hits AS (
      SELECT e.{id_col} AS eval_id,
             count(*) AS n_contaminating_docs,
             max(shared) AS max_shared_ngrams
      FROM (
        SELECT e.{id_col}, t.{id_col} AS train_id, count(*) AS shared
        FROM (SELECT * FROM sh WHERE {id_col} < {eval_max_id}) e
        JOIN (SELECT * FROM sh WHERE {id_col} >= {eval_max_id}) t
          ON e.shingle = t.shingle
        GROUP BY 1, 2
      ) e({id_col}, train_id, shared)
      GROUP BY 1
    )
    SELECT d.{id_col} AS eval_doc_id,
           CAST(coalesce(h.n_contaminating_docs, 0) AS BIGINT)
             AS n_contaminating_docs,
           CAST(coalesce(h.max_shared_ngrams, 0) AS BIGINT)
             AS max_shared_ngrams,
           coalesce(h.n_contaminating_docs, 0) > 0 AS contaminated
    FROM {table} d LEFT JOIN hits h ON d.{id_col} = h.eval_id
    WHERE d.{id_col} < {eval_max_id}
    """


# ---------------------------------------------------------------------------
# Gopher-style repetition quality rules
# ---------------------------------------------------------------------------

TOP_BIGRAM_MAX = 0.18  # Gopher: reject if top 2-gram > 18% of bigrams
DUP_TRIGRAM_MAX = 0.30  # and if duplicate 3-grams > 30% of trigrams


def _mode_count_expr(arr: str) -> str:
    """Count of the most frequent element of a string array, as one
    linear fold: sort the array so equal elements are adjacent, then
    track the current run length and the best run in an ``aggregate``
    accumulator. Any total order works — sorting only has to group
    duplicates together — so binary UTF8 order vs the oracle's
    collation is irrelevant; the returned COUNT is an exact integer.
    Empty arrays fold to 0."""
    step = "IF(x <=> a.prev, a.run + 1L, 1L)"
    return (
        f"aggregate(array_sort({arr}), "
        "struct(CAST(NULL AS STRING) AS prev, 0L AS run, 0L AS best), "
        f"(a, x) -> struct(x AS prev, {step} AS run, "
        f"greatest(a.best, {step}) AS best), "
        "a -> a.best)"
    )


def repetition_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document repetition metrics (Gopher/MassiveText rules C4
    dropped): fraction of token mass in the single most frequent
    unigram / bigram, and the fraction of trigram occurrences that are
    repeats of an earlier trigram in the same document. ``repetitive``
    applies the published-style thresholds to the 2-/3-gram metrics.

    One scan, one raw-doc shuffle (plan-pinned): every metric is a
    per-row fold over the document's own gram arrays — the top-gram
    count is a run-length maximum over the sorted array
    (``_mode_count_expr``), the trigram dup fraction is ``size -
    size(array_distinct)`` — so after the folds the operator is a
    single narrow projection. The former shape exploded (doc, n, gram)
    rows — 3× token volume in duplicated gram strings through an
    exchange plus three aggregate stages; the folds keep the work
    O(tokens log tokens) inside one stage and shuffle only the raw
    (id, tokens) rows. That one doc-keyed repartition stays on
    purpose: gram folds are CPU-bound at ~10× the cost/byte a scan
    split is sized for (compressed text packs dense), so rebalancing
    compute off input-split granularity pays even on a cluster — and
    locally a single-row-group parquet file would otherwise pin the
    whole fold to one task. Docs with < 3 tokens keep a row with NULL
    ratios (size 0 arrays → 0 totals → NULL-guarded divisions).
    """
    # repartition the RAW text and tokenize after the exchange —
    # regexp tokenization is itself CPU-bound, so it must run at fold
    # width, not at scan-split width
    toks = (
        df.select(F.col(id_col), F.col(text_col))
        .repartition(F.col(id_col))
        .select(
            F.col(id_col),
            F.coalesce(tokens(F.col(text_col)), F.array()).alias("__t"),
        )
    )

    cells = toks.select(
        F.col(id_col),
        F.expr(_mode_count_expr("__t")).alias("__max1"),
        F.size("__t").cast("bigint").alias("__tot1"),
        F.expr(_mode_count_expr(_kgram_expr(2))).alias("__max2"),
        F.greatest(F.size("__t") - 1, F.lit(0))
        .cast("bigint")
        .alias("__tot2"),
        F.greatest(F.size("__t") - 2, F.lit(0))
        .cast("bigint")
        .alias("__tot3"),
        F.size(F.array_distinct(F.expr(_kgram_expr(3))))
        .cast("bigint")
        .alias("__dis3"),
    )

    def ratio(num, den):
        return F.round(num / F.when(den == 0, None).otherwise(den), 6)

    def nz(col, den):  # oracle NULLs the numerator when tot = 0
        return F.when(F.col(den) > 0, col)

    out = cells.select(
        id_col,
        F.col("__tot1").alias("n_tokens"),
        ratio(nz(F.col("__max1"), "__tot1"), F.col("__tot1")).alias(
            "top_unigram_frac"
        ),
        ratio(nz(F.col("__max2"), "__tot2"), F.col("__tot2")).alias(
            "top_bigram_frac"
        ),
        ratio(
            nz(F.col("__tot3") - F.col("__dis3"), "__tot3"), F.col("__tot3")
        ).alias("dup_trigram_frac"),
    )
    return out.withColumn(
        "repetitive",
        F.coalesce(
            (F.col("top_bigram_frac") > TOP_BIGRAM_MAX)
            | (F.col("dup_trigram_frac") > DUP_TRIGRAM_MAX),
            F.lit(False),
        ),
    )


def repetition_oracle_sql(
    table: str = "documents", id_col: str = "doc_id", text_col: str = "text"
) -> str:
    grams = []
    for k in (1, 2, 3):
        parts = " || ' ' || ".join(
            ["tok"] + [f"lead(tok, {i}) OVER w" for i in range(1, k)]
        )
        last = f"lead(tok, {k - 1}) OVER w" if k > 1 else "tok"
        grams.append(
            f"""SELECT {id_col}, {k} AS n, gram FROM (
              SELECT {id_col}, {parts} AS gram, {last} AS last_tok
              FROM tokpos WINDOW w AS (PARTITION BY {id_col} ORDER BY pos)
            ) g WHERE last_tok IS NOT NULL"""
        )
    grams_sql = "\n      UNION ALL ".join(grams)
    return f"""
    WITH tokpos AS (
      SELECT {id_col}, t[pos] AS tok, pos FROM (
        SELECT {id_col},
               regexp_extract_all(lower({text_col}), '{TOKEN_RE}') AS t
        FROM {table}
      ), unnest(range(1, len(t) + 1)) AS u(pos)
    ),
    tagged AS (
      {grams_sql}
    ),
    per_gram AS (
      SELECT {id_col}, n, gram, count(*) AS cnt
      FROM tagged GROUP BY 1, 2, 3
    ),
    per_size AS (
      SELECT {id_col}, n, max(cnt) AS mx, sum(cnt) AS tot,
             count(*) AS dis
      FROM per_gram GROUP BY 1, 2
    ),
    pivoted AS (
      SELECT {id_col},
             max(CASE WHEN n = 1 THEN mx END) AS max1,
             max(CASE WHEN n = 1 THEN tot END) AS tot1,
             max(CASE WHEN n = 2 THEN mx END) AS max2,
             max(CASE WHEN n = 2 THEN tot END) AS tot2,
             max(CASE WHEN n = 3 THEN tot END) AS tot3,
             max(CASE WHEN n = 3 THEN dis END) AS dis3
      FROM per_size GROUP BY 1
    )
    SELECT d.{id_col},
           CAST(coalesce(tot1, 0) AS BIGINT) AS n_tokens,
           round(max1 * 1.0 / NULLIF(tot1, 0), 6) AS top_unigram_frac,
           round(max2 * 1.0 / NULLIF(tot2, 0), 6) AS top_bigram_frac,
           round((tot3 - dis3) * 1.0 / NULLIF(tot3, 0), 6)
             AS dup_trigram_frac,
           coalesce(round(max2 * 1.0 / NULLIF(tot2, 0), 6)
                      > {TOP_BIGRAM_MAX}
                    OR round((tot3 - dis3) * 1.0 / NULLIF(tot3, 0), 6)
                      > {DUP_TRIGRAM_MAX}, FALSE) AS repetitive
    FROM {table} d LEFT JOIN pivoted p ON d.{id_col} = p.{id_col}
    """


# ---------------------------------------------------------------------------
# PII scrubbing (RE2-safe patterns — identical regex text on both engines)
# ---------------------------------------------------------------------------

PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    # (kind, regex, replacement) — applied in order; no lookaround
    # (DuckDB's RE2 has none), no backreferences.
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\+[0-9][0-9 -]{7,14}[0-9]", "<PHONE>"),
)


def pii_scrub(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Mask emails, IPv4 addresses, and international-format phone
    numbers, reporting per-kind redaction counts. Counts are taken on
    the text each pattern actually sees (patterns apply in declared
    order, so an email's digits can't double-count as a phone) —
    byte-identical semantics in the oracle, which applies the same
    regexes in the same order. Narrow projection: no shuffle, scales
    with corpus bytes; regex cost is per-row JVM work inside codegen.
    """
    out_cols = [F.col(id_col)]
    scrubbed = F.col(text_col)
    for kind, pat, repl in PII_PATTERNS:
        out_cols.append(
            F.regexp_count(scrubbed, F.lit(pat))
            .cast("bigint")
            .alias(f"n_{kind}")
        )
        scrubbed = F.regexp_replace(scrubbed, pat, repl)
    out_cols.append(scrubbed.alias("scrubbed_text"))
    return df.select(*out_cols)


def pii_scrub_oracle_sql(
    source_sql: str, id_col: str = "doc_id", text_col: str = "text"
) -> str:
    """Oracle over an arbitrary source subquery (the fixture corpus has
    no organic PII, so the registered query plants deterministic PII —
    the same planting SQL is passed here)."""
    counts = []
    scrubbed = text_col
    for kind, pat, repl in PII_PATTERNS:
        counts.append(
            f"CAST(length(regexp_extract_all({scrubbed}, '{pat}'))"
            f" AS BIGINT) AS n_{kind}"
        )
        scrubbed = f"regexp_replace({scrubbed}, '{pat}', '{repl}', 'g')"
    cols = ",\n           ".join(counts)
    return f"""
    SELECT {id_col},
           {cols},
           {scrubbed} AS scrubbed_text
    FROM ({source_sql})
    """


# ---------------------------------------------------------------------------
# Temperature-weighted domain mixture
# ---------------------------------------------------------------------------


def temperature_mixture(
    df: DataFrame,
    alpha: float = 0.5,
    budget: int = 1000,
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic temperature-sampled corpus mix: source ``s`` gets
    a quota of ``floor(budget * n_s^alpha / sum_s n_s^alpha)`` documents
    (alpha<1 flattens the source distribution — the standard
    multilingual/multi-domain temperature trick), and the quota is
    filled by the md5-smallest doc_ids within the source (a
    deterministic uniform sample, same device as o3/o6).

    Scale shape: per-source counts are a map-combined aggregate over
    the corpus (tiny result — one row per source); the quota table
    broadcasts back onto the corpus; the per-source rank is one window
    partitioned by source. A heavily skewed source distribution skews
    the window partition — at corpus scale rank within (source,
    md5-prefix bucket) and merge quotas per bucket.

    Quota arithmetic is exact past the one libm call: ``pow(n, alpha)``
    is quantized to fixed-point micros (the a19/a21 round-then-exact
    contract), the normalizer is a BIGINT sum of those micros (float
    summation is grouping-order-dependent — with every source at the
    same count the true quota sits exactly ON the floor boundary and
    a one-ulp wsum wobble flips it, which is how the sf0.1 fixture
    [20 sources x 250 docs] caught the float form), and the quota is
    a DECIMAL(38,0) product with integer `div` — so equal-weight
    sources get exactly ``budget/n_sources`` on every engine, every
    partitioning.
    """
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("__n"))
    w_micros = (
        F.round(F.pow(F.col("__n"), F.lit(alpha)) * 1_000_000)
        .cast("bigint")
        .alias("__w")
    )
    weighted = counts.select(F.col(source_col), F.col("__n"), w_micros)
    wsum = weighted.agg(F.sum("__w").alias("__wsum"))
    quota = (
        weighted.crossJoin(F.broadcast(wsum))
        .select(
            source_col,
            F.col("__n"),
            F.expr(
                f"(CAST({budget} AS DECIMAL(38,0)) * __w) div __wsum"
            ).alias("quota"),
        )
    )
    w = Window.partitionBy(source_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    ranked = df.select(F.col(id_col), F.col(source_col)).withColumn(
        "__rk", F.row_number().over(w)
    )
    return (
        ranked.join(F.broadcast(quota), source_col)
        .filter(F.col("__rk") <= F.col("quota"))
        .select(
            id_col,
            source_col,
            F.col("__rk").cast("bigint").alias("sample_rank"),
            F.col("quota"),
        )
    )


def temperature_mixture_oracle_sql(
    table: str = "documents",
    alpha: float = 0.5,
    budget: int = 1000,
    source_col: str = "source",
    id_col: str = "doc_id",
) -> str:
    return f"""
    WITH counts AS (
      SELECT {source_col}, count(*) AS n FROM {table} GROUP BY 1
    ),
    weighted AS (
      SELECT {source_col}, n,
             CAST(round(pow(n, {alpha}) * 1000000) AS BIGINT) AS w
      FROM counts
    ),
    quota AS (
      SELECT {source_col},
             CAST(({budget}::HUGEINT * w)
                  // (SELECT sum(w) FROM weighted) AS BIGINT) AS quota
      FROM weighted
    ),
    ranked AS (
      SELECT {id_col}, {source_col},
             row_number() OVER (
               PARTITION BY {source_col}
               ORDER BY md5(CAST({id_col} AS VARCHAR)), {id_col}
             ) AS rk
      FROM {table}
    )
    SELECT r.{id_col}, r.{source_col},
           CAST(r.rk AS BIGINT) AS sample_rank, q.quota
    FROM ranked r JOIN quota q ON r.{source_col} = q.{source_col}
    WHERE r.rk <= q.quota
    """


# ---------------------------------------------------------------------------
# Fixed-order token-budget packing
# ---------------------------------------------------------------------------


def pack_token_budget(
    df: DataFrame,
    budget: int = 2048,
    source_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Assign documents to context-window chunks per source: documents
    are taken in ``id`` order and a document starts a new chunk when
    the running token total would exceed ``budget`` more often than
    crossing one boundary (fixed-order packing — documents are never
    split, so a chunk can overflow by at most one document's tail;
    ``chunk_id = floor(cum_tokens_before / budget)``, the streaming
    packer's assignment).

    Scale shape: one tokenize projection, then a single running-sum
    window partitioned by source — the partition is the unit of
    sequential packing, matching how corpus shards are packed
    per-source/per-shard in practice (a global pack order would
    serialize the whole corpus through one partition; if needed, pack
    per (source, shard) and renumber chunks by prefix sums).
    """
    w = (
        Window.partitionBy(source_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    toks = df.select(
        F.col(id_col),
        F.col(source_col),
        token_count(F.col(text_col)).cast("bigint").alias("n_tokens"),
    )
    cum_before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return toks.select(
        id_col,
        source_col,
        "n_tokens",
        F.floor(cum_before / budget).cast("bigint").alias("chunk_id"),
        (cum_before % budget).cast("bigint").alias("chunk_offset"),
    )


def pack_token_budget_oracle_sql(
    table: str = "documents",
    budget: int = 2048,
    source_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    return f"""
    WITH toks AS (
      SELECT {id_col}, {source_col},
             CAST(len(regexp_extract_all(lower({text_col}), '{TOKEN_RE}'))
               AS BIGINT) AS n_tokens
      FROM {table}
    )
    SELECT {id_col}, {source_col}, n_tokens,
           CAST(floor(coalesce(sum(n_tokens) OVER (
                  PARTITION BY {source_col} ORDER BY {id_col}
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                ), 0) / {budget}) AS BIGINT) AS chunk_id,
           CAST(coalesce(sum(n_tokens) OVER (
                  PARTITION BY {source_col} ORDER BY {id_col}
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                ), 0) % {budget} AS BIGINT) AS chunk_offset
    FROM toks
    """


# ---------------------------------------------------------------------------
# Substring-level duplicate spans (exact-substring dedup statistics)
# ---------------------------------------------------------------------------


def dup_span_stats(
    df: DataFrame,
    k: int = 5,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    hashed: bool = True,
) -> DataFrame:
    """Per-document duplicated-substring statistics, the signal behind
    exact-substring training-data dedup (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better"): a token ``k``-gram
    window is *duplicated* when the identical k-gram occurs at least
    ``min_count`` times corpus-wide (including within one document —
    self-repetition is duplication too). Reports, per document:

    - ``n_tokens`` / ``n_windows`` (= max(n_tokens - k + 1, 0)),
    - ``n_dup_windows`` and ``dup_window_frac``,
    - ``dup_token_frac``: fraction of the document's TOKENS covered by
      at least one duplicated window — the interval-union length of the
      [pos, pos+k-1] spans, i.e. how much of the doc an exact-substring
      cut would remove.

    Scale shape (the suffix-array step re-expressed relationally): one
    tokenize projection behind the `shingles` collapse barrier, then a
    single posting stream (id, pos, gram-key) that is shuffled ONCE on
    the gram key for a count-over-partition window (vs groupBy+join,
    which would shuffle the full posting stream twice), filtered down
    to duplicated starts (candidate-proportional from here on), and
    shuffled back to the document for the lag-window interval union —
    whose Exchange(id) the final aggregate AND the spine join both
    reuse. ``hashed=True`` ships 8-byte xxhash64 gram keys instead of
    the gram bytes through the big shuffle (vs ~6·k bytes; a 64-bit
    collision at corpus scale only upgrades a unique gram to
    "duplicated" — acceptable for a statistic that feeds a filter) —
    and never materializes the k-gram STRINGS at all: each token is
    hashed once, and a gram key is xxhash64 over the k-long slice of
    the token-hash array (measured ~30% off the posting-build stage at
    sf0.1 vs concat_ws string grams; the spread grows with k — string
    grams cost O(k·token_len) bytes per window, the hash chain O(k)
    longs). Hot-gram skew is
    bounded: the per-gram partition holds only (id, pos) pairs and the
    window computes one count, no pairing. The oracle counts raw gram
    strings (DuckDB has no xxhash64); identical output modulo the
    collision probability (~n²/2⁶⁵).
    """
    tok_col = tokens(F.col(text_col))
    if hashed:
        # hash each token ONCE; a gram key is then a hash over k longs
        tok_col = F.transform(tok_col, lambda t: F.xxhash64(t))
    toks = df.select(
        F.col(id_col),
        tok_col.alias("__t"),
    ).repartition(F.col(id_col))

    if hashed:
        gram_arr = (
            f"CASE WHEN size(__t) >= {k} THEN"
            f" transform(sequence(1, size(__t) - {k - 1}),"
            f" i -> xxhash64(slice(__t, i, {k})))"
            " ELSE array() END"
        )
    else:
        gram_arr = _kgram_expr(k)
    starts = toks.select(
        F.col(id_col),
        F.posexplode(F.expr(gram_arr)).alias("__pos0", "__g"),
    ).select(
        id_col,
        (F.col("__pos0") + 1).alias("__pos"),
        "__g",
    )

    cnt = F.count(F.lit(1)).over(Window.partitionBy("__g"))
    dup = (
        starts.withColumn("__cnt", cnt)
        .filter(F.col("__cnt") >= min_count)
        .select(id_col, "__pos")
    )

    w_doc = Window.partitionBy(id_col).orderBy("__pos")
    prev = F.lag("__pos").over(w_doc)
    covered = F.when(prev.isNull(), F.lit(k)).otherwise(
        F.least(F.lit(k), F.col("__pos") - prev)
    )
    per_doc = (
        dup.withColumn("__cov", covered)
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_dup_windows"),
            F.sum("__cov").alias("__dup_tokens"),
        )
    )

    spine = toks.select(
        F.col(id_col),
        F.size("__t").cast("bigint").alias("n_tokens"),
        F.greatest(F.size("__t") - (k - 1), F.lit(0))
        .cast("bigint")
        .alias("n_windows"),
    )
    nw = F.col("n_windows")
    nt = F.col("n_tokens")
    return spine.join(per_doc, id_col, "left").select(
        id_col,
        "n_tokens",
        "n_windows",
        F.coalesce("n_dup_windows", F.lit(0)).cast("bigint").alias(
            "n_dup_windows"
        ),
        F.round(
            F.coalesce("n_dup_windows", F.lit(0))
            / F.when(nw == 0, None).otherwise(nw),
            6,
        ).alias("dup_window_frac"),
        F.round(
            F.coalesce("__dup_tokens", F.lit(0))
            / F.when(nt == 0, None).otherwise(nt),
            6,
        ).alias("dup_token_frac"),
    )


def dup_span_oracle_sql(
    table: str = "documents",
    k: int = 5,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin on raw gram strings (same counts as the xxhash64
    path modulo 64-bit collisions). ``range`` is exclusive-end and
    REFUSES a start > stop (unlike Spark's counting-down sequence), so
    the window count is guarded with greatest(, 1)."""
    return f"""
    WITH toks AS (
      SELECT {id_col},
             regexp_extract_all(lower({text_col}), '{TOKEN_RE}') AS t
      FROM {table}
    ),
    starts AS (
      SELECT {id_col}, pos,
             array_to_string(t[pos : pos + {k - 1}], ' ') AS gram
      FROM toks, unnest(range(1, greatest(len(t) - {k - 2}, 1))) AS u(pos)
    ),
    dup AS (
      SELECT {id_col}, pos FROM (
        SELECT {id_col}, pos,
               count(*) OVER (PARTITION BY gram) AS cnt
        FROM starts
      ) WHERE cnt >= {min_count}
    ),
    per_doc AS (
      SELECT {id_col},
             CAST(count(*) AS BIGINT) AS n_dup_windows,
             CAST(sum(CASE WHEN prev IS NULL THEN {k}
                           ELSE least({k}, pos - prev) END) AS BIGINT)
               AS dup_tokens
      FROM (
        SELECT {id_col}, pos,
               lag(pos) OVER (PARTITION BY {id_col} ORDER BY pos) AS prev
        FROM dup
      )
      GROUP BY {id_col}
    )
    SELECT s.{id_col},
           CAST(len(t) AS BIGINT) AS n_tokens,
           CAST(greatest(len(t) - {k - 1}, 0) AS BIGINT) AS n_windows,
           CAST(coalesce(n_dup_windows, 0) AS BIGINT) AS n_dup_windows,
           round(coalesce(n_dup_windows, 0) * 1.0
                 / nullif(greatest(len(t) - {k - 1}, 0), 0), 6)
             AS dup_window_frac,
           round(coalesce(dup_tokens, 0) * 1.0
                 / nullif(len(t), 0), 6) AS dup_token_frac
    FROM toks s LEFT JOIN per_doc p USING ({id_col})
    """


# ---------------------------------------------------------------------------
# Sliding-window document chunking (context-window splitting)
# ---------------------------------------------------------------------------


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 256,
    overlap: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split each document into ``chunk_tokens``-token windows with
    ``overlap`` tokens of context carried between consecutive chunks —
    the complement of :func:`pack_token_budget` (which never splits a
    document): packing assembles SHORT docs into a context window,
    chunking cuts LONG docs down to one. Emits (id, chunk_idx,
    n_tokens, chunk_text); the final chunk keeps its natural shorter
    length, and a document shorter than one window yields exactly one
    chunk (empty docs yield one empty chunk — the row is preserved,
    matching the curation pipelines' keep-the-spine discipline).

    Stride is ``chunk_tokens - overlap`` (must be positive). One
    tokenize projection behind the standard collapse barrier, then a
    per-row lambda explode — no shuffle beyond the barrier, output
    rows ∝ total tokens / stride.
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    stride = chunk_tokens - overlap
    toks = df.select(
        F.col(id_col),
        # NULL text normalizes to an empty token array so the doc still
        # yields its one empty chunk — keep-the-spine applies to NULL
        # docs exactly like empty ones (oracle side mirrors this)
        F.coalesce(
            tokens(F.col(text_col)), F.array().cast("array<string>")
        ).alias("__t"),
    ).repartition(F.col(id_col))
    # number of chunks = 1 + ceil(max(n - chunk, 0) / stride)
    n_chunks = F.expr(
        f"1 + cast(ceil(greatest(size(__t) - {chunk_tokens}, 0)"
        f" / {stride}.0) as int)"
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.slice(F.col("__t"), i * stride + 1, chunk_tokens),
    )
    exploded = toks.select(
        F.col(id_col),
        F.posexplode(chunks).alias("chunk_idx", "__c"),
    )
    return exploded.select(
        id_col,
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.size("__c").cast("bigint").alias("n_tokens"),
        F.array_join(F.col("__c"), " ").alias("chunk_text"),
    )


def chunk_documents_oracle_sql(
    table: str = "documents",
    chunk_tokens: int = 256,
    overlap: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    stride = chunk_tokens - overlap
    return f"""
    WITH toks AS (
      SELECT {id_col},
             COALESCE(regexp_extract_all(lower({text_col}), '{TOKEN_RE}'),
                      CAST([] AS VARCHAR[])) AS t
      FROM {table}
    )
    SELECT {id_col},
           CAST(i AS INT) AS chunk_idx,
           CAST(len(t[i * {stride} + 1 : i * {stride} + {chunk_tokens}])
             AS BIGINT) AS n_tokens,
           COALESCE(array_to_string(
             t[i * {stride} + 1 : i * {stride} + {chunk_tokens}], ' '), '')
             AS chunk_text
    FROM toks,
         unnest(range(0, 1 + CAST(ceil(greatest(len(t) - {chunk_tokens}, 0)
                                       / {stride}.0) AS BIGINT))) AS u(i)
    """
