"""End-to-end corpus curation: the composite training-data pipeline
the individual `llm/` operators exist for, in the order a production
corpus build runs them — cheap gates first, expensive dedup last, on
the smallest surviving set.

    language gate  →  quality gate  →  near-dup canonical cut
                   →  per-language document/token budget

Mirrors the curation recipes of public LLM-data pipelines (C4,
Gopher/MassiveText, RefinedWeb): heuristic language ID, quality
heuristics, then near-duplicate removal, reported as corpus-level
budget numbers. Extends the reference's data-quality surface
(`src/pipelines/data_quality.py:120-324` — per-table completeness /
anomaly gates) to document corpora.

Scale shape: the two gates are narrow projections (no shuffle, full
pushdown); SimHash clustering — the only iterative/shuffling stage —
sees only gated survivors. All stages are JVM column expressions;
the final budget is one partial-aggregated shuffle on
(language, canonical doc).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from feature_store_spark.llm.dedup import (
    near_dup_clusters,
    simhash_near_dup_oracle_sql,
)
from feature_store_spark.llm.text import (
    language_id_oracle_sql,
    language_pred_from_scores,
    language_scores,
    quality_flag_exprs,
    quality_score_oracle_sql,
    text_stats_oracle_sql,
    tokens,
)


def curate_corpus(
    df: DataFrame,
    quality_min: float = 0.8,
    max_hamming: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Run the full curation pipeline and report the per-language
    training budget: canonical (near-dup-free) document count, count
    of near-duplicates removed, and total token budget.

    Canonical cut: within each SimHash near-dup cluster the smallest
    ``doc_id`` survives (``doc_id == cluster_id``) — deterministic,
    engine-independent.
    """
    # Both gates plus the token count are narrow column expressions —
    # no gate joins. Layered behind rand barriers (round 10): the
    # language scores and quality flags reach the token array through
    # interpreted lambda filters, which whole-stage codegen CSE never
    # sees, so a single collapsed projection re-ran the tokenize
    # regex once per score reference (the argmax chain references
    # each language score ~3×). Layer 1 tokenizes once; layer 2
    # scores each language once and computes the flags; layer 3 runs
    # the argmax over plain score columns and gates.
    text = F.col(text_col)
    tokenized = df.select(
        id_col,
        text_col,
        tokens(text).alias("__tok"),
        F.rand(7).alias("__barrier"),
    )
    scores = language_scores(tok_col=F.col("__tok"))
    scored = tokenized.select(
        id_col,
        text_col,
        *[
            scores[lang].cast("bigint").alias(f"__score_{lang}")
            for lang in sorted(scores)
        ],
        quality_flag_exprs(text, tok_col=F.col("__tok"))[
            "quality_score"
        ].alias("quality_score"),
        F.size("__tok").cast("bigint").alias("n_tokens"),
        F.rand(11).alias("__barrier2"),
    )
    score_cols = {
        lang: F.col(f"__score_{lang}") for lang in sorted(scores)
    }
    kept = scored.select(
        id_col,
        text_col,
        language_pred_from_scores(score_cols).alias("predicted_lang"),
        "quality_score",
        "n_tokens",
    ).filter(
        (F.col("quality_score") >= quality_min)
        & (F.col("predicted_lang") != "und")
    )
    clusters = near_dup_clusters(
        kept.select(id_col, text_col),
        max_hamming=max_hamming,
        id_col=id_col,
        text_col=text_col,
    )
    # Drop the document text BEFORE the cluster join: only the narrow
    # (id, lang, n_tokens) rows shuffle.
    return (
        kept.drop(text_col)
        .join(clusters, id_col)
        .groupBy(F.col("predicted_lang").alias("lang"))
        .agg(
            F.count(F.when(F.col(id_col) == F.col("cluster_id"), 1)).alias(
                "kept_docs"
            ),
            F.count(F.when(F.col(id_col) != F.col("cluster_id"), 1)).alias(
                "near_dups_removed"
            ),
            F.sum(
                F.when(
                    F.col(id_col) == F.col("cluster_id"), F.col("n_tokens")
                )
            )
            .cast("bigint")
            .alias("total_tokens"),
        )
    )


def curate_corpus_oracle_sql(
    table: str = "documents",
    quality_min: float = 0.8,
    max_hamming: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """Same pipeline as one recursive-CTE composition of the component
    oracles, with the SimHash pair + reachability stages instantiated
    over the gated ``kept`` set exactly like the Spark plan."""
    quality = quality_score_oracle_sql(table, id_col, text_col)
    lang = language_id_oracle_sql(table, id_col, text_col)
    stats = text_stats_oracle_sql(table, id_col, text_col)
    pairs = simhash_near_dup_oracle_sql(
        "kept", max_hamming, id_col, text_col
    )
    return f"""
    WITH RECURSIVE q AS ({quality}),
    l AS ({lang}),
    kept AS (
      SELECT d.{id_col}, d.{text_col}, l.predicted_lang
      FROM {table} d
      JOIN q ON d.{id_col} = q.{id_col}
      JOIN l ON d.{id_col} = l.{id_col}
      WHERE q.quality_score >= {quality_min}
        AND l.predicted_lang <> 'und'
    ),
    pairs AS ({pairs}),
    edges AS (
      SELECT id_a AS a, id_b AS b FROM pairs
      UNION
      SELECT id_b, id_a FROM pairs
    ),
    reach(a, b) AS (
      SELECT {id_col}, {id_col} FROM kept
      UNION
      SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    ),
    clusters AS (
      SELECT a AS {id_col}, min(b) AS cluster_id FROM reach GROUP BY a
    ),
    st AS ({stats})
    SELECT k.predicted_lang AS lang,
           count(*) FILTER (WHERE k.{id_col} = c.cluster_id) AS kept_docs,
           count(*) FILTER (WHERE k.{id_col} <> c.cluster_id)
             AS near_dups_removed,
           CAST(sum(s.n_tokens) FILTER (WHERE k.{id_col} = c.cluster_id)
                AS BIGINT) AS total_tokens
    FROM kept k
    JOIN clusters c ON k.{id_col} = c.{id_col}
    JOIN st s ON k.{id_col} = s.{id_col}
    GROUP BY 1
    """
