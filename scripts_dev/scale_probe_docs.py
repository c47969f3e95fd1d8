#!/usr/bin/env python
"""Dedup-family scale probe: run MinHash-LSH, SimHash near-dup, and
text stats over a deterministic synthetic corpus far above the sf0.1
fixture (default 100k docs ≈ 20×).

  python scripts_dev/scale_probe_docs.py [n_docs]

Corpus: ~60-word documents of md5-derived pseudo-words unique to each
document (so unrelated docs share no shingles); every 10th document is
a near-duplicate of its neighbor (same words, one appended) so the LSH
path has real collisions to verify — planted pairs are the ONLY
expected output, keeping the probe linear, not pair-quadratic.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def synthetic_docs(
    spark,
    n_docs: int,
    with_stopwords: bool = False,
    dup_exact: bool = False,
):
    # with_stopwords: prefix each doc with English-only function words
    # so the curation pipeline's language/quality gates pass (the words
    # are unique to the `en` list — scores 5/0/0/0).
    # dup_exact: plant verbatim copies (SimHash distance 0) instead of
    # J≈0.95 one-word-appended neighbors — the curation collapse
    # assertion must not depend on the hamming-threshold recall curve.
    prefix = "'the of and to that ' || " if with_stopwords else ""
    words = (
        f"{prefix}concat_ws(' ', transform(sequence(1, 55 + cast({{d}} % 10 as int)),"
        " i -> substring(md5(cast({d} as string) || '-' || i), 1, 6)))"
    )
    base = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.expr(words.format(d="id")).alias("text"),
    )
    # every 10th doc: neighbor's text (+ one extra word unless exact)
    dup_text = F.expr(words.format(d="(doc_id - 1)"))
    if not dup_exact:
        dup_text = F.concat(dup_text, F.lit(" zzextra"))
    return base.withColumn(
        "text",
        F.when(
            (F.col("doc_id") % 10 == 0) & (F.col("doc_id") > 0), dup_text
        ).otherwise(F.col("text")),
    )


def main() -> int:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    from feature_store_spark.llm.dedup import (
        minhash_lsh_pairs,
        simhash_near_dup_pairs,
    )
    from feature_store_spark.llm.text import text_stats
    from feature_store_spark.session import get_spark

    spark = get_spark("scale_probe_docs")
    docs = synthetic_docs(spark, n_docs).localCheckpoint(eager=True)

    t0 = time.perf_counter()
    n_pairs = minhash_lsh_pairs(docs, n=3, threshold=0.5).count()
    t_mh = time.perf_counter() - t0

    t0 = time.perf_counter()
    n_sim = simhash_near_dup_pairs(docs, max_hamming=8).count()
    t_sh = time.perf_counter() - t0

    t0 = time.perf_counter()
    text_stats(docs).write.format("noop").mode("overwrite").save()
    t_ts = time.perf_counter() - t0

    # dup-span: each planted copy shares ALL its 5-grams with its
    # neighbor (minus the one-word tail), so exactly the planted docs
    # and their originals should light up near frac 1; unrelated docs
    # share no words at all. Work is linear: the duplicated-gram set is
    # 2 × planted docs' grams, not corpus².
    from feature_store_spark.llm.pretrain import dup_span_stats

    t0 = time.perf_counter()
    n_dup_docs = (
        dup_span_stats(docs, k=5)
        .filter(F.col("dup_window_frac") > 0.5)
        .count()
    )
    t_ds = time.perf_counter() - t0

    planted = n_docs // 10 - 1
    recall = n_pairs / planted if planted else 1.0
    print(
        f"n_docs={n_docs} minhash_pairs={n_pairs} ({t_mh:.1f}s, "
        f"recall {recall:.4f}) "
        f"simhash_pairs={n_sim} ({t_sh:.1f}s) text_stats={t_ts:.1f}s "
        f"dup_span_docs={n_dup_docs} ({t_ds:.1f}s)"
    )
    # every planted copy AND its original must exceed 50% dup-window
    # coverage; nothing else shares any words, so the count is exact
    assert n_dup_docs == 2 * planted, (n_dup_docs, planted)
    # planted pairs sit at J≈0.95; the r=3,b=4 S-curve misses ~(1-J³)⁴
    # of them, so demand ≥99% recall rather than exhaustiveness
    assert recall >= 0.99, (n_pairs, planted)

    # Composite curation pipeline on the stopworded corpus variant:
    # the gates must keep all docs and the canonical cut must collapse
    # (almost) every planted near-dup.
    from feature_store_spark.llm.curation import curate_corpus

    en_docs = synthetic_docs(
        spark, n_docs, with_stopwords=True, dup_exact=True
    )
    en_docs = en_docs.localCheckpoint(eager=True)
    t0 = time.perf_counter()
    rows = curate_corpus(en_docs).collect()
    t_cur = time.perf_counter() - t0
    budget = {r["lang"]: r for r in rows}
    en = budget["en"]
    print(
        f"curation={t_cur:.1f}s kept={en['kept_docs']} "
        f"near_dups_removed={en['near_dups_removed']} "
        f"tokens={en['total_tokens']}"
    )
    assert en["kept_docs"] + en["near_dups_removed"] == n_docs
    # exact-copy pairs (docs 10,20,… copy their neighbor) collapse
    # deterministically: one survivor each. A few extra removals are
    # 60-bit SimHash false positives — at 100k docs the ~5e9 implicit
    # pairs make a handful of ≤8-hamming collisions between unrelated
    # docs expected (measured: 2 at 100k).
    assert planted <= en["near_dups_removed"] <= planted + max(
        10, n_docs // 10_000
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
