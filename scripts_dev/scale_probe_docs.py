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


def synthetic_docs(spark, n_docs: int):
    words = (
        "concat_ws(' ', transform(sequence(1, 55 + cast({d} % 10 as int)),"
        " i -> substring(md5(cast({d} as string) || '-' || i), 1, 6)))"
    )
    base = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.expr(words.format(d="id")).alias("text"),
    )
    # every 10th doc: neighbor's text + one extra word → high-Jaccard pair
    return base.withColumn(
        "text",
        F.when(
            (F.col("doc_id") % 10 == 0) & (F.col("doc_id") > 0),
            F.concat(
                F.expr(words.format(d="(doc_id - 1)")), F.lit(" zzextra")
            ),
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

    planted = n_docs // 10 - 1
    recall = n_pairs / planted if planted else 1.0
    print(
        f"n_docs={n_docs} minhash_pairs={n_pairs} ({t_mh:.1f}s, "
        f"recall {recall:.4f}) "
        f"simhash_pairs={n_sim} ({t_sh:.1f}s) text_stats={t_ts:.1f}s"
    )
    # planted pairs sit at J≈0.95; the r=3,b=4 S-curve misses ~(1-J³)⁴
    # of them, so demand ≥99% recall rather than exhaustiveness
    assert recall >= 0.99, (n_pairs, planted)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
