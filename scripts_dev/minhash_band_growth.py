#!/usr/bin/env python
"""Measure LSH candidate-pair growth vs corpus size (SCALE.md §2).

Banding is the scale story of MinHash dedup: if candidate count grows
~linearly with corpus size (planted dup density held constant), the
verification join stays candidate-proportional and the operator
survives a 100× scale-up; quadratic growth would mean the bands are
degenerating into an all-pairs join.

  python scripts_dev/minhash_band_growth.py [sizes...]

Prints one line per corpus size: n_docs, candidate pairs (pre-
verification, agreeing on ≥1 band), verified pairs, wall seconds.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F

from scale_probe_docs import synthetic_docs


def candidate_pairs(docs, n=3, k=None, bands=None):
    """The banding stage of minhash_lsh_pairs, stopped before exact
    verification — counts candidates, the quantity whose growth rate
    decides scalability. Uses the PRODUCTION band construction
    (`dedup._band_postings`) so the probe can never desynchronize
    from the operator it measures."""
    from feature_store_spark.llm.dedup import (
        MINHASH_BANDS,
        MINHASH_K,
        _band_postings,
        minhash_signatures,
    )

    k = k or MINHASH_K
    bands = bands or MINHASH_BANDS
    sig = minhash_signatures(docs, n=n, k=k)
    bands_df = _band_postings(sig, k=k, bands=bands)
    return (
        bands_df.groupBy("band_idx", "band_hash")
        .agg(F.collect_list(F.col("doc_id")).alias("mem"))
        .select(F.explode("mem").alias("id_a"), "mem")
        .select("id_a", F.explode("mem").alias("id_b"))
        .filter(F.col("id_a") < F.col("id_b"))
        .distinct()
    )


def main() -> int:
    sizes = [int(s) for s in sys.argv[1:]] or [25_000, 50_000, 100_000, 200_000]
    from feature_store_spark.llm.dedup import minhash_lsh_pairs
    from feature_store_spark.session import get_spark

    spark = get_spark("minhash_band_growth")
    print("n_docs\tcandidates\tverified\tsec\tcand_per_doc")
    for n_docs in sizes:
        docs = synthetic_docs(spark, n_docs).localCheckpoint(eager=True)
        t0 = time.perf_counter()
        n_cand = candidate_pairs(docs).count()
        n_ver = minhash_lsh_pairs(docs, n=3, threshold=0.5).count()
        dt = time.perf_counter() - t0
        print(
            f"{n_docs}\t{n_cand}\t{n_ver}\t{dt:.1f}\t"
            f"{n_cand / n_docs:.4f}"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
