"""Measure MinHash-LSH recall@threshold vs the exact n-gram Jaccard
pairs at sf0.1 and sf~1, for the default banding (k=12, b=4 — S-curve
midpoint J~0.6) and a higher-k variant (k=24, b=8 — midpoint J~0.5).
Feeds the recall table in SCALE.md §2 (round-3 verdict item 8)."""
import sys
import time

sys.path.insert(0, "/root/repo")

from feature_store_spark.llm.dedup import minhash_lsh_pairs, ngram_jaccard_pairs
from feature_store_spark.session import get_spark
from feature_store_spark.tables import load_table

spark = get_spark("lsh_recall", shuffle_partitions=16)
spark.range(1000).selectExpr("sum(id)").collect()

for sf_dir, label in (("/root/testdata/sf0.1", "sf0.1"), ("/tmp/sfbig", "sf1.0")):
    docs = load_table(spark, sf_dir, "documents")
    # one exact-Jaccard job: `true` derives from the same collect
    jac = {
        (r[0], r[1]): r[2]
        for r in ngram_jaccard_pairs(docs, n=3, threshold=0.5)
        .select("id_a", "id_b", "jaccard")
        .collect()
    }
    true = set(jac)
    for k, b in ((12, 4), (24, 8)):
        t0 = time.perf_counter()
        got = {
            (r[0], r[1])
            for r in minhash_lsh_pairs(docs, n=3, threshold=0.5, k=k, bands=b)
            .select("id_a", "id_b")
            .collect()
        }
        dt = time.perf_counter() - t0
        rec = len(true & got) / len(true) if true else 1.0
        lo = [p for p, j in jac.items() if j < 0.6]
        hi = [p for p, j in jac.items() if j >= 0.6]
        rec_lo = (
            len(set(lo) & got) / len(lo) if lo else float("nan")
        )
        rec_hi = (
            len(set(hi) & got) / len(hi) if hi else float("nan")
        )
        print(
            f"{label} k={k} b={b}: n_true={len(true)} recall={rec:.3f} "
            f"recall[J<0.6]={rec_lo:.3f} (n={len(lo)}) "
            f"recall[J>=0.6]={rec_hi:.3f} (n={len(hi)}) "
            f"wall={dt:.1f}s"
        )
spark.stop()
