"""Measure IVF and PQ per-query recall at sf~1 (/tmp/sfbig, built by
make_sfbig.py) — VERDICT r4 item 8: the 0.8/0.65 (IVF) and 0.9/0.8
(PQ) bands were measured at <= sf0.1; cells and codebooks train on 10x
more data here, so the floors should hold but must be MEASURED.
Records a SCALE.md row. Usage: python scripts_dev/ann_recall_sfbig.py
[sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfbig"
    from feature_store_spark.llm import similarity as S
    from feature_store_spark.session import get_spark
    from feature_store_spark.tables import load_table

    spark = get_spark("ann_recall_sfbig", shuffle_partitions=32)
    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    print(f"embeddings rows: {n}")

    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = (
        S.cosine_topk(emb, queries, k=10, kernel="jvm")
        .select("query_id", "vec_id")
        .cache()
    )
    exact.count()

    def recall(ann_df, label):
        t0 = time.perf_counter()
        ann = ann_df.select("query_id", "vec_id")
        per_q = (
            exact.join(ann, ["query_id", "vec_id"], "left_semi")
            .groupBy("query_id")
            .agg(F.count(F.lit(1)).alias("n_hit"))
            .join(
                exact.groupBy("query_id").agg(
                    F.count(F.lit(1)).alias("n_exact")
                ),
                "query_id",
                "right",
            )
            .select(
                "query_id",
                (
                    F.coalesce(F.col("n_hit"), F.lit(0)) / F.col("n_exact")
                ).alias("r"),
            )
            .collect()
        )
        rs = [row["r"] for row in per_q]
        dt = time.perf_counter() - t0
        print(
            f"{label}: min={min(rs):.2f} mean={sum(rs) / len(rs):.3f} "
            f"queries={len(rs)} ({dt:.1f}s)"
        )
        return min(rs), sum(rs) / len(rs)

    ivf = S.ivf_ann_topk(emb, queries, k=10, n_centroids=8, n_probe=5)
    ivf_min, ivf_mean = recall(ivf, "IVF n_centroids=8 n_probe=5")

    pq = S.pq_ann_topk(emb, queries, k=10, shortlist_factor=50, n_codes=32)
    pq_min, pq_mean = recall(pq, "PQ shortlist_factor=50 n_codes=32")

    print(
        f"SCALE_ROW | sf~1 ({n} vecs): IVF min-recall {ivf_min:.2f} "
        f"(band 0.65, measured-at-sf<=0.1 0.8), PQ min-recall "
        f"{pq_min:.2f} (band 0.8, measured-at-sf<=0.1 0.9)"
    )
    spark.stop()


if __name__ == "__main__":
    main()
