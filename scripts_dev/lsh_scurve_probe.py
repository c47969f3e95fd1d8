"""Measure the MinHash-LSH CANDIDATE-recall S-curve at controlled
Jaccard levels (the fixture corpus has no pairs below J=0.6, so its
recall=1.0 says nothing about behavior near the 0.5 threshold —
round-2 verdict item 8).

Construction: doc pairs share a p-token prefix and carry unique
t-token tails, so word-3-gram Jaccard is exactly
(p-2) / (2(p+t-2) - (p-2)) — solved per target level. 500 pairs per
level. Banding configs: the default k=12/b=4 (r=3, S-curve midpoint
J≈(1/4)^(1/3)=0.63) and k=24/b=8 (midpoint ≈0.5). Recall here is
CANDIDATE recall (threshold passed to the op sits below every planted
level, so exact verification keeps all candidates found)."""
import sys

sys.path.insert(0, "/root/repo")

from feature_store_spark.llm.dedup import minhash_lsh_pairs
from feature_store_spark.session import get_spark

LEVELS = [0.40, 0.45, 0.50, 0.55, 0.60, 0.70, 0.80]
PAIRS_PER_LEVEL = 500
TOTAL_TOKENS = 60  # p + t per doc


def solve_p(j: float, n: int) -> int:
    best, err = None, 1e9
    for p in range(3, n - 1):
        jj = (p - 2) / (2 * (n - 2) - (p - 2))
        if abs(jj - j) < err:
            best, err = p, abs(jj - j)
    return best


def main():
    spark = get_spark("lsh_scurve", shuffle_partitions=16)
    rows = []
    doc_id = 0
    level_of_pair = {}
    for li, j in enumerate(LEVELS):
        p = solve_p(j, TOTAL_TOKENS)
        t = TOTAL_TOKENS - p
        realized = (p - 2) / (2 * (TOTAL_TOKENS - 2) - (p - 2))
        print(f"level {j}: p={p} t={t} realized J={realized:.3f}")
        for i in range(PAIRS_PER_LEVEL):
            prefix = " ".join(
                f"p{li}x{i}w{w}" for w in range(p)
            )
            a_tail = " ".join(f"a{li}x{i}w{w}" for w in range(t))
            b_tail = " ".join(f"b{li}x{i}w{w}" for w in range(t))
            rows.append((doc_id, prefix + " " + a_tail))
            rows.append((doc_id + 1, prefix + " " + b_tail))
            level_of_pair[(doc_id, doc_id + 1)] = j
            doc_id += 2
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    for k, b in ((12, 4), (24, 8)):
        got = {
            (r[0], r[1])
            for r in minhash_lsh_pairs(
                docs, n=3, threshold=0.3, k=k, bands=b
            )
            .select("id_a", "id_b")
            .collect()
        }
        print(f"-- k={k} b={b} (r={k // b}) --")
        for j in LEVELS:
            planted = [pr for pr, lv in level_of_pair.items() if lv == j]
            rec = len([pr for pr in planted if pr in got]) / len(planted)
            print(f"  J={j:.2f}: candidate recall {rec:.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
