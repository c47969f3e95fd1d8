"""Embedding clustering + cluster-balanced sampling (SURVEY.md §2.12).

K-means over the embedding corpus is the workhorse of
diversity-aware LLM-data curation — cluster-balanced sampling, per-
cluster dedup budgets (the coarse half of SemDeDup's recipe), domain
discovery. MLlib's KMeans is non-deterministic across runs/engines
(random init, float summation order), which would make a differential
oracle impossible — so this module implements **exact fixed-point
Lloyd's iterations** that produce BIT-IDENTICAL results on Spark and
DuckDB:

- components quantize to integers (``floor(x * 2^20 + 0.5)``) once;
- distances are exact BIGINT sums of squared integer differences;
- the argmin tie-breaks to the smallest cluster index;
- center updates round the per-dimension mean to an integer via the
  SAME IEEE-double expression (``floor((2*s + n) / (2*n))``) on both
  engines (Python mirrors the double arithmetic, not exact rationals);
- init is the first ``k`` vectors by id — deterministic, no RNG.

Fixed iteration count (no convergence test) keeps the oracle SQL a
finite unroll. Quantization error is bounded by 2^-21 per component —
immaterial next to the float32 inputs' own noise for curation use.

Scale shape: centers are k×dim integers that live on the driver
(k ≤ a few thousand — the "small query-side vector set" pattern the
serving path already uses); every iteration is ONE scan of the
quantized corpus with k JVM-side aggregate expressions and one
groupBy(cluster) with per-dimension integral sums (exact under any
partial-aggregation order — the reason the fixed point exists). No
all-pairs, no Python in the row path.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Q_BITS = 20
Q = 1 << Q_BITS


def _quantize(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    return df.select(
        F.col(id_col),
        F.transform(
            vec_col,
            lambda x: F.floor(x.cast("double") * Q + F.lit(0.5)).cast(
                "long"
            ),
        ).alias("xq"),
    )


def _round_div(s: int, n: int) -> int:
    """Round-half-up integer mean, computed through IEEE doubles so it
    matches the oracle's ``floor((2.0*s + n) / (2*n))`` bit-for-bit
    (exact rational floor-div could disagree at representability
    boundaries; mirroring the double arithmetic cannot)."""
    return int(math.floor((2.0 * s + n) / (2.0 * n)))


def _assign(emb: DataFrame, centers: list[list[int]], id_col: str):
    """Add (cluster, dist_q) under the given integer centers: exact
    BIGINT squared-L2, argmin tie-broken to the smallest index."""
    k = len(centers)
    dists = []
    for j, c in enumerate(centers):
        lit = F.array(*[F.lit(int(v)) for v in c])
        d = F.aggregate(
            F.zip_with("xq", lit, lambda x, cv: (x - cv) * (x - cv)),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )
        dists.append(d.alias(f"__d{j}"))
    scored = emb.select(id_col, "xq", *dists)
    # F.least needs >= 2 args; k=1 degenerates to the single distance
    best = (
        F.least(*[F.col(f"__d{j}") for j in range(k)])
        if k > 1
        else F.col("__d0")
    )
    cluster = F.when(F.col("__d0") == best, 0)
    for j in range(1, k):
        cluster = cluster.when(F.col(f"__d{j}") == best, j)
    return scored.select(
        id_col,
        "xq",
        cluster.cast("int").alias("cluster"),
        best.alias("dist_q"),
    )


def kmeans_clusters(
    df: DataFrame,
    k: int = 8,
    n_iter: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic k-means assignment: (id, cluster, dist_q) after
    ``n_iter`` exact fixed-point Lloyd's iterations (module docstring
    has the arithmetic contract). ``dist_q`` is the exact quantized
    squared L2 to the final center — hash-comparable, no rounding."""
    if k < 1 or n_iter < 0:
        raise ValueError("k must be >= 1 and n_iter >= 0")
    emb = _quantize(df, id_col, vec_col).persist()
    try:
        init = emb.orderBy(id_col).limit(k).collect()
        if len(init) < k:
            raise ValueError(
                f"kmeans_clusters: k={k} exceeds the corpus size "
                f"{len(init)}"
            )
        centers = [list(r["xq"]) for r in init]
        dim = len(centers[0])
        sums = [F.sum(F.col("xq")[i]).alias(f"__s{i}") for i in range(dim)]
        for _ in range(n_iter):
            assigned = _assign(emb, centers, id_col)
            got = {
                r["cluster"]: r
                for r in assigned.groupBy("cluster")
                .agg(F.count(F.lit(1)).alias("__n"), *sums)
                .collect()
            }
            centers = [
                [
                    _round_div(int(got[j][f"__s{i}"]), int(got[j]["__n"]))
                    for i in range(dim)
                ]
                if j in got
                else centers[j]  # empty cluster keeps its center
                for j in range(k)
            ]
        return _assign(emb, centers, id_col).select(
            id_col, "cluster", "dist_q"
        )
    finally:
        emb.unpersist()


def kmeans_clusters_oracle_sql(
    table: str = "embeddings",
    k: int = 8,
    n_iter: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB twin: the same fixed-point iterations unrolled as CTE
    chain (assignment = cross join + per-vector argmin window; center
    update = per-(cluster, dim) integral sums re-listed in dimension
    order; empty clusters carry the previous center forward)."""
    q = (
        f"q AS (SELECT {id_col}, list_transform({vec_col}, "
        f"x -> CAST(floor(CAST(x AS DOUBLE) * {Q} + 0.5) AS BIGINT)) "
        f"AS xq FROM {table})"
    )
    c0 = (
        f"c0 AS (SELECT CAST(row_number() OVER (ORDER BY {id_col}) - 1 "
        f"AS INT) AS cl, xq AS cq FROM q ORDER BY {id_col} LIMIT {k})"
    )
    parts = [q, c0]

    def assign_cte(name: str, centers: str) -> str:
        return f"""{name} AS (
          SELECT {id_col}, xq, cl, dist,
                 row_number() OVER (PARTITION BY {id_col}
                                    ORDER BY dist, cl) AS rn
          FROM (
            SELECT q.{id_col}, q.xq, c.cl,
                   list_sum(list_transform(range(1, {dim} + 1),
                     i -> (q.xq[i] - c.cq[i]) * (q.xq[i] - c.cq[i])))
                     AS dist
            FROM q CROSS JOIN {centers} c) t
        )"""

    for t in range(n_iter):
        prev = "c0" if t == 0 else f"c{t}"
        parts.append(assign_cte(f"a{t}", prev))
        parts.append(f"""c{t + 1}_new AS (
          SELECT cl, list(cv ORDER BY i) AS cq FROM (
            SELECT cl, i,
                   CAST(floor((2.0 * sum(xq[i]) + count(*))
                              / (2 * count(*))) AS BIGINT) AS cv
            FROM a{t}, range(1, {dim} + 1) r(i)
            WHERE rn = 1
            GROUP BY cl, i
          ) GROUP BY cl
        )""")
        parts.append(f"""c{t + 1} AS (
          SELECT * FROM c{t + 1}_new
          UNION ALL
          SELECT cl, cq FROM {prev}
          WHERE cl NOT IN (SELECT cl FROM c{t + 1}_new)
        )""")
    parts.append(assign_cte("afinal", f"c{n_iter}"))
    ctes = ",\n".join(parts)
    return f"""
    WITH {ctes}
    SELECT {id_col}, CAST(cl AS INT) AS cluster, dist AS dist_q
    FROM afinal WHERE rn = 1
    """


def cluster_balanced_sample(
    assignments: DataFrame,
    n_per_cluster: int,
    seed: str = "cbs",
    id_col: str = "vec_id",
    cluster_col: str = "cluster",
) -> DataFrame:
    """Diversity-balanced sampling: up to ``n_per_cluster`` rows per
    cluster, chosen by the seeded md5 order every sampling operator in
    this engine uses (deterministic, cross-engine, re-runnable). The
    standard downstream of :func:`kmeans_clusters` — equalizing
    cluster budgets is how curation pipelines stop head clusters from
    dominating a training mix. One window shuffle on the cluster key."""
    from pyspark.sql import Window

    w = Window.partitionBy(cluster_col).orderBy(
        F.md5(F.concat_ws("|", F.lit(seed), F.col(id_col).cast("string"))),
        F.col(id_col),
    )
    return (
        assignments.withColumn(
            "sample_rank", F.row_number().over(w).cast("int")
        )
        .filter(F.col("sample_rank") <= n_per_cluster)
        .select(id_col, cluster_col, "sample_rank")
    )


def cluster_balanced_sample_oracle_sql(
    inner_sql: str,
    n_per_cluster: int,
    seed: str = "cbs",
    id_col: str = "vec_id",
    cluster_col: str = "cluster",
) -> str:
    return f"""
    WITH assigned AS ({inner_sql})
    SELECT {id_col}, {cluster_col}, CAST(sample_rank AS INT) AS sample_rank
    FROM (
      SELECT {id_col}, {cluster_col},
             row_number() OVER (
               PARTITION BY {cluster_col}
               ORDER BY md5('{seed}' || '|' || CAST({id_col} AS VARCHAR)),
                        {id_col}) AS sample_rank
      FROM assigned
    ) t WHERE sample_rank <= {n_per_cluster}
    """
