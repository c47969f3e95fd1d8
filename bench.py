#!/usr/bin/env python
"""Benchmark driver: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Protocol: each query is forced end-to-end with a noop-format write
(full compute, zero driver-side materialization cost) — one warmup
pass, then the best of SPARK_GRAFT_BENCH_RUNS (default 2) timed runs.
The warmup absorbs JVM JIT + whole-stage-codegen compilation + parquet
footer caching; best-of-N guards against external load spikes on a
shared box (measured: identical queries swing 3 s ↔ 50 s with ambient
load). The reported number is steady-state engine throughput — the
quantity comparable across engines and the regime of a long-running
cluster. Set SPARK_GRAFT_BENCH_WARMUP=0 / SPARK_GRAFT_BENCH_RUNS=1
for single cold-ish runs.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

# Core feature-store surface + a slice of every extension family
# (dedup, similarity, text, multimodal, streaming-replay).
HEADLINE = [
    "pipeline_user_features",
    "pipeline_transaction_features",
    "pipeline_risk_features",
    "pipeline_serving_join",
    "a7_stats_outliers",
    "w1_latest_event_per_user",
    "u1_union_active_keys",
    "o3_deterministic_sample",
    "st5_velocity_features",
    "st7_session_features",
    "a16_hll_sketch_rollup",
    "t_text_stats",
    "d_minhash_lsh_pairs",
    "d_simhash_near_dup",
    "sim_cosine_topk",
    "mm_decode_media",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    warmup = os.environ.get("SPARK_GRAFT_BENCH_WARMUP", "1") != "0"
    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2")))
    # parse sf from the LAST directory segment only (a parent dir like
    # /srv/sf1/... must not win) and require a digit-led number
    m = re.search(
        r"sf([0-9]+(?:\.[0-9]+)?)", os.path.basename(sf_dir.rstrip("/"))
    )
    sf = float(m.group(1)) if m else None

    from feature_store_spark.queries import SPECS, all_queries
    from feature_store_spark.session import get_spark

    all_queries()
    spark = get_spark("feature_store_bench")
    spark.range(1000).selectExpr("sum(id)").collect()

    def run(name: str) -> None:
        SPECS[name].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        if name not in SPECS:
            # a silently dropped query would read as a speedup in
            # cross-run comparisons — make the drift loud
            print(
                f"WARNING: headline query {name!r} not registered; "
                "skipping",
                file=sys.stderr,
            )
            continue
        if warmup:
            run(name)
        best = None
        for _ in range(n_runs):
            t0 = time.perf_counter()
            run(name)
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "steady-state wall time: feature pipelines + "
                "operator sweep + LLM-data ops",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
