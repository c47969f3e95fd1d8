#!/usr/bin/env python
"""Benchmark driver: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced end-to-end with a noop-format write (full
compute, no driver-side materialization cost).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

HEADLINE = [
    "pipeline_user_features",
    "pipeline_transaction_features",
    "pipeline_risk_features",
    "pipeline_serving_join",
    "a7_stats_outliers",
    "w1_latest_event_per_user",
    "u1_union_active_keys",
    "o3_deterministic_sample",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else None

    from feature_store_spark.queries import SPECS
    from feature_store_spark.session import get_spark

    spark = get_spark("feature_store_bench")
    # Warm the JVM/codegen path once so timings measure the engine,
    # not first-query startup.
    spark.range(1000).selectExpr("sum(id)").collect()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        if name not in SPECS:
            continue
        fn = SPECS[name].fn
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline pipelines + operator sweep wall time",
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
