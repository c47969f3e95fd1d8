#!/usr/bin/env python
"""Round-10 optimization harness: time individual registered queries
with the exact bench.py protocol (fresh plan per run, noop sink,
warmup + best-of-N) and optionally dump .explain("formatted").

Usage:
  python scripts_dev/qtime.py q1 q2 ...            # time queries
  python scripts_dev/qtime.py --explain q1         # also write plan
  python scripts_dev/qtime.py --runs 5 q1
  SPARK_GRAFT_SF_DIR=... overrides the data dir (default sf0.1).

Plans land in /root/repo/plans/r11/<query>_<tag>.txt when --explain
--tag before|after is given.
"""

from __future__ import annotations

import argparse
import io
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--explain", action="store_true")
    ap.add_argument("--tag", default=None, help="plan file suffix")
    ap.add_argument("--flat", action="store_true",
                    help="disable bucketed facts layout")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault(
        "SPARK_GRAFT_BUCKETED_FACTS", "0" if args.flat else "1"
    )

    from bench import HEAVY_SHUFFLE
    from feature_store_spark.queries import SPECS, all_queries
    from feature_store_spark.session import get_spark

    all_queries()
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        "qtime",
        shuffle_partitions=2,
        extra_conf={
            "spark.sql.adaptive.enabled": "false",
            "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
            "spark.sql.join.preferSortMergeJoin": "false",
            "spark.shuffle.compress": "false",
            "spark.shuffle.spill.compress": "false",
            "spark.locality.wait": "0",
            "spark.sql.constraintPropagation.enabled": "false",
            "spark.sql.legacy.bucketedTableScan.outputOrdering": "true",
            "spark.sql.files.maxPartitionBytes": "8m",
        },
    )
    spark.range(1000).selectExpr("sum(id)").collect()

    def run(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    run(spark.range(1))
    floor = None
    for _ in range(args.runs):
        df = spark.range(1)
        t0 = time.perf_counter()
        run(df)
        dt = time.perf_counter() - t0
        floor = dt if floor is None else min(floor, dt)
    print(f"floor_sec {floor:.3f}  load {os.getloadavg()}")

    for name in args.queries:
        if name not in SPECS:
            print(f"UNKNOWN query {name}", file=sys.stderr)
            continue
        spark.conf.set(
            "spark.sql.shuffle.partitions",
            str(min(16, cpus) if name in HEAVY_SHUFFLE else 2),
        )
        s = SPECS[name]
        spark.sparkContext.setJobDescription(f"qtime:{name}")
        run(s.fn(spark, sf_dir))  # warmup
        best = None
        trials = []
        for _ in range(args.runs):
            df = s.fn(spark, sf_dir)
            t0 = time.perf_counter()
            run(df)
            dt = time.perf_counter() - t0
            trials.append(round(dt, 3))
            best = dt if best is None else min(best, dt)
        print(f"{name:35s} best {best:7.3f}  trials {trials}")
        if args.explain:
            buf = io.StringIO()
            with redirect_stdout(buf):
                s.fn(spark, sf_dir).explain("formatted")
            txt = buf.getvalue()
            if args.tag:
                out = os.path.join(
                    os.path.dirname(os.path.dirname(
                        os.path.abspath(__file__))),
                    "plans", "r11", f"{name}_{args.tag}.txt",
                )
                os.makedirs(os.path.dirname(out), exist_ok=True)
                with open(out, "w") as f:
                    f.write(txt)
                print(f"  plan -> {out}")
            else:
                print(txt)
    spark.stop()


if __name__ == "__main__":
    main()
