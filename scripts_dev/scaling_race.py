"""Spark vs DuckDB on the FULL 29-query bench headline at sf0.1 and
sf~1 (10x, /tmp/sfbig built by make_sfbig.py) — the evidence behind
every "floor-dominated at sf0.1" claim in SCALE.md §8 (round-3: all 29
headline queries, not the r2 24-query subset). Session config and
per-family shuffle widths mirror bench.py exactly so the sf0.1 column
is comparable with BENCH_r*.json."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
# same daily-batch bucketed-fact layout posture as bench.py
os.environ.setdefault("SPARK_GRAFT_BUCKETED_FACTS", "1")

from bench import HEADLINE, HEAVY_SHUFFLE  # noqa: E402

from feature_store_spark.oracle import duckdb_connection  # noqa: E402
from feature_store_spark.queries import SPECS, all_queries  # noqa: E402
from feature_store_spark.session import get_spark  # noqa: E402

all_queries()
CPUS = int(os.environ["SPARK_GRAFT_CPUS"])
spark = get_spark(
    "race",
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
        "spark.sql.files.maxPartitionBytes": "8m",  # mirrors bench.py
    },
)
spark.range(1000).selectExpr("sum(id)").collect()

# RACE_ONLY=sf0.1|sf1.0 runs a single scale and RACE_QUERIES=a,b,c a
# headline subset (the DuckDB side of the dedup family runs minutes
# at sf~1 — chunked invocations keep each run inside a driver
# timeout; totals are summed across chunks by the caller)
_only = os.environ.get("RACE_ONLY")
if _only and _only not in ("sf0.1", "sf1.0") and not os.path.isdir(_only):
    sys.exit(
        f"RACE_ONLY must be sf0.1, sf1.0, or an existing fixture dir, "
        f"got {_only!r}"
    )
_subset = [
    q for q in os.environ.get("RACE_QUERIES", "").split(",") if q
] or None
if _subset:
    unknown = sorted(set(_subset) - set(HEADLINE))
    if unknown:
        # a silently-dropped typo would corrupt cross-chunk totals
        sys.exit(f"RACE_QUERIES not in HEADLINE: {unknown}")
    HEADLINE = [q for q in HEADLINE if q in _subset]
_scales = [
    ("/root/testdata/sf0.1", "sf0.1", True),
    ("/tmp/sfbig", "sf1.0", False),
]
if _only and os.path.isdir(_only):
    # race an arbitrary fixture dir (e.g. /tmp/sfbig4) at big widths
    _scales = [(_only, _only, False)]
    _only = None
for sf_dir, label, toy in _scales:
    if _only and label != _only:
        continue
    light = 2 if toy else min(8, CPUS)
    heavy = min(16, CPUS) if toy else CPUS
    con = duckdb_connection(sf_dir)
    s_tot = d_tot = 0.0
    print(f"== {label} ==")
    for name in HEADLINE:
        fn = SPECS[name].fn
        # deployed-artifact queries get their DuckDB artifact built
        # untimed, mirroring bench.py (int8 codes table symmetry)
        if SPECS[name].bench_setup is not None:
            con.execute(SPECS[name].bench_setup)
        sql = SPECS[name].bench_sql or SPECS[name].sql
        spark.conf.set(
            "spark.sql.shuffle.partitions",
            str(heavy if name in HEAVY_SHUFFLE else light),
        )
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        s_best = 1e9
        for _ in range(2):
            # fresh plan per run, built OUTSIDE the timed window —
            # bench.py's exact protocol (py4j plan construction and
            # any plan-build-time driver work are not engine time)
            df = fn(spark, sf_dir)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            s_best = min(s_best, time.perf_counter() - t0)
        con.execute(sql).fetchall()  # warm
        t0 = time.perf_counter()
        con.execute(sql).fetchall()
        d_best = time.perf_counter() - t0
        s_tot += s_best
        d_tot += d_best
        print(
            f"{name}: spark={s_best:.3f} duckdb={d_best:.3f} "
            f"ratio={s_best / d_best:.1f}x"
        )
    print(
        f"TOTAL {label}: spark={s_tot:.2f} duckdb={d_tot:.2f} "
        f"ratio={s_tot / d_tot:.2f}x"
    )
spark.stop()
