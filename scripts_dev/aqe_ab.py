"""AQE posture A/B at sf~1 (VERDICT r7 item 5): every bench row pins
adaptive=false with hand-sized per-family shuffle widths; on a real
cluster the default posture is adaptive=true with wide initial
shuffles that AQE coalesces (plus runtime skew-join splitting). This
script races the full bench headline on /tmp/sfbig under both
postures in ONE session (AQE is a runtime conf):

  off: adaptive=false, width = per-family hand sizing (bench.py)
  on : adaptive=true,  width = CPUS (start wide, let the coalescer
       shrink the post-shuffle side — the cluster default)

Usage: python scripts_dev/aqe_ab.py [query,query,...]
Writes one line per query: name, off_sec, on_sec, on/off ratio.
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
os.environ.setdefault("SPARK_GRAFT_BUCKETED_FACTS", "1")

from bench import HEADLINE, HEAVY_SHUFFLE  # noqa: E402

from feature_store_spark.queries import SPECS, all_queries  # noqa: E402
from feature_store_spark.session import get_spark  # noqa: E402

all_queries()
CPUS = int(os.environ["SPARK_GRAFT_CPUS"])
SF_DIR = os.environ.get("AQE_AB_SF_DIR", "/tmp/sfbig")
spark = get_spark(
    "aqe_ab",
    shuffle_partitions=8,
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

subset = [q for q in (sys.argv[1].split(",") if len(sys.argv) > 1 else []) if q]
names = [q for q in HEADLINE if not subset or q in subset]


def best_of(fn, runs=2):
    fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()  # warm
    best = 1e9
    for _ in range(runs):
        df = fn(spark, SF_DIR)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return best


off_tot = on_tot = 0.0
rows = []
for name in names:
    fn = SPECS[name].fn
    light, heavy = min(8, CPUS), CPUS
    # posture OFF: bench.py hand sizing
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set(
        "spark.sql.shuffle.partitions",
        str(heavy if name in HEAVY_SHUFFLE else light),
    )
    off = best_of(fn)
    # posture ON: cluster default — wide initial width, AQE coalesces
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.shuffle.partitions", str(CPUS))
    on = best_of(fn)
    off_tot += off
    on_tot += on
    rows.append((name, off, on))
    print(f"{name}: off={off:.3f} on={on:.3f} on/off={on / off:.2f}x",
          flush=True)

print(f"TOTAL: off={off_tot:.2f} on={on_tot:.2f} "
      f"on/off={on_tot / off_tot:.2f}x")
spark.stop()
