#!/usr/bin/env python
"""max_by single-aggregate vs row_number window for latest-per-key
(W1 / the risk pipeline's credit-report DISTINCT ON feeds) — VERDICT
r8 item 7: the claim 'max_by beats a window pass' rode the w1 oracle
only; this measures both shapes head-to-head on the events table at
a given fixture dir (default /tmp/sfbig, 10x). Usage:
python scripts_dev/latest_per_key_race.py [sf_dir]"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_BUCKETED_FACTS", "1")

from pyspark.sql import Window
from pyspark.sql import functions as F

from feature_store_spark.session import get_spark
from feature_store_spark.tables import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfbig"
    spark = get_spark("latest_race", shuffle_partitions=8, extra_conf={
        "spark.sql.adaptive.enabled": "false",
        "spark.sql.files.maxPartitionBytes": "8m",
    })
    ev = load_table(spark, sf_dir, "events")

    def t(label, df):
        df.write.format("noop").mode("overwrite").save()
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        print(f"{label}: {best:.3f}", flush=True)

    # shape 1: max_by single aggregate (what queries.py w1 ships)
    agg = ev.groupBy("user_id").agg(
        F.max_by(
            F.struct("ts", "event_id", "event_type", "value"),
            F.struct("ts", "event_id"),
        ).alias("__r")
    ).select("user_id", "__r.*")
    t("max_by_aggregate", agg)

    # shape 2: row_number window (the shape it replaced)
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    win = (
        ev.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("user_id", "ts", "event_id", "event_type", "value")
    )
    t("row_number_window", win)

    # parity: identical rows
    a = agg.select("user_id", "ts", "event_id")
    b = win.select("user_id", "ts", "event_id")
    diff = a.exceptAll(b).union(b.exceptAll(a)).count()
    print(f"row_parity_diff: {diff}")
    # shuffle-volume proxy (the quantity that separates the shapes on
    # a real network): the window moves EVERY event row through its
    # exchange; max_by moves map-combined partials bounded by
    # |users| x map-tasks
    rows = ev.count()
    users = ev.select("user_id").distinct().count()
    print(f"rows_through_window_exchange: {rows}")
    print(f"max_partial_rows_through_max_by_exchange: ~{users} per map task")
    spark.stop()


if __name__ == "__main__":
    main()
