#!/usr/bin/env python
"""Co-bucketed FACT layout probe: write orders + lineitem bucketed
(and sorted) by the join key at sf~1 and measure the payment-delay
feed (lineitem ⋈ orders on orderkey — the shuffle the SHJ hint in
`pipelines/features.py` merely softens) against the flat-parquet
layout.

  python scripts_dev/make_sfbig.py   # once
  python scripts_dev/fact_bucket_probe.py

What this demonstrates for 100 TB: bucketing is the STATIC
co-partitioning contract — both fact tables land hash-partitioned on
orderkey at write time, so every later orderkey join is a map-side
merge: zero Exchange, and with one file per bucket plus
`spark.sql.legacy.bucketedTableScan.outputOrdering=true`, zero Sort.
The write-side cost is one shuffle per table ONCE, amortized over
every downstream join/backfill (the reference leans on clustered
PostgreSQL PKs the same way, `sql/migration_queries.sql:143-166`).
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SRC = "/tmp/sfbig"
WAREHOUSE = "/tmp/fact_bucket_wh"
BUCKETS = 16


def pay_feed(lineitem, orders, ref_date="2001-08-01"):
    ref = F.to_date(F.lit(ref_date))
    return (
        lineitem.filter(F.to_date("l_shipdate") >= F.date_sub(ref, 90))
        .join(
            orders.select("o_orderkey", "o_custkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy(F.col("o_custkey").alias("user_id"))
        .agg(
            F.count(
                F.when(
                    F.to_date("l_shipdate")
                    > F.date_add(F.to_date("o_orderdate"), 60),
                    1,
                )
            ).alias("delays_90d")
        )
    )


def timeit(df):
    df.write.format("noop").mode("overwrite").save()
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        best = dt if best is None or dt < best else best
    return best


def main() -> int:
    from feature_store_spark.session import get_spark

    shutil.rmtree(WAREHOUSE, ignore_errors=True)
    spark = get_spark(
        "fact_bucket_probe",
        extra_conf={
            "spark.sql.warehouse.dir": WAREHOUSE,
            "spark.sql.legacy.bucketedTableScan.outputOrdering": "true",
            # isolate the layout effect: no AQE re-planning jobs
            "spark.sql.adaptive.enabled": "false",
            # the question this probe answers is "what does bucketing
            # save when the join would otherwise SHUFFLE" — the sf~1
            # orders projection broadcast-fits (~24 MB), which at
            # 100 TB it will not, so broadcast is disabled for BOTH
            # layouts to model the non-broadcastable regime
            "spark.sql.autoBroadcastJoinThreshold": "-1",
        },
    )
    spark.range(1000).selectExpr("sum(id)").collect()

    orders = spark.read.parquet(f"{SRC}/orders.parquet")
    lineitem = spark.read.parquet(f"{SRC}/lineitem.parquet")

    t_flat = timeit(pay_feed(lineitem, orders))

    # one-time co-bucketed write (ONE shuffle per table, ever);
    # repartition to the bucket count first so each bucket is ONE file
    # (outputOrdering can then honor the sort without a merge-sort)
    t0 = time.perf_counter()
    for name, df, key in (
        ("orders_b", orders, "o_orderkey"),
        ("lineitem_b", lineitem, "l_orderkey"),
    ):
        (
            df.repartition(BUCKETS, F.col(key))
            .write.bucketBy(BUCKETS, key)
            .sortBy(key)
            .mode("overwrite")
            .saveAsTable(name)
        )
    t_write = time.perf_counter() - t0

    ob = spark.table("orders_b")
    lb = spark.table("lineitem_b")
    feed = pay_feed(lb, ob)
    plan = feed._jdf.queryExecution().executedPlan().toString()
    # the ONLY exchange allowed is the groupBy(custkey) one; any
    # exchange hashing on an orderkey means the bucketing was ignored
    n_exchange_join = sum(
        1
        for ln in plan.splitlines()
        if "Exchange hashpartitioning" in ln and "orderkey" in ln
    )
    t_bucket = timeit(feed)

    # value parity: layouts must not change the answer
    sym = (
        pay_feed(lineitem, orders)
        .exceptAll(feed)
        .union(feed.exceptAll(pay_feed(lineitem, orders)))
        .count()
    )

    print(
        f"pay-feed sf~1: flat={t_flat:.2f}s bucketed={t_bucket:.2f}s "
        f"({t_flat / t_bucket:.1f}x) one-time bucketed write={t_write:.1f}s "
        f"exchanges-below-agg={n_exchange_join} symdiff={sym}"
    )
    assert sym == 0
    assert n_exchange_join == 0, "bucketed join must not shuffle"
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
