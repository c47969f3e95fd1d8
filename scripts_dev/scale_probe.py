#!/usr/bin/env python
"""Scale probe: run the feature pipelines at the reference's seed
scale (2M users × 5 orders — `scripts/seed_data.py:504-505` /
Makefile seed-data) using the synthetic generator, far above the
sf0.1 fixtures. Records wall times + shuffle behavior sanity.

  python scripts_dev/scale_probe.py [n_users]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> int:
    n_users = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    from feature_store_spark.operators.aggregates import mode_deterministic
    from feature_store_spark.pipelines.sinks import (
        generate_synthetic_orders,
        generate_synthetic_users,
    )
    from feature_store_spark.session import get_spark

    spark = get_spark("scale_probe")
    t0 = time.perf_counter()
    users = generate_synthetic_users(spark, n_users)
    orders = generate_synthetic_orders(spark, n_users, 5)

    # user-features shape: agg over join + mode + coalesce projection
    stats = (
        orders.filter(F.col("status") == "completed")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("total_orders"),
            F.round(
                F.sum(F.round(F.col("amount") * 100).cast("bigint")) / 100.0
                / F.count(F.lit(1)),
                2,
            ).alias("avg_order_value"),
            F.min("created_at").alias("first_order"),
        )
    )
    pref = mode_deterministic(
        orders.filter(F.col("status") == "completed"),
        ["user_id"],
        "status",
        "pref",
    )
    uf = (
        users.join(stats, "user_id", "left")
        .join(pref, "user_id", "left")
        .select(
            "user_id",
            "segment",
            F.coalesce("total_orders", F.lit(0)).alias("total_orders"),
            F.coalesce("avg_order_value", F.lit(0.0)).alias("avg_order_value"),
        )
    )
    uf.write.format("noop").mode("overwrite").save()
    t_derive = time.perf_counter() - t0

    t0 = time.perf_counter()
    top = uf.orderBy(F.col("avg_order_value").desc()).limit(100).collect()
    t_topk = time.perf_counter() - t0

    rows = uf.count()
    print(
        f"n_users={n_users} rows={rows} derive+noop={t_derive:.1f}s "
        f"topk={t_topk:.1f}s throughput={rows / t_derive / 1e6:.2f}M rows/s"
    )
    assert rows == n_users
    assert len(top) == 100
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
