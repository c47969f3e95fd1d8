#!/usr/bin/env python
"""Structured-Streaming throughput probe: sustained rows/sec of the
two stateful streaming operators (ST5 sliding velocity windows, ST7
session windows) against the `rate` source on local[32].

  python scripts_dev/stream_throughput_probe.py [rows_per_sec] [secs]

Why this matters for 100 TB/day ingest: both operators keep bounded
state (watermarked windows / session gap), so the scaling question is
pure throughput per core — the cluster answer is the same pipeline
with more shuffle partitions. The probe reports the steady-state
`processedRowsPerSecond` from the query's own progress events
(ignoring the first warm-up batches) so the number is the engine's,
not the driver's clock arithmetic.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def synth_events(rate_df):
    """Deterministic event columns from the rate source's (timestamp,
    value) — same shape as the events fixture."""
    v = F.col("value")
    return rate_df.select(
        v.alias("event_id"),
        F.col("timestamp").alias("ts"),
        (v % 100_000).alias("user_id"),
        F.element_at(
            F.array(
                F.lit("purchase"),
                F.lit("view"),
                F.lit("click"),
                F.lit("error"),
                F.lit("login"),
            ),
            (v % 5 + 1).cast("int"),
        ).alias("event_type"),
        (v % 10_000).cast("double").alias("value"),
        F.concat(F.lit("loc"), (v % 50).cast("string")).alias("props"),
    )


def run_probe(spark, make_stream, label, rows_per_sec, secs, mode="update"):
    # session windows only support append (sessions merge, so a row is
    # final only once the watermark closes it); throughput is measured
    # on INPUT rows consumed, which append mode still reports
    ckpt = tempfile.mkdtemp(prefix=f"stream_probe_{label}_")
    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_sec)
        .option("numPartitions", 8)
        .load()
    )
    q = (
        make_stream(synth_events(rate))
        .writeStream.format("noop")
        .outputMode(mode)
        .option("checkpointLocation", ckpt)
        .start()
    )
    time.sleep(secs)
    rates = [
        p["processedRowsPerSecond"]
        for p in (q.recentProgress or [])
        if p.get("numInputRows", 0) > 0
    ]
    q.stop()
    shutil.rmtree(ckpt, ignore_errors=True)
    # drop warm-up batches (JIT + state-store open): keep the back half
    steady = rates[len(rates) // 2 :] if rates else []
    sustained = sum(steady) / len(steady) if steady else 0.0
    print(
        f"{label}: offered={rows_per_sec}/s sustained={sustained:,.0f}/s "
        f"batches={len(rates)}"
    )
    return sustained


def main() -> int:
    rows_per_sec = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    secs = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    from feature_store_spark.session import get_spark
    from feature_store_spark.streaming.pipeline import (
        session_windows_stream,
        velocity_windows_stream,
    )

    spark = get_spark(
        "stream_throughput_probe",
        shuffle_partitions=16,
        extra_conf={
            # RocksDB keeps large window/session state off-heap and
            # incremental — the cluster choice for stateful streams
            "spark.sql.streaming.stateStore.providerClass": (
                "org.apache.spark.sql.execution.streaming.state."
                "RocksDBStateStoreProvider"
            ),
        },
    )
    v = run_probe(
        spark, velocity_windows_stream, "velocity_1h_5m", rows_per_sec, secs
    )
    s = run_probe(
        spark,
        session_windows_stream,
        "sessions_30m",
        rows_per_sec,
        secs,
        mode="append",
    )
    # floor assertion: both operators must sustain ≥100k rows/s on one
    # node or the 100 TB/day story (≈1.2M rows/s cluster-wide at 1 KB
    # rows) needs more than ~12 such nodes
    assert v > 100_000 and s > 100_000, (v, s)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
