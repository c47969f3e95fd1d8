"""Kafka wiring tests. This container ships WITHOUT the
spark-sql-kafka connector jar (documented in README §limitations), so
by default the builders must fail with an actionable error and the
JSON payload schema must parse the reference event shape. When the
jar IS on the classpath, the connector-present branch below
round-trips one real micro-batch through a broker (opt-in via
SPARK_GRAFT_KAFKA_BROKER — an embedded broker cannot be vendored
here: no kafka distribution in the container, no network installs)."""

from __future__ import annotations

import json
import os
import uuid

import pytest

from pyspark.sql import functions as F

from feature_store_spark.streaming.kafka import (
    EVENT_JSON_SCHEMA,
    kafka_available,
    kafka_event_stream,
    kafka_publish,
)


def test_builders_error_without_connector(spark):
    if kafka_available(spark):
        pytest.skip("connector present; builders would start real streams")
    with pytest.raises(RuntimeError, match="spark-sql-kafka"):
        kafka_event_stream(spark, "localhost:9092")
    df = spark.createDataFrame([(1, 2.0)], "user_id long, score double")
    with pytest.raises(RuntimeError, match="spark-sql-kafka"):
        kafka_publish(df, "localhost:9092", "t", "/tmp/ckpt-nonexistent")


def test_kafka_round_trip_when_connector_present(spark, tmp_path):
    """Connector-present branch: publish one batch of reference-shaped
    events to a real broker and consume them back through
    kafka_event_stream in one availableNow micro-batch. Runs only with
    the jar on the classpath AND SPARK_GRAFT_KAFKA_BROKER set (the
    container has neither a connector jar nor a broker — README
    documents the gap; the file-replay twin covers the streaming
    semantics either way)."""
    if not kafka_available(spark):
        pytest.skip(
            "spark-sql-kafka connector jar absent (documented gap: "
            "README §limitations; file-replay twin covers semantics)"
        )
    broker = os.environ.get("SPARK_GRAFT_KAFKA_BROKER")
    if not broker:
        pytest.skip(
            "connector present but no broker configured; set "
            "SPARK_GRAFT_KAFKA_BROKER=host:port to run the round-trip"
        )
    topic = f"fs-roundtrip-{uuid.uuid4().hex[:8]}"
    events = spark.createDataFrame(
        [
            (1, "2024-01-15T12:00:00", 42, "purchase", 19.99, "{}"),
            (2, "2024-01-15T12:00:01", 43, "error", None, "{}"),
        ],
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    )
    (
        events.select(
            F.col("user_id").cast("string").alias("key"),
            F.to_json(F.struct(*events.columns)).alias("value"),
        )
        .write.format("kafka")
        .option("kafka.bootstrap.servers", broker)
        .option("topic", topic)
        .save()
    )
    name = f"kafka_rt_{uuid.uuid4().hex[:8]}"
    q = (
        kafka_event_stream(
            spark, broker, topic=topic, starting_offsets="earliest"
        )
        .writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["event_id"]: r for r in spark.sql(f"SELECT * FROM {name}").collect()
    }
    assert set(got) == {1, 2}
    assert got[1]["user_id"] == 42 and got[1]["event_type"] == "purchase"
    assert abs(got[1]["value"] - 19.99) < 1e-9
    assert got[2]["value"] is None  # NULL survives the JSON round-trip


def test_event_json_schema_parses_reference_shape(spark):
    payload = json.dumps(
        {
            "event_id": 7,
            "ts": "2024-01-15T12:34:56",
            "user_id": 42,
            "event_type": "purchase",
            "value": 19.99,
            "props": "{\"k\": 3}",
        }
    )
    df = spark.createDataFrame([(payload,)], "value string").select(
        F.from_json("value", EVENT_JSON_SCHEMA).alias("e")
    )
    row = df.select("e.*").collect()[0]
    assert row["event_id"] == 7
    assert row["user_id"] == 42
    assert row["event_type"] == "purchase"
    assert abs(row["value"] - 19.99) < 1e-9
