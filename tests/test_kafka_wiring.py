"""Kafka wiring tests: the connector jar is absent in this container,
so the builders must fail with an actionable error (and the JSON
payload schema must parse the reference event shape)."""

from __future__ import annotations

import json

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
