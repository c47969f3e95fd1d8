"""S10: JSON fixture source — schema-stable JSON read/write
round-trip (reference `tests/fixtures/sample_data.json`)."""

from __future__ import annotations

from pyspark.sql import functions as F

from feature_store_spark.tables import load_table


def test_json_source_roundtrip(spark, sf_dir, tmp_path):
    path = str(tmp_path / "events_json")
    ev = load_table(spark, sf_dir, "events").limit(200)
    ev.write.mode("overwrite").json(path)
    back = spark.read.schema(ev.schema).json(path)
    assert back.count() == 200
    assert back.schema == ev.schema
    a = {r["event_id"] for r in ev.select("event_id").collect()}
    b = {r["event_id"] for r in back.select("event_id").collect()}
    assert a == b


def test_json_fixture_literal(spark, tmp_path):
    fixture = tmp_path / "sample.json"
    fixture.write_text(
        '{"user_id": 1, "segment": "BUILDING", "total_orders": 3}\n'
        '{"user_id": 2, "segment": "MACHINERY", "total_orders": 0}\n'
    )
    df = spark.read.json(str(fixture))
    assert df.count() == 2
    assert df.filter(F.col("total_orders") == 0).count() == 1
