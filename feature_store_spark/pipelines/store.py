"""Materialized feature-store serving path.

The reference serves the uf ⟕ tf ⟕ rf join from STORED feature tables
(`sql/migration_queries.sql:143-166`, `src/pipelines/batch_pipeline.py`
writes them daily), not by re-deriving from raw facts per request.
This module reproduces that shape Spark-first: the three feature
tables are written once as parquet tables **bucketed and sorted by
user_id**, so the serving join is co-located — zero Exchange, zero
Sort on the join path (pinned by
tests/test_plans.py::test_store_serving_join_no_exchange).

At 100 TB this is the difference between re-shuffling three
multi-billion-row feature tables per serving batch and a pure
map-side merge: bucketing is Spark's static co-partitioning contract
(`spark.sql.sources.bucketing.enabled`), the same lever the reference
pulls with its clustered/primary-keyed PostgreSQL feature tables.

Bucket count: 8 in local tests; on a cluster set ~1 bucket per
100-200 MB of feature-table data. All three tables MUST share the
bucket count — mismatched bucketing reintroduces the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from feature_store_spark.pipelines.features import (
    derive_risk_features,
    derive_transaction_features,
    derive_user_features,
    serving_join,
)
from feature_store_spark.tables import EVENTS_NOW, REF_DATE, load_table

FEATURE_TABLES = ("user_features", "transaction_features", "risk_features")
DEFAULT_BUCKETS = 8


def _table_name(
    kind: str,
    sf_dir: str,
    n_buckets: int = DEFAULT_BUCKETS,
    ref_date: str = REF_DATE,
    now: str = EVENTS_NOW,
) -> str:
    # one catalog namespace per (fixture dir, derivation parameters):
    # the exists-check reuse below would otherwise silently serve
    # features computed for a DIFFERENT ref_date/now/bucket-count —
    # stale data that looks fresh. The readable slug is for humans;
    # the md5 of the RAW parameter tuple makes the mapping injective
    # (character sanitization alone would collide e.g. 'data/sf0.1'
    # with 'data_sf0_1' and serve the wrong fixture's features), and
    # the absolute path collapses relative-vs-absolute duplicates of
    # the same directory.
    import hashlib
    import os

    raw = f"{os.path.abspath(sf_dir)}|{n_buckets}|{ref_date}|{now}"
    digest = hashlib.md5(raw.encode()).hexdigest()[:10]
    slug = "".join(
        c if c.isalnum() else "_"
        for c in f"{os.path.basename(sf_dir.strip('/'))}_{n_buckets}"
    )
    return f"fs_{kind}_{slug}_{digest}"


def materialize_feature_store(
    spark: SparkSession,
    sf_dir: str,
    n_buckets: int = DEFAULT_BUCKETS,
    ref_date: str = REF_DATE,
    now: str = EVENTS_NOW,
) -> dict[str, str]:
    """Derive the three feature tables from the raw fixtures and write
    each as a parquet table bucketed+sorted by user_id (idempotent per
    session: existing tables are reused). Returns {kind: table_name}.
    """
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    events = load_table(spark, sf_dir, "events")
    frames = {
        "user_features": derive_user_features(customer, orders, ref_date),
        "transaction_features": derive_transaction_features(
            orders, lineitem, ref_date
        ),
        "risk_features": derive_risk_features(
            customer, orders, lineitem, events, ref_date, now
        ),
    }
    # External tables with an explicit path: the default in-memory
    # catalog forgets tables across sessions while their managed
    # location survives, and a managed saveAsTable then refuses with
    # LOCATION_ALREADY_EXISTS. An explicit path + overwrite is
    # restart-safe (and is how a real lake would pin table locations).
    warehouse = spark.conf.get("spark.sql.warehouse.dir")
    names: dict[str, str] = {}
    for kind, df in frames.items():
        name = _table_name(kind, sf_dir, n_buckets, ref_date, now)
        if not spark.catalog.tableExists(name):
            # one file per bucket: Spark honors the bucket sortBy order
            # at read time only when each bucket is a single file, and
            # repartition() hashes with the same Murmur3 the bucketing
            # spec uses — without this the serving join re-Sorts.
            (
                df.repartition(n_buckets, "user_id")
                .write.format("parquet")
                .bucketBy(n_buckets, "user_id")
                .sortBy("user_id")
                .option("path", f"{warehouse.rstrip('/')}/{name}__data")
                .mode("overwrite")
                .saveAsTable(name)
            )
        names[kind] = name
    return names


def serving_from_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The serving join read from the materialized bucketed feature
    tables — the realistic request-path shape (feature tables are
    written daily, served many times). Result is identical to
    ``pipeline_serving_join`` (same derivations, same join)."""
    names = materialize_feature_store(spark, sf_dir)
    uf = spark.table(names["user_features"])
    tf = spark.table(names["transaction_features"])
    rf = spark.table(names["risk_features"])
    return serving_join(uf, tf, rf)
