"""Differential-test harness: PySpark result vs DuckDB oracle.

Mirrors the driver's t2 check (SURVEY.md §5): run the engine query and
the declared ANSI-SQL oracle over the same parquet fixtures, then
compare row count, column names, and an order-insensitive value hash
after normalization (doubles rounded, timestamps to ISO strings,
Decimal → float). Used by tests/ so pytest-green locally predicts
driver-green.
"""

from __future__ import annotations

import datetime as _dt
import decimal
import hashlib
import math
from typing import Any

import duckdb

from feature_store_spark.tables import TABLE_NAMES

ROUND_DIGITS = 6


def _norm_value(v: Any) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if math.isinf(v):  # before int(v): int(inf) raises
            return "inf" if v > 0 else "-inf"
        if v == 0:
            v = 0.0  # -0.0 and +1e-9 must both normalize to "0"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        r = round(v, ROUND_DIGITS)
        if r == 0:
            return "0"  # round(-1e-9, 6) is -0.0 → would print "-0"
        return f"{r:.{ROUND_DIGITS}f}".rstrip("0").rstrip(".")
    if isinstance(v, _dt.datetime):
        # fixed-width micros to match the JVM-side date_format used for
        # Spark timestamps (see _stringify_timestamps)
        return v.replace(tzinfo=None).strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_value(x) for x in v) + "]"
    return str(v)


def normalize_rows(columns: list[str], rows: list[tuple]) -> list[str]:
    """Rows → canonical strings, columns sorted by name, rows sorted."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = ["|".join(_norm_value(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def value_hash(columns: list[str], rows: list[tuple]) -> str:
    h = hashlib.sha256()
    for line in normalize_rows(columns, rows):
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Connection with every fixture table registered as a view, the
    way the driver pre-registers them."""
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
        )
    return con


def _stringify_timestamps(df):
    """Format timestamp columns JVM-side (session timezone = UTC)
    before collect(): PySpark's TimestampType.fromInternal converts
    through the driver's OS-LOCAL timezone (datetime.fromtimestamp),
    which spark.sql.session.timeZone does not control — on a non-UTC
    box every collected timestamp would shift relative to DuckDB's
    naive stored values."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import TimestampType

    if not any(
        isinstance(f.dataType, TimestampType) for f in df.schema.fields
    ):
        return df
    return df.select(
        *[
            F.date_format(F.col(f.name), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
                f.name
            )
            if isinstance(f.dataType, TimestampType)
            else F.col(f.name)
            for f in df.schema.fields
        ]
    )


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> dict[str, Any]:
    """Run both sides, return a comparison report dict."""
    s_cols = list(spark_df.columns)
    s_rows = [tuple(r) for r in _stringify_timestamps(spark_df).collect()]
    rel = con.execute(sql)
    d_cols = [d[0] for d in rel.description]
    d_rows = rel.fetchall()
    report = {
        "spark_rows": len(s_rows),
        "duck_rows": len(d_rows),
        "spark_cols": sorted(s_cols),
        "duck_cols": sorted(d_cols),
        "rows_match": len(s_rows) == len(d_rows),
        "cols_match": sorted(s_cols) == sorted(d_cols),
        "hash_match": value_hash(s_cols, s_rows) == value_hash(d_cols, d_rows),
    }
    report["ok"] = (
        report["rows_match"] and report["cols_match"] and report["hash_match"]
    )
    return report


def first_diff(spark_df, con: duckdb.DuckDBPyConnection, sql: str, n: int = 5):
    """Debug helper: first n differing normalized rows from each side,
    multiplicity-aware (a duplicated row counts as a diff)."""
    from collections import Counter

    s_cols = list(spark_df.columns)
    s_rows = normalize_rows(
        s_cols, [tuple(r) for r in _stringify_timestamps(spark_df).collect()]
    )
    rel = con.execute(sql)
    d_cols = [d[0] for d in rel.description]
    d_rows = normalize_rows(d_cols, rel.fetchall())
    s_count, d_count = Counter(s_rows), Counter(d_rows)
    only_s = sorted((s_count - d_count).elements())[:n]
    only_d = sorted((d_count - s_count).elements())[:n]
    return {"spark_only": only_s, "duck_only": only_d,
            "spark_cols": sorted(s_cols), "duck_cols": sorted(d_cols)}
