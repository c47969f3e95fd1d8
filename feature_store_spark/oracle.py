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
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{round(v, ROUND_DIGITS):.{ROUND_DIGITS}f}".rstrip("0").rstrip(".")
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ")
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


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> dict[str, Any]:
    """Run both sides, return a comparison report dict."""
    s_cols = list(spark_df.columns)
    s_rows = [tuple(r) for r in spark_df.collect()]
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
    """Debug helper: first n differing normalized rows from each side."""
    s_cols = list(spark_df.columns)
    s_rows = normalize_rows(s_cols, [tuple(r) for r in spark_df.collect()])
    rel = con.execute(sql)
    d_cols = [d[0] for d in rel.description]
    d_rows = normalize_rows(d_cols, rel.fetchall())
    only_s = [r for r in s_rows if r not in set(d_rows)][:n]
    only_d = [r for r in d_rows if r not in set(s_rows)][:n]
    return {"spark_only": only_s, "duck_only": only_d,
            "spark_cols": sorted(s_cols), "duck_cols": sorted(d_cols)}
