"""Differential tests: every registered query vs its DuckDB oracle —
the local mirror of the driver's t2 correctness gate."""

from __future__ import annotations

import pytest

from feature_store_spark.oracle import compare, first_diff
from feature_store_spark.queries import SPECS, all_queries

all_queries()  # register extension specs before parametrization

ORACLE_NAMES = sorted(n for n, s in SPECS.items() if s.sql is not None)
ROWS_ONLY_NAMES = sorted(n for n, s in SPECS.items() if s.sql is None)


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_matches_oracle(spark, duck, sf_dir, name):
    spec = SPECS[name]
    df = spec.fn(spark, sf_dir)
    report = compare(df, duck, spec.sql)
    if not report["ok"]:
        diff = first_diff(spec.fn(spark, sf_dir), duck, spec.sql)
        pytest.fail(f"{name}: {report}\ndiff: {diff}")


@pytest.mark.parametrize("name", ROWS_ONLY_NAMES)
def test_rows_only_query_runs(spark, sf_dir, name):
    spec = SPECS[name]
    df = spec.fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    qs = e.queries()
    sqls = e.oracle_sql()
    assert set(sqls) <= set(qs)
    assert len(qs) >= 10
