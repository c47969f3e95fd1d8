#!/usr/bin/env python
"""Dev loop: compare a subset of specs against the DuckDB oracle at a
small SF without the pytest overhead.

  python scripts_dev/check_specs.py [prefix ...] [--sf DIR]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from feature_store_spark.oracle import compare, duckdb_connection, first_diff
from feature_store_spark.queries import SPECS, all_queries
from feature_store_spark.session import get_spark


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = "/root/testdata/sf0.001"
    for a in sys.argv[1:]:
        if a.startswith("--sf="):
            sf_dir = a.split("=", 1)[1]
    all_queries()
    names = [
        n
        for n in sorted(SPECS)
        if not args or any(n.startswith(p) for p in args)
    ]
    spark = get_spark("check_specs", shuffle_partitions=8)
    con = duckdb_connection(sf_dir)
    failed = []
    for name in names:
        s = SPECS[name]
        t0 = time.perf_counter()
        try:
            if s.sql is None:
                cnt = s.fn(spark, sf_dir).count()
                print(f"{name}: rows-only {cnt} rows "
                      f"({time.perf_counter() - t0:.1f}s)")
                continue
            report = compare(s.fn(spark, sf_dir), con, s.sql)
            dt = time.perf_counter() - t0
            if report["ok"]:
                print(f"{name}: OK {report['spark_rows']} rows ({dt:.1f}s)")
            else:
                failed.append(name)
                print(f"{name}: FAIL {report} ({dt:.1f}s)")
                diff = first_diff(s.fn(spark, sf_dir), con, s.sql)
                print(f"  diff: {diff}")
        except Exception as e:  # noqa: BLE001
            failed.append(name)
            print(f"{name}: ERROR {str(e)[:500]}")
    print(f"\n{len(names) - len(failed)}/{len(names)} ok; failed: {failed}")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
