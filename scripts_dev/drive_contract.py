"""Driver-contract simulation: fresh import of __spark_entry__,
entry() smoke at sf0.001, then every queries() entry vs oracle_sql()
at sf0.01 (the round driver's correctness scale)."""
import sys

sys.path.insert(0, "/root/repo")
import __spark_entry__ as E
from feature_store_spark.oracle import compare, duckdb_connection
from feature_store_spark.session import get_spark

spark = get_spark("drive_contract", shuffle_partitions=8)

df = E.entry(spark)
n = df.count()
assert n > 0, "entry() returned 0 rows"
print(f"entry(): {n} rows, schema ok")

SF = "/root/testdata/sf0.01"
duck = duckdb_connection(SF)
qs = E.queries()
oracles = E.oracle_sql()
bad = []
for name, fn in sorted(qs.items()):
    sql = oracles.get(name)
    out = fn(spark, SF)
    if sql is None:
        cnt = out.count()
        print(f"{name:34s} rows-only: {cnt} rows")
        continue
    rep = compare(out, duck, sql)
    tag = "OK" if rep["ok"] else f"FAIL {rep}"
    print(f"{name:34s} {tag}")
    if not rep["ok"]:
        bad.append(name)
print("RESULT:", "ALL MATCH" if not bad else f"MISMATCH: {bad}")
spark.stop()
sys.exit(1 if bad else 0)
