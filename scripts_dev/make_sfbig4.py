#!/usr/bin/env python
"""Replicate the /tmp/sfbig fact tables 4x with key shifts into
/tmp/sfbig4 (sf~4): the >sf1 measurement point VERDICT r8 items 3/7
ask for — big enough that the ~0.07 s/stage local scheduling floor
(5 stages ≈ 0.35 s) stops dominating the risk/transaction pipeline
ratios, small enough to build and race inside a session. Dims and the
doc/embedding tables copy through unchanged (the raced queries don't
read them; the oracle needs the views to exist)."""
import duckdb
import os
import shutil

SRC = "/tmp/sfbig"
DST = "/tmp/sfbig4"
os.makedirs(DST, exist_ok=True)
con = duckdb.connect()
REPS = 4
mx = {}
mx["ok"] = con.execute(f"SELECT max(o_orderkey)+1 FROM '{SRC}/orders.parquet'").fetchone()[0]
mx["ck"] = con.execute(f"SELECT max(c_custkey)+1 FROM '{SRC}/customer.parquet'").fetchone()[0]
mx["ev"] = con.execute(f"SELECT max(event_id)+1 FROM '{SRC}/events.parquet'").fetchone()[0]
mx["uid"] = max(
    con.execute(f"SELECT max(user_id)+1 FROM '{SRC}/events.parquet'").fetchone()[0],
    mx["ck"],
)


def rep(table, select):
    parts = " UNION ALL ".join(select.format(i=i, **mx) for i in range(REPS))
    con.execute(f"COPY ({parts}) TO '{DST}/{table}.parquet' (FORMAT PARQUET)")
    print(table, con.execute(f"SELECT count(*) FROM '{DST}/{table}.parquet'").fetchone()[0])


rep("customer", f"SELECT c_custkey + {{i}} * {{ck}} AS c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment FROM '{SRC}/customer.parquet'")
rep("orders", f"SELECT o_orderkey + {{i}} * {{ok}} AS o_orderkey, o_custkey + {{i}} * {{ck}} AS o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority FROM '{SRC}/orders.parquet'")
rep("lineitem", f"SELECT l_orderkey + {{i}} * {{ok}} AS l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate FROM '{SRC}/lineitem.parquet'")
rep("events", f"SELECT event_id + {{i}} * {{ev}} AS event_id, ts, user_id + {{i}} * {{uid}} AS user_id, event_type, value, props FROM '{SRC}/events.parquet'")
for t in ("region", "nation", "supplier", "part", "documents", "embeddings"):
    shutil.copy(f"{SRC}/{t}.parquet", f"{DST}/{t}.parquet")
print("done")
