#!/usr/bin/env python
"""Replicate the sf0.1 fixtures 10x with key shifts into /tmp/sfbig
(sf~1): the input for scripts_dev/scaling_race.py."""
import duckdb, os, shutil
SRC = "/root/testdata/sf0.1"; DST = "/tmp/sfbig"
os.makedirs(DST, exist_ok=True)
con = duckdb.connect(); REPS = 10
mx = {}
mx["ok"] = con.execute(f"SELECT max(o_orderkey)+1 FROM '{SRC}/orders.parquet'").fetchone()[0]
mx["ck"] = con.execute(f"SELECT max(c_custkey)+1 FROM '{SRC}/customer.parquet'").fetchone()[0]
mx["ev"] = con.execute(f"SELECT max(event_id)+1 FROM '{SRC}/events.parquet'").fetchone()[0]
mx["uid"] = max(con.execute(f"SELECT max(user_id)+1 FROM '{SRC}/events.parquet'").fetchone()[0], mx["ck"])
def rep(table, select):
    parts = " UNION ALL ".join(select.format(i=i, **mx) for i in range(REPS))
    con.execute(f"COPY ({parts}) TO '{DST}/{table}.parquet' (FORMAT PARQUET)")
    print(table, con.execute(f"SELECT count(*) FROM '{DST}/{table}.parquet'").fetchone()[0])
rep("customer", f"SELECT c_custkey + {{i}} * {{ck}} AS c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment FROM '{SRC}/customer.parquet'")
rep("orders", f"SELECT o_orderkey + {{i}} * {{ok}} AS o_orderkey, o_custkey + {{i}} * {{ck}} AS o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority FROM '{SRC}/orders.parquet'")
rep("lineitem", f"SELECT l_orderkey + {{i}} * {{ok}} AS l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate FROM '{SRC}/lineitem.parquet'")
rep("events", f"SELECT event_id + {{i}} * {{ev}} AS event_id, ts, user_id + {{i}} * {{uid}} AS user_id, event_type, value, props FROM '{SRC}/events.parquet'")
# documents: 10x with a replica-suffix token appended to every text —
# preserves each replica's internal near-dup structure (a shared
# suffix token shifts all shingle sets of one replica identically)
# while preventing the cross-replica exact-dup explosion verbatim
# copies would create (every doc would gain 9 twins; pair counts and
# LSH bucket sizes would grow 45x instead of 10x).
mx["doc"] = con.execute(f"SELECT max(doc_id)+1 FROM '{SRC}/documents.parquet'").fetchone()[0]
doc_cols = [d[0] for d in con.execute(f"SELECT * FROM '{SRC}/documents.parquet' LIMIT 0").description]
# n_chars must track the suffixed text, not pass through stale
passthru = ", ".join(c for c in doc_cols if c not in ("doc_id", "text", "n_chars"))
rep("documents", f"SELECT doc_id + {{i}} * {{doc}} AS doc_id, text || ' replica{{i}}' AS text, {passthru}, length(text || ' replica{{i}}') AS n_chars FROM '{SRC}/documents.parquet'")
# embeddings: 10x with id offsets; vectors unchanged (timing only —
# the query side stays vec_id < n_queries, i.e. replica-0 vectors).
mx["vec"] = con.execute(f"SELECT max(vec_id)+1 FROM '{SRC}/embeddings.parquet'").fetchone()[0]
emb_cols = [d[0] for d in con.execute(f"SELECT * FROM '{SRC}/embeddings.parquet' LIMIT 0").description]
emb_passthru = ", ".join(c for c in emb_cols if c != "vec_id")
rep("embeddings", f"SELECT vec_id + {{i}} * {{vec}} AS vec_id, {emb_passthru} FROM '{SRC}/embeddings.parquet'")
for t in ("region", "nation", "supplier", "part"):
    shutil.copy(f"{SRC}/{t}.parquet", f"{DST}/{t}.parquet")
print("done")
