"""Spark vs DuckDB on the same queries at sf0.1 and sf~1 (10x)."""
import sys, time, os
sys.path.insert(0, "/root/repo")
os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
from feature_store_spark.queries import SPECS, all_queries
from feature_store_spark.oracle import duckdb_connection
from feature_store_spark.session import get_spark
all_queries()
NAMES = ["pipeline_user_features","pipeline_transaction_features","pipeline_risk_features","pipeline_serving_join","a7_stats_outliers","w1_latest_event_per_user","st5_velocity_features","st7_session_features","w7_rolling_spend","w8_scd2_history","a16_hll_sketch_rollup","a20_decayed_features","o7_priority_sample","t_text_stats","t_quality_score","t_vocab_coverage","d_exact_dedup","d_minhash_lsh_pairs","d_simhash_near_dup","sim_cosine_topk","sim_cosine_topk_vectorized","pt_repetition_stats","pt_dup_span_stats","mm_decode_media"]
spark = get_spark("race")
spark.range(1000).selectExpr("sum(id)").collect()
for sf_dir, label in (("/root/testdata/sf0.1", "sf0.1"), ("/tmp/sfbig", "sf1.0")):
    con = duckdb_connection(sf_dir)
    s_tot = d_tot = 0.0
    print(f"== {label} ==")
    for name in NAMES:
        fn = SPECS[name].fn
        sql = SPECS[name].sql
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
        s_best = 1e9
        for _ in range(2):
            t0=time.perf_counter(); fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            s_best = min(s_best, time.perf_counter()-t0)
        con.execute(sql).fetchall()  # warm
        t0=time.perf_counter(); con.execute(sql).fetchall(); d_best = time.perf_counter()-t0
        s_tot += s_best; d_tot += d_best
        print(f"{name}: spark={s_best:.3f} duckdb={d_best:.3f} ratio={s_best/d_best:.1f}x")
    print(f"TOTAL {label}: spark={s_tot:.2f} duckdb={d_tot:.2f} ratio={s_tot/d_tot:.2f}x")
spark.stop()
