#!/bin/bash
# Round-13 close chain: sf0.1 final-tree pair (116-query set — the two
# composed-curation queries join this round), then the 15.7 GiB
# 30-query subset (graft two windows + same-day DuckDB) — the r9-r12
# gate form.
cd /root/repo
SUBSET="q1_agg,q_anti_missing,q_asof_broadcast,q_asof_join,q_asof_native,q_bm25,q_contamination,q_counts,q_dedup_exact,q_dedupe_lastwins,q_distinct_ids,q_except_ids,q_intersect_ids,q_join_agg,q_lang_id,q_lm_score,q_minhash_oracle,q_ngram_jaccard,q_outer_join,q_quality,q_range_join,q_scan_project,q_semdedup,q_semi_idlist,q_sessionize,q_simhash_oracle,q_topk_per_group,q_union_schema,q_window_hourly,q_window_users"

SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  tools/run_main.sh graft.Bench > /tmp/bench_r13_sf01.log 2>&1

python3 tools/duck_bench.py /root/testdata/sf0.1 target/verify_final_r13 \
  > /tmp/duck_bench_r13_sf01.log 2>&1

SPARK_GRAFT_SF_DIR=target/bigdata15 SPARK_GRAFT_CPUS=32 \
  SPARK_DRIVER_MEM=72g SPARK_GRAFT_PASSES=2 SPARK_GRAFT_ONLY="$SUBSET" \
  tools/run_main.sh graft.Bench > /tmp/bench_r13_bigdata15.log 2>&1

DUCK_BENCH_PASSES=2 python3 tools/duck_bench.py target/bigdata15 \
  target/duck15_r12 > /tmp/duck_bench_r13_bigdata15.log 2>&1

SPARK_GRAFT_SF_DIR=target/bigdata15 SPARK_GRAFT_CPUS=32 \
  SPARK_DRIVER_MEM=72g SPARK_GRAFT_PASSES=2 SPARK_GRAFT_ONLY="$SUBSET" \
  tools/run_main.sh graft.Bench > /tmp/bench_r13_bigdata15_w2.log 2>&1

echo ALLDONE > /tmp/r13_bench_done
