#!/bin/bash
# Round-15 close chain: sf0.1 final-tree triplet (132-query set — the
# three tokenizer-product gates join this round), then the 15.7 GiB
# 30-query subset pair — the r9-r14 gate form (interleaved G→D→G,
# per-query-min merge of the two graft windows).
set -e
cd /root/repo
A=docs/artifacts
SUBSET="q1_agg,q_anti_missing,q_asof_broadcast,q_asof_join,q_asof_native,q_bm25,q_contamination,q_counts,q_dedup_exact,q_dedupe_lastwins,q_distinct_ids,q_except_ids,q_intersect_ids,q_join_agg,q_lang_id,q_lm_score,q_minhash_oracle,q_ngram_jaccard,q_outer_join,q_quality,q_range_join,q_scan_project,q_semdedup,q_semi_idlist,q_sessionize,q_simhash_oracle,q_topk_per_group,q_union_schema,q_window_hourly,q_window_users"

SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=24g \
  tools/run_main.sh graft.Bench 2>/tmp/bench_sf01_w1.err | tail -1 \
  > $A/bench_r15_final_sf01.json
echo "sf01 w1 done"

python3 tools/duck_bench.py /root/testdata/sf0.1 target/verify_sf01_r15 32 \
  2>/tmp/duck_sf01.err | tail -1 > $A/duck_bench_r15_final_sf01.json
echo "sf01 duck done"

SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=24g \
  tools/run_main.sh graft.Bench 2>/tmp/bench_sf01_w2.err | tail -1 \
  > $A/bench_r15_final_sf01_w2.json
echo "sf01 w2 done"

python3 /tmp/merge_bench.py $A/bench_r15_final_sf01.json \
  $A/bench_r15_final_sf01_w2.json $A/bench_r15_final_sf01_merged.json

SPARK_GRAFT_SF_DIR=target/bigdata15 SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=72g \
  SPARK_GRAFT_PASSES=2 SPARK_GRAFT_ONLY="$SUBSET" \
  tools/run_main.sh graft.Bench 2>/tmp/bench_bd15_w1.err | tail -1 \
  > $A/bench_r15_bigdata15.json
echo "bd15 w1 done"

DUCK_BENCH_PASSES=2 python3 tools/duck_bench.py target/bigdata15 \
  target/duck15_r15 32 2>/tmp/duck_bd15.err | tail -1 \
  > $A/duck_bench_r15_bigdata15.json
echo "bd15 duck done"

SPARK_GRAFT_SF_DIR=target/bigdata15 SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=72g \
  SPARK_GRAFT_PASSES=2 SPARK_GRAFT_ONLY="$SUBSET" \
  tools/run_main.sh graft.Bench 2>/tmp/bench_bd15_w2.err | tail -1 \
  > $A/bench_r15_bigdata15_w2.json
echo "bd15 w2 done"

python3 /tmp/merge_bench.py $A/bench_r15_bigdata15.json \
  $A/bench_r15_bigdata15_w2.json $A/bench_r15_bigdata15_merged.json
echo ALLDONE
