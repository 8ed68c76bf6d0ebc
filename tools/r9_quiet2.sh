#!/bin/bash
# Round-9 quiet chain 2: re-measure the shipped semi path after the
# expected*/numBits fallback fix, the 1.4 GiB alternating bloom A/B,
# and cross-regime concurrency with a truly sub-threshold second dir.
cd /root/repo
export SPARK_DRIVER_MEM=48g
python3 tools/interleave_bench.py target/bigdata15 \
  target/verify_out/oracle_sql.json q_semi_idlist 3 \
  > /tmp/interleave_semi2_r9.log 2>&1
tools/run_main.sh graft.tools.BloomProbe target/bigdata \
  q_semi_idlist bloom,bloom15m,bloom,bloom15m \
  > /tmp/bloom14_ab_r9.log 2>&1
SPARK_DRIVER_MEM=72g tools/run_main.sh graft.tools.ConcurrentBenchProbe \
  target/bigdata15 1 /root/testdata/sf0.1 \
  > /tmp/concurrent15b_r9.log 2>&1
echo ALLDONE > /tmp/r9_quiet2_done
