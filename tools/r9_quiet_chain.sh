#!/bin/bash
# Round-9 quiet-window measurement chain (nothing else may run):
# interleaved graft/DuckDB windows for the two weak spines, the
# at-scale concurrency probe, and the 1.4 GiB bloom-remap regression
# check.
cd /root/repo
export SPARK_DRIVER_MEM=48g
ORACLE=target/verify_out/oracle_sql.json
python3 tools/interleave_bench.py target/bigdata15 $ORACLE q_join_agg 3 \
  > /tmp/interleave_joinagg_r9.log 2>&1
python3 tools/interleave_bench.py target/bigdata15 $ORACLE q_semi_idlist 3 \
  > /tmp/interleave_semi_r9.log 2>&1
SPARK_DRIVER_MEM=72g tools/run_main.sh graft.tools.ConcurrentBenchProbe \
  target/bigdata15 2 target/bigdata \
  > /tmp/concurrent15_r9.log 2>&1
tools/run_main.sh graft.tools.BloomProbe target/bigdata \
  q_semi_idlist,q_anti_missing,q_join_agg bloom,bloom15m \
  > /tmp/bloom14_regress_r9.log 2>&1
echo ALLDONE > /tmp/r9_quiet_done
