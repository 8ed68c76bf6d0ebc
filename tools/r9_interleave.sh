#!/bin/bash
# Round-9 interleaved cross-engine windows + at-scale concurrency.
cd /root/repo
export SPARK_DRIVER_MEM=48g
ORACLE=target/verify_final4/oracle_sql.json
python3 tools/interleave_bench.py target/bigdata15 $ORACLE q_join_agg 3 \
  > /tmp/interleave_joinagg_r9.log 2>&1
python3 tools/interleave_bench.py target/bigdata15 $ORACLE q_semi_idlist 3 \
  > /tmp/interleave_semi_r9.log 2>&1
SPARK_DRIVER_MEM=72g tools/run_main.sh graft.tools.ConcurrentBenchProbe \
  target/bigdata15 2 target/bigdata \
  > /tmp/concurrent15_r9.log 2>&1
echo ALLDONE > /tmp/r9_interleave_done
