#!/bin/bash
# Round-9 quiet chain 3: shipped-path q_semi_idlist after the
# size-classed bloom sizing, at both at-scale points.
cd /root/repo
export SPARK_DRIVER_MEM=48g
python3 tools/interleave_bench.py target/bigdata \
  target/verify_out/oracle_sql.json q_semi_idlist 3 \
  > /tmp/interleave_semi14_r9.log 2>&1
python3 tools/interleave_bench.py target/bigdata15 \
  target/verify_out/oracle_sql.json q_semi_idlist 3 \
  > /tmp/interleave_semi15_r9.log 2>&1
echo ALLDONE > /tmp/r9_quiet3_done
