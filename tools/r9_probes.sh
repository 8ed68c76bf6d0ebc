#!/bin/bash
# Round-9 at-scale probe chain (asks #1/#2): bloom A/B then bucketed spines.
cd /root/repo
export SPARK_DRIVER_MEM=48g
tools/run_main.sh graft.tools.BloomProbe target/bigdata15 q_semi_idlist bloom15m,default > /tmp/bloom15m_r9.log 2>&1
rm -rf /root/repo/spark-warehouse
tools/run_main.sh graft.tools.BucketSpineProbe target/bigdata15 32 3 > /tmp/bucketspine2_r9.log 2>&1
echo ALLDONE > /tmp/probes_r9_done
