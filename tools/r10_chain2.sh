#!/bin/bash
# Round-10 chain v2: re-close the evidence chain on the final code after
# the label localCheckpoint fix (tests, verify, PLANS x2, all sweeps).
cd /root/repo
LOG=/tmp/r10_chain2.log
step() { echo "=== $(date +%H:%M:%S) $1" >> $LOG; }

step "sbt test"
sbt -batch test > /tmp/r10b_test.log 2>&1
echo "test exit=$?" >> $LOG

step "verify sf0.01 full"
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/v10c" > /tmp/r10b_verify.log 2>&1
python3 tools/check.py /root/testdata/sf0.01 /tmp/v10c > /tmp/r10b_check.log 2>&1
echo "verify exit=$? $(tail -1 /tmp/r10b_check.log)" >> $LOG

step "verify sf0.1 label family"
SPARK_GRAFT_ONLY=cluster_size_dist,dedup_clusters,dedup_keep_best,host_quality,make_splits,quality_dup_bias,dedup_clusters_star \
  sbt -batch "runMain graft.Verify /root/testdata/sf0.1 /tmp/v10d" > /tmp/r10b_verify1.log 2>&1
python3 tools/check.py /root/testdata/sf0.1 /tmp/v10d cluster_size_dist,dedup_clusters,dedup_keep_best,host_quality,make_splits,quality_dup_bias,dedup_clusters_star > /tmp/r10b_check1.log 2>&1
echo "verify1 exit=$? $(tail -1 /tmp/r10b_check1.log)" >> $LOG

step "PLANS static sf0.01"
sbt -batch "runMain graft.tools.Plans /root/testdata/sf0.01 PLANS.md" > /tmp/r10b_plans.log 2>&1
echo "plans exit=$?" >> $LOG

step "bench sf0.1 3-rep"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_BENCH_REPS=3 SPARK_GRAFT_OUT=bench_sf01_r10.json \
  sbt -batch "runMain graft.Bench" > /tmp/r10b_b01.log 2>&1
echo "b01 exit=$?" >> $LOG

step "bench sf1 2-rep"
SPARK_GRAFT_SF_DIR=/root/repo/testdata/sf1 SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_BENCH_REPS=2 SPARK_GRAFT_OUT=bench_sf1_r10.json \
  sbt -batch "runMain graft.Bench" > /tmp/r10b_b1.log 2>&1
echo "b1 exit=$?" >> $LOG

step "bench sf5 2-rep"
SPARK_GRAFT_SF_DIR=/root/repo/testdata/sf5 SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_BENCH_REPS=2 SPARK_GRAFT_OUT=bench_sf5_r10.json \
  sbt -batch "runMain graft.Bench" > /tmp/r10b_b5.log 2>&1
echo "b5 exit=$?" >> $LOG

step "bench sf5 labels-mode 2-rep"
SPARK_GRAFT_SF_DIR=/root/repo/testdata/sf5 SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_BENCH_REPS=2 SPARK_GRAFT_OUT=bench_sf5_labels_r10.json \
SPARK_GRAFT_LABELS_TABLE=graft_labels_r10b \
  sbt -batch "runMain graft.Bench" > /tmp/r10b_b5l.log 2>&1
echo "b5l exit=$?" >> $LOG

step "PLANS sf1 executed"
sbt -batch "runMain graft.tools.Plans /root/repo/testdata/sf1 PLANS_sf1.md executed" > /tmp/r10b_plans1.log 2>&1
echo "plans1 exit=$?" >> $LOG

step "chain2 done"
