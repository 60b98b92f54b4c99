#!/bin/bash
# Round-10 evidence chain: full tests, both PLANS, full-surface sweeps
# (sf0.1 3-rep / sf1 2-rep / sf5 2-rep + sf5 labels-mode), full
# InvariantCheck at sf1 AND sf5. Serial — never two sbt JVMs at once.
cd /root/repo
LOG=/tmp/r10_chain.log
step() { echo "=== $(date +%H:%M:%S) $1" >> $LOG; }

step "sbt test"
sbt -batch test > /tmp/r10_test.log 2>&1
echo "test exit=$?" >> $LOG

step "PLANS static sf0.01"
sbt -batch "runMain graft.tools.Plans /root/testdata/sf0.01 PLANS.md" \
  > /tmp/r10_plans.log 2>&1
echo "plans exit=$?" >> $LOG

step "bench sf0.1 3-rep"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_BENCH_REPS=3 SPARK_GRAFT_OUT=bench_sf01_r10.json \
  sbt -batch "runMain graft.Bench" > /tmp/r10_b01.log 2>&1
echo "b01 exit=$?" >> $LOG

step "bench sf1 2-rep"
SPARK_GRAFT_SF_DIR=/root/repo/testdata/sf1 SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_BENCH_REPS=2 SPARK_GRAFT_OUT=bench_sf1_r10.json \
  sbt -batch "runMain graft.Bench" > /tmp/r10_b1.log 2>&1
echo "b1 exit=$?" >> $LOG

step "bench sf5 2-rep"
SPARK_GRAFT_SF_DIR=/root/repo/testdata/sf5 SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_BENCH_REPS=2 SPARK_GRAFT_OUT=bench_sf5_r10.json \
  sbt -batch "runMain graft.Bench" > /tmp/r10_b5.log 2>&1
echo "b5 exit=$?" >> $LOG

step "bench sf5 labels-mode 2-rep"
SPARK_GRAFT_SF_DIR=/root/repo/testdata/sf5 SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_BENCH_REPS=2 SPARK_GRAFT_OUT=bench_sf5_labels_r10.json \
SPARK_GRAFT_LABELS_TABLE=graft_labels_r10 \
  sbt -batch "runMain graft.Bench" > /tmp/r10_b5l.log 2>&1
echo "b5l exit=$?" >> $LOG

step "PLANS sf1 executed"
sbt -batch "runMain graft.tools.Plans /root/repo/testdata/sf1 PLANS_sf1.md executed" \
  > /tmp/r10_plans1.log 2>&1
echo "plans1 exit=$?" >> $LOG

step "InvariantCheck sf1 full"
SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.tools.InvariantCheck /root/repo/testdata/sf1" \
  > /tmp/r10_inv1.log 2>&1
echo "inv1 exit=$?" >> $LOG

step "InvariantCheck sf5 full"
SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.tools.InvariantCheck /root/repo/testdata/sf5" \
  > /tmp/r10_inv5.log 2>&1
echo "inv5 exit=$?" >> $LOG

step "chain done"
