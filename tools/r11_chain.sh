#!/bin/bash
# Round-11 closing chain: the standing gates (VERDICT r10 items 1+2) +
# the usual evidence chain, all on final code.
#  - full sf0.01 oracle (the driver's gate, mirrored)
#  - NEW standing gate: full-surface sf0.1 oracle (the r10 one-off that
#    caught 3 latent float ties, now permanent) -> CORRECTNESS_sf01_r11.json
#  - NEW standing gate: sf1 oracle, DuckDB-feasible subset bounded by a
#    180 s per-query oracle timeout (skip, not fail) -> CORRECTNESS_sf1_r11.json
#  - NEW standing gate: whole-surface plan invariants (PlanGate, exit 1)
#  - full spec suite, PLANS x2, InvariantCheck, bench sweeps sf0.1/1/5
cd /root/repo
LOG=/tmp/r11_chain.log
step() { echo "=== $(date +%H:%M:%S) $1" >> $LOG; }

step "sbt test"
sbt -batch test > /tmp/r11_test.log 2>&1
echo "test exit=$?" >> $LOG

step "plan gate (all queries)"
sbt -batch "runMain graft.tools.PlanGate /root/testdata/sf0.01" > /tmp/r11_plangate.log 2>&1
echo "plangate exit=$? $(tail -1 /tmp/r11_plangate.log)" >> $LOG

step "verify sf0.01 full"
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/v11_001" > /tmp/r11_verify001.log 2>&1
python3 tools/check.py /root/testdata/sf0.01 /tmp/v11_001 --json CORRECTNESS_sf001_r11.json > /tmp/r11_check001.log 2>&1
echo "check sf0.01 exit=$? $(tail -2 /tmp/r11_check001.log | head -1)" >> $LOG

step "verify sf0.1 full (standing gate)"
sbt -batch "runMain graft.Verify /root/testdata/sf0.1 /tmp/v11_01" > /tmp/r11_verify01.log 2>&1
python3 tools/check.py /root/testdata/sf0.1 /tmp/v11_01 --json CORRECTNESS_sf01_r11.json > /tmp/r11_check01.log 2>&1
echo "check sf0.1 exit=$? $(tail -2 /tmp/r11_check01.log | head -1)" >> $LOG

step "verify sf1 (standing gate, 180s oracle timeout)"
sbt -batch "runMain graft.Verify /root/repo/testdata/sf1 /tmp/v11_1" > /tmp/r11_verify1.log 2>&1
python3 tools/check.py /root/repo/testdata/sf1 /tmp/v11_1 --json CORRECTNESS_sf1_r11.json --timeout-s 180 > /tmp/r11_check1.log 2>&1
echo "check sf1 exit=$? $(tail -2 /tmp/r11_check1.log | head -1)" >> $LOG

step "PLANS static sf0.01"
sbt -batch "runMain graft.tools.Plans /root/testdata/sf0.01 PLANS.md" > /tmp/r11_plans.log 2>&1
echo "plans exit=$?" >> $LOG

step "bench sf0.1 3-rep"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_BENCH_REPS=3 SPARK_GRAFT_OUT=bench_sf01_r11.json \
  sbt -batch "runMain graft.Bench" > /tmp/r11_b01.log 2>&1
echo "b01 exit=$?" >> $LOG

step "bench sf1 2-rep"
SPARK_GRAFT_SF_DIR=/root/repo/testdata/sf1 SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_BENCH_REPS=2 SPARK_GRAFT_OUT=bench_sf1_r11.json \
  sbt -batch "runMain graft.Bench" > /tmp/r11_b1.log 2>&1
echo "b1 exit=$?" >> $LOG

step "bench sf5 2-rep"
SPARK_GRAFT_SF_DIR=/root/repo/testdata/sf5 SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_BENCH_REPS=2 SPARK_GRAFT_OUT=bench_sf5_r11.json \
  sbt -batch "runMain graft.Bench" > /tmp/r11_b5.log 2>&1
echo "b5 exit=$?" >> $LOG

step "bench sf5 labels-mode 2-rep"
SPARK_GRAFT_SF_DIR=/root/repo/testdata/sf5 SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_BENCH_REPS=2 SPARK_GRAFT_OUT=bench_sf5_labels_r11.json \
SPARK_GRAFT_LABELS_TABLE=graft_labels_sf5_r11 \
  sbt -batch "runMain graft.Bench" > /tmp/r11_b5l.log 2>&1
echo "b5l exit=$?" >> $LOG

step "InvariantCheck sf1"
sbt -batch "runMain graft.tools.InvariantCheck /root/repo/testdata/sf1" > /tmp/r11_inv.log 2>&1
echo "inv exit=$? $(grep -c OK /tmp/r11_inv.log)" >> $LOG

step "PLANS sf1 executed"
sbt -batch "runMain graft.tools.Plans /root/repo/testdata/sf1 PLANS_sf1.md executed" > /tmp/r11_plans1.log 2>&1
echo "plans1 exit=$?" >> $LOG

step "chain done"
