#!/bin/bash
# Round-11 phase A (snapshot edition): VERDICT r10 triage items run with
# plain `java` off a class snapshot so sbt stays free for development.
#  - regen sf1/sf5 (testdata/ is not committed; each round regenerates)
#  - a1 q3_join sf5 fork-isolated 3-rep triage (r10 item 3)
#  - a2 fork sf0.1 plain + a4 fork+persisted-labels (item 4)
#  - a5/a6 labels-mode sweeps at sf0.1/sf1 (item 8)
#  - a7/a8 sf20 generation + slowest-query ratio sweep (item 7)
# Sequential: never two measured JVMs at once.
cd /root/repo
LOG=/tmp/r11_phaseA.log
step() { echo "=== $(date +%H:%M:%S) $1" >> $LOG; }
RUN=tools/java_run.sh

step "gen sf1"
SPARK_GRAFT_CPUS=32 $RUN graft.tools.GenData 1 /root/repo/testdata/sf1 \
  > /tmp/r11_gen1.log 2>&1
echo "gen1 exit=$?" >> $LOG

step "gen sf5"
SPARK_GRAFT_CPUS=32 $RUN graft.tools.GenData 5 /root/repo/testdata/sf5 \
  > /tmp/r11_gen5.log 2>&1
echo "gen5 exit=$?" >> $LOG

step "a1 q3_join sf5 fork-isolated 3-rep (control q1_agg)"
SPARK_GRAFT_SF_DIR=/root/repo/testdata/sf5 SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_BENCH_REPS=3 SPARK_GRAFT_FORK=1 \
SPARK_GRAFT_ONLY=q1_agg,q3_join SPARK_GRAFT_OUT=bench_q3_triage_sf5_r11.json \
  $RUN graft.Bench > /tmp/r11_a1.log 2>&1
echo "a1 exit=$?" >> $LOG

step "a2 fork sf0.1 plain (chunk 24, 3-rep)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_BENCH_REPS=3 SPARK_GRAFT_FORK=24 \
SPARK_GRAFT_OUT=bench_sf01_r11_fork.json \
  $RUN graft.Bench > /tmp/r11_a2.log 2>&1
echo "a2 exit=$?" >> $LOG

step "a3 write sf0.1 labels table once"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_BENCH_REPS=1 SPARK_GRAFT_ONLY=dedup_clusters \
SPARK_GRAFT_LABELS_TABLE=graft_labels_sf01_r11 \
SPARK_GRAFT_OUT=/tmp/labels_write_sf01_r11.json \
  $RUN graft.Bench > /tmp/r11_a3.log 2>&1
echo "a3 exit=$?" >> $LOG

step "a4 fork sf0.1 + persisted labels (reuse)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_BENCH_REPS=3 SPARK_GRAFT_FORK=24 \
SPARK_GRAFT_LABELS_TABLE=graft_labels_sf01_r11 SPARK_GRAFT_LABELS_REUSE=1 \
SPARK_GRAFT_OUT=bench_sf01_r11_fork_labels.json \
  $RUN graft.Bench > /tmp/r11_a4.log 2>&1
echo "a4 exit=$?" >> $LOG

step "a5 labels-mode in-process sf0.1 3-rep"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_BENCH_REPS=3 SPARK_GRAFT_LABELS_TABLE=graft_labels_sf01b_r11 \
SPARK_GRAFT_OUT=bench_sf01_labels_r11.json \
  $RUN graft.Bench > /tmp/r11_a5.log 2>&1
echo "a5 exit=$?" >> $LOG

step "a6 labels-mode in-process sf1 2-rep"
SPARK_GRAFT_SF_DIR=/root/repo/testdata/sf1 SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_BENCH_REPS=2 SPARK_GRAFT_LABELS_TABLE=graft_labels_sf1_r11 \
SPARK_GRAFT_OUT=bench_sf1_labels_r11.json \
  $RUN graft.Bench > /tmp/r11_a6.log 2>&1
echo "a6 exit=$?" >> $LOG

step "a7 generate sf20"
SPARK_GRAFT_CPUS=32 $RUN graft.tools.GenData 20 /root/repo/testdata/sf20 \
  > /tmp/r11_a7.log 2>&1
echo "a7 exit=$?" >> $LOG

step "a8 sf20 sweep: slowest-15 + controls, 2-rep"
SPARK_GRAFT_SF_DIR=/root/repo/testdata/sf20 SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_BENCH_REPS=2 \
SPARK_GRAFT_ONLY=q1_agg,q3_join,dedup_exact,dedup_simhash,text_entropy,cluster_size_dist,market_basket,bitext_mine,interval_overlap,dedup_winnow,dedup_semantic,ann_ivfpq,q21_waiting_suppliers,fuzzy_match,dedup_embed_cosine,rfm_segments,corpus_manifest,graph_modularity,item_pagerank,graph_kcore \
SPARK_GRAFT_OUT=bench_sf20_r11.json \
  $RUN graft.Bench > /tmp/r11_a8.log 2>&1
echo "a8 exit=$?" >> $LOG

step "phase A done"
