#!/bin/bash
# Round-11 post-decade chain (run AFTER r11_pipeline.sh completes and
# after `sbt compile` picks up the r11 query additions):
#  1. nn11 standalone at sf10, fresh JVM — the full-suite run's pass2
#     OOM'd after 2.7h/460 executions in one JVM; this line shows the
#     query itself is healthy at sf10 (and exercises the periodic-GC
#     hardening).
#  2. sd family (sd01 exact kernel vs sd02 banded kernel) at sf10 and
#     sf1 — the banded-substitution scaling evidence.
#  3. sd family at sf0.1 for the family-budget re-record.
set -x
cd /root/repo
export SPARK_GRAFT_CPUS=32
export SPARK_GRAFT_ITERS=2
SPARK_GRAFT_SF_DIR=/root/repo/corpora/sf10 SPARK_GRAFT_BENCH_ONLY=nn11 \
  scripts/run_main.sh graft.Bench > /tmp/bench_nn11_sf10.log 2>&1
echo NN11_DONE rc=$?
SPARK_GRAFT_SF_DIR=/root/repo/corpora/sf10 SPARK_GRAFT_BENCH_ONLY=sd \
  scripts/run_main.sh graft.Bench > /tmp/bench_sd_sf10.log 2>&1
echo SD10_DONE rc=$?
SPARK_GRAFT_SF_DIR=/root/repo/corpora/sf1 SPARK_GRAFT_BENCH_ONLY=sd \
  scripts/run_main.sh graft.Bench > /tmp/bench_sd_sf1.log 2>&1
echo SD1_DONE rc=$?
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_ONLY=sd \
  scripts/run_main.sh graft.Bench > /tmp/bench_sd_sf01.log 2>&1
echo SD01_DONE rc=$?
echo POST_DONE
