#!/bin/bash
# Round-11 lead pipeline: rebuild the relocated scale corpora (they are
# gitignored data and did not survive the last session), then run the
# FULL-SUITE decade benches — sf10 first (the missing third decade),
# then sf1 and sf0.1 so all three points come from the same code rev.
set -x
cd /root/repo
export SPARK_GRAFT_CPUS=32
mkdir -p corpora
if [ ! -f corpora/sf10/lineitem.parquet/_SUCCESS ] && [ ! -d corpora/sf10/lineitem.parquet ]; then
  scripts/run_main.sh graft.ScaleUp /root/testdata/sf0.1 corpora/sf10 100 \
    > /tmp/scaleup_sf10_r11.log 2>&1 || exit 1
fi
if [ ! -d corpora/sf1/lineitem.parquet ]; then
  scripts/run_main.sh graft.ScaleUp /root/testdata/sf0.1 corpora/sf1 10 \
    > /tmp/scaleup_sf1_r11.log 2>&1 || exit 1
fi
echo CORPORA_DONE
export SPARK_GRAFT_ITERS=2
SPARK_GRAFT_SF_DIR=/root/repo/corpora/sf10 scripts/run_main.sh graft.Bench \
  > /tmp/bench_sf10_r11.log 2>&1
echo SF10_DONE rc=$?
SPARK_GRAFT_SF_DIR=/root/repo/corpora/sf1 scripts/run_main.sh graft.Bench \
  > /tmp/bench_sf1_r11.log 2>&1
echo SF1_DONE rc=$?
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 scripts/run_main.sh graft.Bench \
  > /tmp/bench_sf01_r11.log 2>&1
echo SF01_DONE rc=$?
echo ALL_BENCHES_DONE
