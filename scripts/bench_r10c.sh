#!/bin/bash
# Round-10 post-ADC-redesign record: full-suite min-of-2 at all three
# scale points, sequentially (one sbt at a time). Launch detached:
#   setsid nohup bash scripts/bench_r10c.sh > /tmp/bench_r10c.log 2>&1 &
set -x
cd /root/repo
export SPARK_GRAFT_ITERS=2
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" \
  > /tmp/bench_sf01_r10c.log 2>&1
SPARK_GRAFT_SF_DIR=/root/repo/target/sf1 sbt -batch "runMain graft.Bench" \
  > /tmp/bench_sf1_r10c.log 2>&1
SPARK_GRAFT_SF_DIR=/root/repo/target/sf10 sbt -batch "runMain graft.Bench" \
  > /tmp/bench_sf10_r10c.log 2>&1
echo ALL_BENCHES_DONE
