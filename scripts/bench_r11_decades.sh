#!/bin/bash
# Round-11 lead task (VERDICT r10 #1): the FULL-SUITE sf10 decade —
# 185 queries, min-of-2, warmup on, local[32], zero subset selector —
# followed by an sf1 re-run so both RELOCATED corpora (corpora/sf*,
# moved out of target/ per VERDICT #2) get corpus-id'd history lines.
# Launch detached: setsid nohup bash scripts/bench_r11_decades.sh \
#   > /tmp/bench_r11.log 2>&1 &
set -x
cd /root/repo
export SPARK_GRAFT_ITERS=2
export SPARK_GRAFT_CPUS=32
SPARK_GRAFT_SF_DIR=/root/repo/corpora/sf10 scripts/run_main.sh graft.Bench \
  > /tmp/bench_sf10_r11.log 2>&1
SPARK_GRAFT_SF_DIR=/root/repo/corpora/sf1 scripts/run_main.sh graft.Bench \
  > /tmp/bench_sf1_r11.log 2>&1
echo ALL_BENCHES_DONE
