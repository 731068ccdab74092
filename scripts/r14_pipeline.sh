#!/bin/bash
# Round-14 pipeline: the heap convention is DECIDED (VERDICT r13 #4 /
# NOTES_r13 hand-off #3): 24g — run_main.sh's default — everywhere,
# including sf10. The GCLocker flag (-XX:GCLockerRetryAllocationCount
# =64, in run_main.sh since r13) removed the reason 48g existed: the
# three-round "environmental OOM" class was the JDK-8192647 SPURIOUS
# GCLocker OOM, not heap exhaustion, and r13's direct experiment
# showed 24g vs 48g statistically identical on the worst rows
# (mm04 81.7/84.7 s, f10 15.4/14.4 s). 24g restores cross-round
# comparability with the r8–r12 history. No SPARK_DRIVER_MEM override
# may appear in this script.
#
# Corpus guard (ADVICE r12): marker must record mode AND factor AND
# source, so a stale corpus can't masquerade as current.
set -x
cd /root/repo
export SPARK_GRAFT_CPUS=32
mkdir -p corpora
for sf in 10 1; do
  factor=$((sf * 10))
  marker="corpora/sf$sf/_GRAFT_SCALEUP_SUCCESS"
  if [ ! -f "$marker" ] \
     || ! grep -q '"stretchAll":true' "$marker" \
     || ! grep -q "\"factor\":$factor," "$marker" \
     || ! grep -q '"src":"/root/testdata/sf0.1"' "$marker"; then
    rm -rf "corpora/sf$sf"
    scripts/run_main.sh graft.ScaleUp /root/testdata/sf0.1 "corpora/sf$sf" \
      "$factor" stretch-all > "/tmp/scaleup_sf${sf}_r14.log" 2>&1 || exit 1
  fi
done
echo CORPORA_DONE
# Full-suite decade, sf10 first (the long pole), then sf1, then sf0.1.
# The band discipline is handled OUTSIDE this script: the fresh-host
# uncontended sf0.1 band is taken FIRST in the session, before any
# other Spark work; the closing sf0.1 line here is the DECADE point,
# not a band claim.
export SPARK_GRAFT_ITERS=2
SPARK_GRAFT_SF_DIR=/root/repo/corpora/sf10 scripts/run_main.sh graft.Bench \
  > /tmp/bench_sf10_r14.log 2>&1
echo SF10_DONE rc=$?
SPARK_GRAFT_SF_DIR=/root/repo/corpora/sf1 scripts/run_main.sh graft.Bench \
  > /tmp/bench_sf1_r14.log 2>&1
echo SF1_DONE rc=$?
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 scripts/run_main.sh graft.Bench \
  > /tmp/bench_sf01_r14_decade.log 2>&1
echo SF01_DONE rc=$?
echo ALL_BENCHES_DONE
