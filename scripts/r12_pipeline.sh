#!/bin/bash
# Round-12 pipeline: rebuild the scale corpora with the STRETCH-TIME
# event axis (the round-11 proposal — constant event density, so the
# bj01/ov01 superlinearity that was a density-replication artifact can
# be re-triaged against a corpus shaped like real event accumulation),
# then run the FULL-SUITE decade benches sf10 → sf1 → sf0.1 so all
# three points come from the same code revision. sf10 first: a clean
# n_failed=0 line under the periodic-GC hardening retires the r11
# nn11 asterisk.
#
# Rebuild guards (ADVICE r11): gate on the ScaleUp completion marker
# ALONE — it is the LAST artifact of a build, so its absence means
# partial or missing; wipe and rebuild. The old per-table _SUCCESS
# heuristic let a mid-write death masquerade as a finished corpus.
set -x
cd /root/repo
export SPARK_GRAFT_CPUS=32
mkdir -p corpora
for sf in 10 1; do
  factor=$((sf * 10))
  # ADVICE r12: the marker must also record the expected factor and
  # source — mode alone would let a stale corpus built at a different
  # factor or from a different source be silently reused
  if [ ! -f "corpora/sf$sf/_GRAFT_SCALEUP_SUCCESS" ] \
     || ! grep -q '"stretchTime":true' "corpora/sf$sf/_GRAFT_SCALEUP_SUCCESS" \
     || ! grep -q "\"factor\":$factor," "corpora/sf$sf/_GRAFT_SCALEUP_SUCCESS" \
     || ! grep -q '"src":"/root/testdata/sf0.1"' "corpora/sf$sf/_GRAFT_SCALEUP_SUCCESS"; then
    rm -rf "corpora/sf$sf"
    scripts/run_main.sh graft.ScaleUp /root/testdata/sf0.1 "corpora/sf$sf" \
      "$factor" stretch-time > "/tmp/scaleup_sf${sf}_r12.log" 2>&1 || exit 1
  fi
done
echo CORPORA_DONE
export SPARK_GRAFT_ITERS=2
SPARK_GRAFT_SF_DIR=/root/repo/corpora/sf10 scripts/run_main.sh graft.Bench \
  > /tmp/bench_sf10_r12.log 2>&1
echo SF10_DONE rc=$?
SPARK_GRAFT_SF_DIR=/root/repo/corpora/sf1 scripts/run_main.sh graft.Bench \
  > /tmp/bench_sf1_r12.log 2>&1
echo SF1_DONE rc=$?
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 scripts/run_main.sh graft.Bench \
  > /tmp/bench_sf01_r12.log 2>&1
echo SF01_DONE rc=$?
echo ALL_BENCHES_DONE
