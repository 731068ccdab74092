#!/bin/bash
# Round-13 pipeline: ADOPT the stretch-all corpus convention (VERDICT
# r12 #1). stretch-all translates EVERY transactional date axis
# (o_orderdate, l_shipdate, events ts) by one common per-replica
# stride, so weekly-aggregate group counts grow ~linearly with factor
# instead of stacking factor× mass onto a fixed set of weeks — the
# convention under which ov01's output (overlap pairs per week-bucket)
# is output-bound instead of superlinear-by-construction. This is the
# deliberate one-time re-baselining: date-shaped outputs (a04/a08/t02/
# ov01/...) re-shape at sf1/sf10, so family budgets and the decade
# exponent table are re-seeded from THESE runs in the same round.
#
# Rebuild guard (ADVICE r12): the marker must record the right MODE,
# FACTOR and SOURCE — "stretchAll":true alone would let a stale corpus
# built at another factor or from another source masquerade as current.
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
      "$factor" stretch-all > "/tmp/scaleup_sf${sf}_r13.log" 2>&1 || exit 1
  fi
done
echo CORPORA_DONE
# Full-suite decade, sf10 first (the long pole; a clean n_failed=0
# line on the NEW convention is the round's record), then sf1, then
# sf0.1 — all three points from the same code revision. The sf0.1 run
# doubles as the suite's post-gn02/x06 uncontended band.
#
# 48g heap (was the 24g run_main default): the first r13 sf10 attempt
# died at warmup dd13 with a Java-heap OOM — and the 48g retry died
# too (warmup fz02), which is what finally produced the diagnosis: the
# gc log showed "Retried waiting for GCLocker too often allocating
# 5 words" immediately above the throw. The whole three-round
# "environmental OOM" class (r11 nn11, r12 dd13, r13 fz02) is the
# JDK-8192647 SPURIOUS OOM: JNI critical regions (parquet native
# decompression, 32 threads) starve the GCLocker and HotSpot throws
# heap-space OOM after 2 failed retries regardless of heap occupancy.
# run_main.sh now sets -XX:GCLockerRetryAllocationCount=64 (the fix);
# 48g is kept for headroom. All three SFs run the same heap + flags so
# the r13 decade exponents are internally consistent (NOTES_r13).
export SPARK_DRIVER_MEM=48g
export SPARK_GRAFT_ITERS=2
SPARK_GRAFT_SF_DIR=/root/repo/corpora/sf10 scripts/run_main.sh graft.Bench \
  > /tmp/bench_sf10_r13.log 2>&1
echo SF10_DONE rc=$?
SPARK_GRAFT_SF_DIR=/root/repo/corpora/sf1 scripts/run_main.sh graft.Bench \
  > /tmp/bench_sf1_r13.log 2>&1
echo SF1_DONE rc=$?
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 scripts/run_main.sh graft.Bench \
  > /tmp/bench_sf01_r13.log 2>&1
echo SF01_DONE rc=$?
echo ALL_BENCHES_DONE
