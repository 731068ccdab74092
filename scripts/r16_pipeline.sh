#!/bin/bash
# Round-16 pipeline: r15 conventions (24g heap via run_main.sh — no
# SPARK_DRIVER_MEM override here; GCLocker flag in run_main.sh;
# stretch-all corpora with mode+factor+source markers), with two r16
# changes:
#  - FULL-SCOPE decade (no SPARK_GRAFT_SKIP_PROBES): r16 is the even
#    round in the probe-audit rotation (SCALE.md §probe-split), so the
#    11 audit/truth probes get their every-other-round sf10 audit.
#  - bench exit codes now fold in n_failed (ADVICE r15, medium, fixed
#    in graft.Bench itself): a SIGTERM-cascade run that fails >3
#    queries exits 2 from the bench JVM, so the `|| rc=1` capture here
#    is sufficient — no log grepping needed.
set -x
cd /root/repo
export SPARK_GRAFT_CPUS=32
mkdir -p corpora
rc=0
for sf in 10 1; do
  factor=$((sf * 10))
  marker="corpora/sf$sf/_GRAFT_SCALEUP_SUCCESS"
  if [ ! -f "$marker" ] \
     || ! grep -q '"stretchAll":true' "$marker" \
     || ! grep -q "\"factor\":$factor," "$marker" \
     || ! grep -q '"src":"/root/testdata/sf0.1"' "$marker"; then
    rm -rf "corpora/sf$sf"
    scripts/run_main.sh graft.ScaleUp /root/testdata/sf0.1 "corpora/sf$sf" \
      "$factor" stretch-all > "/tmp/scaleup_sf${sf}_r16.log" 2>&1 || exit 1
  fi
done
echo CORPORA_DONE
# Full-suite decade, sf10 first (the long pole), then sf1, then sf0.1.
# The band discipline is handled OUTSIDE this script: the fresh-host
# uncontended sf0.1 band is taken FIRST in the session, before any
# other Spark work; the closing sf0.1 line here is the DECADE point,
# not a band claim. Every line now carries the host-mode calibration
# stamp (bench/calib_history.jsonl), so decade points are classifiable
# against the ambient mode they ran under.
export SPARK_GRAFT_ITERS=2
SPARK_GRAFT_SF_DIR=/root/repo/corpora/sf10 scripts/run_main.sh graft.Bench \
  > /tmp/bench_sf10_r16.log 2>&1 || rc=1
echo "SF10_DONE rc=$rc"
SPARK_GRAFT_SF_DIR=/root/repo/corpora/sf1 scripts/run_main.sh graft.Bench \
  > /tmp/bench_sf1_r16.log 2>&1 || rc=1
echo "SF1_DONE rc=$rc"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 scripts/run_main.sh graft.Bench \
  > /tmp/bench_sf01_r16_decade.log 2>&1 || rc=1
echo "SF01_DONE rc=$rc"
echo "ALL_BENCHES_DONE rc=$rc"
exit $rc
