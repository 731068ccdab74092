#!/bin/bash
# Round-15 pipeline: same conventions as r14 (24g heap — run_main.sh's
# default, no SPARK_DRIVER_MEM override allowed here; GCLocker flag in
# run_main.sh; stretch-all corpora with mode+factor+source markers),
# plus two r15 changes:
#  - exit codes are REAL (ADVICE r14): every bench rc is captured and
#    the script exits nonzero if any step failed — a crashed or OOM'd
#    bench can no longer read as pipeline success to a caller.
#  - the decade points run with SPARK_GRAFT_SKIP_PROBES=1 (VERDICT r14
#    #3): the 11 audit/truth probes cost ~47% of sf10 wall-clock and
#    are Θ(output) by design; the production-path scaling signal is
#    the decade's purpose. Probe decades run on the rotation schedule
#    documented in SCALE.md (§probe-audit rotation) — every OTHER
#    round, via r*_probe_decade.sh or a full (non-skip) pipeline run.
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
      "$factor" stretch-all > "/tmp/scaleup_sf${sf}_r15.log" 2>&1 || exit 1
  fi
done
echo CORPORA_DONE
# Full-suite decade, sf10 first (the long pole), then sf1, then sf0.1.
# The band discipline is handled OUTSIDE this script: the fresh-host
# uncontended sf0.1 band is taken FIRST in the session, before any
# other Spark work; the closing sf0.1 line here is the DECADE point,
# not a band claim.
export SPARK_GRAFT_ITERS=2
export SPARK_GRAFT_SKIP_PROBES=1
SPARK_GRAFT_SF_DIR=/root/repo/corpora/sf10 scripts/run_main.sh graft.Bench \
  > /tmp/bench_sf10_r15.log 2>&1 || rc=1
echo "SF10_DONE rc=$rc"
SPARK_GRAFT_SF_DIR=/root/repo/corpora/sf1 scripts/run_main.sh graft.Bench \
  > /tmp/bench_sf1_r15.log 2>&1 || rc=1
echo "SF1_DONE rc=$rc"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 scripts/run_main.sh graft.Bench \
  > /tmp/bench_sf01_r15_decade.log 2>&1 || rc=1
echo "SF01_DONE rc=$rc"
echo "ALL_BENCHES_DONE rc=$rc"
exit $rc
