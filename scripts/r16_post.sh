#!/bin/bash
# Round-16 post-decade measurements, run back-to-back on a quiet host
# after the sf10 probes-only audit finishes:
#  1. sf0.1 full-scope probe-SIX audit (the r13/r14 table refresh)
#  2. sf1 full-scope audit of the linear row (bt02) — the output-bound
#     five's sf1 full-scope is Θ(output) ≈ 100x (quadratic pairs) or
#     ~20x (dd12, one side scoped) their sf0.1 cost BY CONSTRUCTION;
#     their sf0.1 measurements + output bounds are the audit statement
#     (running them a decade up would only re-measure the output size).
#  3. streaming-ingest throughput ladder (VERDICT r15 #7)
#  4. concurrent-mode full-suite sf0.1 line (VERDICT r15 #3)
#  5. sequential band retake at the band convention (Bench default
#     local[4], no CPUS — comparable with the 158.7 s band and every
#     r8+ band line)
set -x
cd /root/repo
rc=0
GRAFT_AUDIT_FULL_SCOPE=1 SPARK_GRAFT_ITERS=1 SPARK_GRAFT_WARMUP=0 \
  SPARK_GRAFT_CALIB=0 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  SPARK_GRAFT_BENCH_ONLY=fz02,sm04,tc01,dd12,bt02,dd13 \
  scripts/run_main.sh graft.Bench > /tmp/audit_sf01_r16.log 2>&1 || rc=1
echo "AUDIT_SF01_DONE rc=$rc"
GRAFT_AUDIT_FULL_SCOPE=1 SPARK_GRAFT_ITERS=1 SPARK_GRAFT_WARMUP=0 \
  SPARK_GRAFT_CALIB=0 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_SF_DIR=/root/repo/corpora/sf1 \
  SPARK_GRAFT_BENCH_ONLY=bt02 \
  scripts/run_main.sh graft.Bench > /tmp/audit_sf1_r16.log 2>&1 || rc=1
echo "AUDIT_SF1_DONE rc=$rc"
SPARK_GRAFT_CPUS=16 scripts/run_main.sh graft.StreamIngestBench \
  > /tmp/stream_bench_r16.log 2>&1 || rc=1
echo "STREAM_DONE rc=$rc"
SPARK_GRAFT_CPUS=32 SPARK_GRAFT_CONCURRENT=16 SPARK_GRAFT_ITERS=2 \
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  scripts/run_main.sh graft.Bench > /tmp/bench_conc_sf01_r16.log 2>&1 || rc=1
echo "CONCURRENT_DONE rc=$rc"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_ITERS=2 \
  scripts/run_main.sh graft.Bench > /tmp/bench_band_retake_r16.log 2>&1 || rc=1
echo "BAND_RETAKE_DONE rc=$rc"
echo "R16_POST_DONE rc=$rc"
exit $rc
