#!/bin/bash
# Run a graft main (Bench/Verify/ScaleUp/Prof) via plain java — avoids
# the single sbt lock so tests and long benches can run concurrently.
# Usage: scripts/run_main.sh graft.Bench [args...]
# Env: SPARK_DRIVER_MEM (default 24g — the recorded bench discipline),
#      plus whatever the main reads (SPARK_GRAFT_SF_DIR, _ITERS, ...).
set -euo pipefail
cd "$(dirname "$0")/.."
CP="target/scala-2.13/classes:/opt/spark/jars/*"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java -Xmx"${SPARK_DRIVER_MEM:-24g}" $ADD_OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CP" "$@"
