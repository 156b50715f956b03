#!/usr/bin/env bash
# Run a graft main outside sbt (replicates build.sbt's forked JVM options).
# Usage: run_main.sh [-mXg] graft.MainClass args...
set -euo pipefail
cd "$(dirname "$0")/.."
MEM="${SPARK_DRIVER_MEM:-8g}"
if [[ "${1:-}" == -m* ]]; then MEM="${1#-m}"; shift; fi
CP="target/scala-2.13/classes:/opt/spark/jars/*"
OPENS=(java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
  java.util java.util.concurrent java.util.concurrent.atomic)
ARGS=()
for p in "${OPENS[@]}"; do ARGS+=(--add-opens "java.base/$p=ALL-UNNAMED"); done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ARGS+=(--add-opens "java.base/$p=ALL-UNNAMED"); done
exec java "${ARGS[@]}" -Xmx"$MEM" \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CP" "$@"
