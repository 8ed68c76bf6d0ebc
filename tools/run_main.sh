#!/bin/bash
# Run a graft main directly (no sbt lock): tools/run_main.sh <class> [args...]
# Mirrors build.sbt's fork settings (JDK17 add-opens, UTC, no UI).
# Heap via SPARK_DRIVER_MEM (default 8g). Requires a prior `sbt compile`.
set -e
cd "$(dirname "$0")/.."
CLASS="$1"; shift
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $OPENS \
  -Dstdout.encoding=UTF-8 -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  "$CLASS" "$@"
