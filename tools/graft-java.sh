#!/usr/bin/env bash
# Run a compiled graft main directly on the JVM — same --add-opens set
# build.sbt forks with — so profiling/explain runs don't serialize behind
# the sbt build lock. Usage: tools/graft-java.sh graft.BenchOne knn_graph 3
set -euo pipefail
cd "$(dirname "$0")/.."
OPENS="java.base/java.lang java.base/java.lang.invoke java.base/java.lang.reflect \
java.base/java.io java.base/java.net java.base/java.nio java.base/java.util \
java.base/java.util.concurrent java.base/java.util.concurrent.atomic \
java.base/sun.nio.ch java.base/sun.nio.cs java.base/sun.security.action \
java.base/sun.util.calendar"
FLAGS=()
for p in $OPENS; do FLAGS+=(--add-opens "$p=ALL-UNNAMED"); done
exec java "${FLAGS[@]}" \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" "$@"
