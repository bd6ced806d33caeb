#!/bin/bash
# Plain-java launcher for graft mains (no sbt lock): run_graft.sh <mainClass> [args...]
# JVM flags mirror build.sbt's javaOptions; SPARK_DRIVER_MEM overrides -Xmx.
set -e
CLASSES=/root/repo/target/scala-2.13/classes
ADDOPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADDOPENS="$ADDOPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $ADDOPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx${SPARK_DRIVER_MEM:-48g} -XX:ReservedCodeCacheSize=512m \
  -cp "$CLASSES:/opt/spark/jars/*" "$@"
