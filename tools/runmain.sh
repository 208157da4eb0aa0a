#!/bin/bash
# Direct-java launcher for graft mains (Bench/Verify/Explain/ScaleSmoke):
# the same flags build.sbt forks with, minus sbt — so measurement runs can
# overlap an sbt test session and never absorb sbt's own JVM noise.
# Usage: tools/runmain.sh <mainClass> [args...]
set -e
CP="/root/repo/target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
MEM="${SPARK_DRIVER_MEM:-48g}"
exec java \
  --add-opens java.base/java.lang=ALL-UNNAMED \
  --add-opens java.base/java.lang.invoke=ALL-UNNAMED \
  --add-opens java.base/java.lang.reflect=ALL-UNNAMED \
  --add-opens java.base/java.io=ALL-UNNAMED \
  --add-opens java.base/java.net=ALL-UNNAMED \
  --add-opens java.base/java.nio=ALL-UNNAMED \
  --add-opens java.base/java.util=ALL-UNNAMED \
  --add-opens java.base/java.util.concurrent=ALL-UNNAMED \
  --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED \
  --add-opens java.base/sun.nio.ch=ALL-UNNAMED \
  --add-opens java.base/sun.nio.cs=ALL-UNNAMED \
  --add-opens java.base/sun.security.action=ALL-UNNAMED \
  --add-opens java.base/sun.util.calendar=ALL-UNNAMED \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -Xmx"$MEM" -Xms"$MEM" -XX:+AlwaysPreTouch \
  -XX:ReservedCodeCacheSize=512m \
  $SPARK_GRAFT_EXTRA_JVM \
  -cp "$CP" "$@"
