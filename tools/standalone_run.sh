#!/bin/bash
# Snapshot the compiled classes and run a main class with the Spark
# jars directly (no sbt) — lets long benches run while sbt keeps
# compiling. Usage: tools/standalone_run.sh <MainClass> [args...]
# Env passthrough: SPARK_GRAFT_* plus JVM opts below.
set -e
MAIN="$1"; shift
SNAP=$(mktemp -d /tmp/graft_cp.XXXXXX)
cp -r /root/repo/target/scala-2.13/classes "$SNAP/classes"
if [ -d /root/repo/target/scala-2.13/test-classes ]; then
  cp -r /root/repo/target/scala-2.13/test-classes "$SNAP/test-classes"
fi
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $ADD_OPENS -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$SNAP/classes:$SNAP/test-classes:/opt/spark/jars/*" "$MAIN" "$@"
