#!/bin/bash
# Launch a graft main class with plain `java` against a CLASS SNAPSHOT
# (default /tmp/graft_cls_snap), mirroring build.sbt's forked-run JVM
# (add-opens set, UTC, no UI, -Xmx from SPARK_DRIVER_MEM|8g). Running
# benches off a snapshot keeps sbt free for development and pins the
# measured code even if target/classes is recompiled mid-sweep.
# Usage: java_run.sh <mainClass> [args...]
set -u
SNAP="${GRAFT_CLS:-/tmp/graft_cls_snap}"
XMX="${SPARK_DRIVER_MEM:-8g}"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
MAIN="$1"; shift
# GRAFT_JAVA_OPTS: extra -D/JVM flags for one-off experiments
# (e.g. -Dspark.sql.adaptive.advisoryPartitionSizeInBytes=8388608)
# GCLockerRetryAllocationCount: 32 shuffle writers allocating multi-MB
# sorter pages while LZ4 JNI criticals pin arrays starve G1's GCLocker
# at the default retry count (2) -> spurious "Java heap space" OOMs on
# a half-empty heap (seen in the sf20 NN-Descent build, r13). Raising
# the retry budget costs nothing when uncontended.
exec java -Xmx"$XMX" $OPENS -XX:+UnlockDiagnosticVMOptions -XX:GCLockerRetryAllocationCount=64 ${GRAFT_JAVA_OPTS:-} \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$SNAP:/opt/spark/jars/*" "$MAIN" "$@"
