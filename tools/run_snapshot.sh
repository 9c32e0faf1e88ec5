#!/bin/bash
# Run a graft main class from a SNAPSHOTTED classpath: long-lived forked
# JVMs (the multi-hour Scaling tiers) load classes lazily, so an sbt
# recompile during the run would swap class files under the JVM and mix
# two builds in one process. Snapshotting target/scala-2.13/classes to a
# private dir first makes the run immune to concurrent development.
#
# Usage: SPARK_DRIVER_MEM=24g tools/run_snapshot.sh graft.Scaling <args...>
# (plus whatever SPARK_GRAFT_* env vars the main class reads)
set -euo pipefail
CLASSES=/root/repo/target/scala-2.13/classes
SNAP=$(mktemp -d /tmp/graft_snap.XXXXXX)
cp -a "$CLASSES/." "$SNAP/"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent \
         java.util.concurrent.atomic sun.nio.ch sun.nio.cs \
         sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
# shellcheck disable=SC2086
exec java $ADD_OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -cp "$SNAP:/opt/spark/jars/*" "$@"
