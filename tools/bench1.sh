#!/bin/bash
# Dev-only: time a single SparkEntry query at a given SF, plain JVM.
# Usage: tools/bench1.sh <queryName> [sfDir] [reps]
set -e
Q=${1:?query name}
SF=${2:-/root/testdata/sf0.1}
REPS=${3:-1}
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $ADD_OPENS \
  -Xmx${SPARK_DRIVER_MEM:-8g} \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -Dbench1.query="$Q" -Dbench1.sf="$SF" -Dbench1.reps="$REPS" \
  -cp "/root/repo/target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.tools.Bench1
