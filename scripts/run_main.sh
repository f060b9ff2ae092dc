#!/bin/bash
# Run a graft main class directly (bypasses sbt; uses compiled classes).
# Usage: run_main.sh <mainClass> [args...]
MAIN=$1; shift
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
OPENS="$OPENS --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED"
OPENS="$OPENS --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
# -Xms: without a floor the heap grows incrementally under the first
# heavy query, and that growth (expansion + full GCs) lands on whichever
# entry runs first — measured 30-58s first-rep spikes on the big
# self-join benches that vanish with a pre-sized heap.
exec java $OPENS -Xms${SPARK_DRIVER_MEM_MIN:-16g} -Xmx${SPARK_DRIVER_MEM:-64g} \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "/root/repo/target/scala-2.13/classes:/opt/spark/jars/*" \
  "$MAIN" "$@"
