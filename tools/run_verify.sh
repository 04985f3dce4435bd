#!/bin/bash
# Direct-JVM launcher for graft mains (avoids sbt startup). Usage:
#   tools/run_verify.sh graft.Verify /root/testdata/sf0.01 /tmp/verify_out
set -e
cd "$(dirname "$0")/.."
ADDOPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  ADDOPENS="$ADDOPENS --add-opens java.base/$p=ALL-UNNAMED"; done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADDOPENS="$ADDOPENS --add-opens java.base/$p=ALL-UNNAMED"; done
# heap clamped: a ~90GB heap degrades this workload (see build.sbt note)
MEM=${SPARK_DRIVER_MEM:-8g}
case "$MEM" in
  *[0-9]g) [ "${MEM%g}" -gt 16 ] 2>/dev/null && MEM=16g ;;
esac
exec java $ADDOPENS -Xmx$MEM \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" "$@"
