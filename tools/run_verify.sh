#!/bin/bash
# Run graft.Verify outside sbt (no project lock), with the same JVM flags
# build.sbt injects for forked runs. Usage:
#   tools/run_verify.sh <sfDir> <outDir> [cpus] [onlyQueries]
set -euo pipefail
SF=${1:?sfDir}; OUT=${2:?outDir}; CPUS=${3:-16}; ONLY=${4:-}
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS+=" --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS+=" --add-opens java.base/$p=ALL-UNNAMED"
done
exec env SPARK_GRAFT_CPUS="$CPUS" java $ADD_OPENS \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "/root/repo/target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.Verify "$SF" "$OUT" ${ONLY:+"$ONLY"}
