#!/bin/bash
# Local bench runner: scripts/bench.sh [sf_dir] [only_csv] [mem]
# Mirrors the driver's invocation (8g default heap, local[32]).
set -e
SF=${1:-/root/testdata/sf0.1}
ONLY=${2:-}
MEM=${3:-8g}
ADDOPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  ADDOPENS="$ADDOPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADDOPENS="$ADDOPENS --add-opens java.base/$p=ALL-UNNAMED"
done
CP="/root/repo/target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_ONLY=$ONLY \
java -Xmx$MEM $ADDOPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CP" graft.Bench
