#!/bin/bash
# Fixed-heap soak/probe launcher for graft.ApSim (BASELINE.md runs).
# Pre-touched fixed heap: first-touch page faults move to startup, the
# rest of RAM stays page cache (the round-6 reclaim-storm fix).
#
#   scripts/soak.sh <warehouseDir> <nVisits> <catalogSize> [detFraction] [heap] [catalogFile]
#
# e.g. scripts/soak.sh /tmp/apdb_probe500x 10 2150000000 0.9 48g
# catalogFile (parquet or .npy) feeds ApSim's sources_file path; pair
# with SPARK_GRAFT_NO_CATALOG_CACHE=1 to exercise the persisted
# pixel-bucketed catalog path on a file-provided catalog.
set -euo pipefail
cd "$(dirname "$0")/.."
# local-cluster runs (SPARK_GRAFT_MASTER=local-cluster[...]) spawn
# executor JVMs through WorkerCommandBuilder, which resolves the Spark
# distribution from SPARK_HOME — without it the in-driver workers die
# with "Cannot find any build directories"
export SPARK_HOME=${SPARK_HOME:-/opt/spark}
# ...and Spark 4.1's AbstractCommandBuilder.buildClassPath resolves the
# scala version unconditionally, which in a release layout (no
# launcher/target build dirs) needs the env override (BASELINE.md:405)
export SPARK_SCALA_VERSION=${SPARK_SCALA_VERSION:-2.13}
WAREHOUSE=${1:?warehouse dir}
VISITS=${2:?visit count}
CATSIZE=${3:?catalog size}
DETFRAC=${4:-0.9}
HEAP=${5:-48g}
CATFILE=${6:-}
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
# GC_LOG=<path> turns on unified GC logging (spike forensics);
# SOAK_CFG=<file> passes a pex.config-style override file (e.g. the
# months-window run); both optional.
GCFLAGS=${GC_LOG:+-Xlog:gc*,safepoint:file=$GC_LOG:time,uptime,level,tags}
exec java $ADD_OPENS $GCFLAGS \
  -Xms"$HEAP" -Xmx"$HEAP" -XX:+AlwaysPreTouch \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.ApSim "$WAREHOUSE" "$VISITS" "$CATSIZE" "$DETFRAC" \
  ${CATFILE:+"${SOAK_CFG:-/dev/null}" "$CATFILE"}
