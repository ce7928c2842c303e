#!/bin/bash
# Idle A/B for initialPartitionNum attribution (VERDICT r10 item 1).
# Usage: ab_bench.sh <parts> <reps> <outtag>
set -e
PARTS=$1; REPS=$2; TAG=$3
ADDOPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
cd /root/repo
# machine-state capture: loadavg + steal ticks before/after, so a wild
# outlier rep adjudicates mechanically (VERDICT r11 item 2) — steal is
# /proc/stat cpu field 8; a large delta across the run means the host
# stole cycles and the numbers are suspect
LOAD0=$(cat /proc/loadavg); STEAL0=$(awk '/^cpu /{print $9}' /proc/stat)
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_REPS=$REPS \
SPARK_GRAFT_INITIAL_PARTS=$PARTS \
SPARK_GRAFT_ONLY="e2e_full_load,x106_retrieval_e2e,x97_leakage_safe_split,x21_simhash_neardup,x73_provenance_e2e" \
java $ADDOPENS -Xmx16g -Xms16g -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "target/bench-classes:/opt/spark/jars/*" graft.Bench 2>target/ab_${TAG}.log
cp target/bench.json target/ab_${TAG}.json
cp target/bench_runs.json target/ab_${TAG}_runs.json
LOAD1=$(cat /proc/loadavg); STEAL1=$(awk '/^cpu /{print $9}' /proc/stat)
echo "{\"load_before\":\"$LOAD0\",\"load_after\":\"$LOAD1\",\"steal_ticks_before\":$STEAL0,\"steal_ticks_after\":$STEAL1,\"steal_delta\":$((STEAL1-STEAL0))}" | tee target/ab_${TAG}_machine.json
echo "DONE $TAG"
