#!/bin/bash
# Idle A/B for initialPartitionNum attribution (VERDICT r10 item 1).
# Usage: ab_bench.sh <parts> <reps> <outtag>
set -e
PARTS=$1; REPS=$2; TAG=$3
ADDOPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
cd /root/repo
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_REPS=$REPS \
SPARK_GRAFT_INITIAL_PARTS=$PARTS \
SPARK_GRAFT_ONLY="e2e_full_load,x106_retrieval_e2e,x97_leakage_safe_split,x21_simhash_neardup,x73_provenance_e2e" \
java $ADDOPENS -Xmx16g -Xms16g -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "target/bench-classes:/opt/spark/jars/*" graft.Bench 2>target/ab_${TAG}.log
cp target/bench.json target/ab_${TAG}.json
cp target/bench_runs.json target/ab_${TAG}_runs.json
echo "DONE $TAG"
