#!/bin/bash
# Round-18 fixture regeneration (sandbox reset wiped gitignored benchdata/).
# Deterministic generators — outputs are bit-identical to prior rounds.
# No shared /tmp globs; each JVM uses GraftSession's private spark.local.dir.
set -u
cd /root/repo
CP="target/scala-2.13/classes:/opt/spark/jars/*"
ADD_OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
JAVA="java $ADD_OPENS -Xmx48g -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -cp $CP"
mkdir -p logs
LOG=logs/r18_genfixtures.log
echo "=== gen start $(date -u +%H:%M:%S) ===" > "$LOG"
SPARK_GRAFT_CPUS=32 $JAVA graft.tools.ImdbFixtures /root/repo/benchdata/imdb_job 0.5 >> "$LOG" 2>&1
echo "=== imdb_job rc=$? $(date -u +%H:%M:%S) ===" >> "$LOG"
SPARK_GRAFT_CPUS=32 $JAVA graft.tools.ImdbFixtures /root/repo/benchdata/imdb_job_f2 2 >> "$LOG" 2>&1
echo "=== imdb_job_f2 rc=$? $(date -u +%H:%M:%S) ===" >> "$LOG"
SPARK_GRAFT_CPUS=32 $JAVA graft.tools.ScaleFixtures /root/testdata/sf0.1 /root/repo/benchdata/sf100 1000 >> "$LOG" 2>&1
echo "=== sf100 rc=$? $(date -u +%H:%M:%S) ===" >> "$LOG"
echo "=== gen done $(date -u +%H:%M:%S) ===" >> "$LOG"
