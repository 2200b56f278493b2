#!/bin/bash
# Round-18 factor-2 crossover re-measure (VERDICT r17 Next #3 validation):
# the residual losers (18b/19c/31b), their recovered siblings (2a/8b/29a)
# and the winner-control (33a), runs=3, both regimes, on the binary with
# the effective-card big-build admission. Quiet box, one JVM, private
# spark.local.dir via GraftSession — no shared /tmp globs.
set -u
cd /root/repo
CP="target/scala-2.13/classes:/opt/spark/jars/*"
ADD_OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
JAVA="java $ADD_OPENS -Xmx48g -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -cp $CP"
LOG=logs/jobreal_f2_r18.log
echo "=== f2 sweep start $(date -u +%H:%M:%S) ===" > "$LOG"
SPARK_GRAFT_SF_DIR=/root/repo/benchdata/imdb_job_f2 \
SPARK_GRAFT_BENCH_QUERIES=2a,8b,18b,19c,29a,31b,33a \
SPARK_GRAFT_BENCH_RUNS=3 SPARK_GRAFT_CPUS=32 \
timeout --signal=TERM 5400 $JAVA graft.tools.JobReal >> "$LOG" 2>&1
echo "=== f2 rc=$? $(date -u +%H:%M:%S) ===" >> "$LOG"
