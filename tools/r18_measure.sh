#!/bin/bash
# Round-18 interactive-scale measurement sequence (quiet box, one JVM per
# step, private spark.local.dir via GraftSession — no shared /tmp globs).
#  1. JOBREAL_r16.md TBD fills: 33a shuffle solo + 5b broadcast solo, runs=3
#  2. 12a/12c broadcast decision record (VERDICT r17 Next #6), runs=3
#  3. factor-2 crossover subset, runs=3, both regimes (validates the
#     effective-card admission fix; VERDICT r17 Next #3)
set -u
cd /root/repo
CP="target/scala-2.13/classes:/opt/spark/jars/*"
ADD_OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
JAVA="java $ADD_OPENS -Xmx16g -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -cp $CP"

echo "=== r18 measure start $(date -u +%H:%M:%S) ===" > logs/r18_measure.log

SPARK_GRAFT_SF_DIR=/root/repo/benchdata/imdb_job \
SPARK_GRAFT_BENCH_QUERIES=33a SPARK_GRAFT_RPT_REGIMES=shuffle \
SPARK_GRAFT_BENCH_RUNS=3 SPARK_GRAFT_CPUS=32 \
timeout --signal=TERM 2400 $JAVA graft.tools.JobReal >> logs/r18_measure.log 2>&1
echo "=== 33a rc=$? $(date -u +%H:%M:%S) ===" >> logs/r18_measure.log

SPARK_GRAFT_SF_DIR=/root/repo/benchdata/imdb_job \
SPARK_GRAFT_BENCH_QUERIES=5b SPARK_GRAFT_RPT_REGIMES=broadcast \
SPARK_GRAFT_BENCH_RUNS=3 SPARK_GRAFT_CPUS=32 \
timeout --signal=TERM 2400 $JAVA graft.tools.JobReal >> logs/r18_measure.log 2>&1
echo "=== 5b rc=$? $(date -u +%H:%M:%S) ===" >> logs/r18_measure.log

SPARK_GRAFT_SF_DIR=/root/repo/benchdata/imdb_job \
SPARK_GRAFT_RPT_REGIMES=broadcast SPARK_GRAFT_BENCH_RUNS=3 \
SPARK_GRAFT_CPUS=32 \
timeout --signal=TERM 2400 $JAVA graft.tools.JobDecide 12a 12c > logs/r18_decide12.log 2>&1
echo "=== decide12 rc=$? $(date -u +%H:%M:%S) ===" >> logs/r18_measure.log

SPARK_GRAFT_SF_DIR=/root/repo/benchdata/imdb_job_f2 \
SPARK_GRAFT_BENCH_QUERIES=2a,6d,8b,16a,17c,18b,19c,29a,31b,33a \
SPARK_GRAFT_BENCH_RUNS=3 SPARK_GRAFT_CPUS=32 \
timeout --signal=TERM 4800 $JAVA graft.tools.JobReal > logs/jobreal_f2_r18.log 2>&1
echo "=== f2 rc=$? $(date -u +%H:%M:%S) ===" >> logs/r18_measure.log

echo "=== r18 measure done $(date -u +%H:%M:%S) ===" >> logs/r18_measure.log
