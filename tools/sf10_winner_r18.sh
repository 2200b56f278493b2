#!/bin/bash
# ADVICE r17 item 3: re-bench the sf10 mid-band WINNER class on the
# effective-bytes binary. The at-risk query is job_min_chain (filtered
# probe: l_quantity > 45 keeps ~10% x 1.2 GB lineitem = mid-band, and
# the r17 budget discount funds ~18 MB instead of ~180 MB — its orders
# build may now stand down). star_part_filter and chain5_selective are
# unfiltered-probe controls; q35_job_depth is the deep winner control.
set -u
cd /root/repo
CP="target/scala-2.13/classes:/opt/spark/jars/*"
ADD_OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
JAVA="java $ADD_OPENS -Xmx48g -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -cp $CP"
LOG=logs/sf10_winner_r18.log
if [ ! -d benchdata/sf10 ]; then
  echo "=== sf10 gen $(date -u +%H:%M:%S) ===" > "$LOG"
  SPARK_GRAFT_CPUS=32 timeout 900 $JAVA graft.tools.ScaleFixtures \
    /root/testdata/sf0.1 benchdata/sf10 100 >> "$LOG" 2>&1
  echo "=== gen rc=$? $(date -u +%H:%M:%S) ===" >> "$LOG"
fi
echo "=== sf10 winner bench $(date -u +%H:%M:%S) ===" >> "$LOG"
SPARK_GRAFT_SF_DIR=/root/repo/benchdata/sf10 \
SPARK_GRAFT_BENCH_QUERIES=job_min_chain,star_part_filter,chain5_selective,q35_job_depth \
SPARK_GRAFT_RPT_REGIMES=shuffle \
SPARK_GRAFT_BENCH_RUNS=2 \
SPARK_GRAFT_CPUS=32 \
timeout --signal=TERM 3000 $JAVA graft.RptBench >> "$LOG" 2>&1
echo "=== bench rc=$? $(date -u +%H:%M:%S) ===" >> "$LOG"
