#!/bin/bash
# Round-18 sf100 deep-trio re-measure (VERDICT r17 Next #1).
#
# Protocol notes (learned the hard way in r17):
#  - NO `rm -rf` of ANY shared glob. Each JVM gets a private
#    spark.local.dir via GraftSession (target/spark-local/pid-<pid>) and
#    this script cleans ONLY the pid dirs of JVMs it spawned and reaped.
#  - One query per JVM (shuffle/temp space reclaimed between queries).
#  - Hard deadline via `timeout` so the script can NEVER outlive the
#    round: pass seconds as $1 (default 3 h). A killed leg loses only
#    itself; completed RPTBENCH_JSON lines are already in the log.
#  - runs=3, broadcast regime (the regime of the contested r17 trio).
set -u
cd /root/repo
DEADLINE=${1:-10800}
LOG=logs/rptbench_sf100_r18.log
CP="target/scala-2.13/classes:/opt/spark/jars/*"
ADD_OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
START=$(date +%s)
echo "=== sf100 trio r18 start $(date -u +%H:%M:%S) deadline=${DEADLINE}s ===" >> "$LOG"
# q27 first (the contested inversion) at the full runs=3; q36 (the
# second-largest giveback) then q35 at runs=2 — the deadline decides how
# many legs land, ordered by adjudication value
for SPEC in q27_wide_join:3 q36_job_width:2 q35_job_depth:2; do
  Q=${SPEC%%:*}; R=${SPEC##*:}
  NOW=$(date +%s); LEFT=$(( DEADLINE - (NOW - START) ))
  if [ "$LEFT" -le 600 ]; then echo "=== deadline reached before $Q ===" >> "$LOG"; break; fi
  echo "=== trio: $Q runs=$R $(date -u +%H:%M:%S) budget=${LEFT}s ===" >> "$LOG"
  SPARK_GRAFT_SF_DIR=/root/repo/benchdata/sf100 \
  SPARK_GRAFT_BENCH_QUERIES=$Q \
  SPARK_GRAFT_RPT_REGIMES=broadcast \
  SPARK_GRAFT_BENCH_RUNS=$R \
  SPARK_GRAFT_BENCH_WARMUP=0 \
  SPARK_GRAFT_CPUS=32 \
  timeout --signal=TERM "$LEFT" \
    java $ADD_OPENS -Xmx96g -Dspark.ui.enabled=false \
      -Dspark.sql.session.timeZone=UTC -cp "$CP" graft.RptBench \
      >> "$LOG" 2>&1
  rc=$?
  echo "=== $Q rc=$rc $(date -u +%H:%M:%S) ===" >> "$LOG"
  # clean ONLY our own now-dead JVM's private scratch (reaped above)
  find target/spark-local -maxdepth 1 -name 'pid-*' -type d 2>/dev/null | while read -r d; do
    pid=${d##*/pid-}
    if ! kill -0 "$pid" 2>/dev/null; then rm -rf "$d"; fi
  done
done
echo "=== trio done $(date -u +%H:%M:%S) ===" >> "$LOG"
