// End-to-end drive at the library package boundary (the /verify recipe):
// fixture views, round-7 operators through the public registry, and the
// RPT rule-on/off differential with probe counts. Run with:
//   sbt -batch package
//   /opt/spark/bin/spark-shell --master 'local[8]' \
//     --jars target/scala-2.13/duckdbrobustpredicatetransferspark_2.13-0.1.0.jar \
//     --conf spark.sql.extensions=graft.rpt.RptExtensions \
//     --conf spark.sql.shuffle.partitions=8 \
//     --conf spark.sql.optimizer.runtime.bloomFilter.enabled=false \
//     --conf spark.ui.enabled=false \
//     -I tools/drive.scala 2>/dev/null | grep '\[drive\]'
import org.apache.spark.sql.functions._

val sf = "/root/testdata/sf0.01"
spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
for (t <- Seq("region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"))
  spark.read.parquet(s"$sf/$t.parquet").createOrReplaceTempView(t)

// --- new operators through the public registry ---
val d08 = graft.SparkEntry.queries("d08_dup_clusters")(spark, sf)
val d08rows = d08.collect()
println(s"[drive] d08_dup_clusters rows=${d08rows.length} distinctReps=${d08rows.map(_.getLong(1)).distinct.length}")
assert(d08rows.nonEmpty)

val p04 = graft.SparkEntry.queries("p04_leakage_split")(spark, sf)
val p04rows = p04.collect()
p04rows.foreach(r => println(s"[drive] p04 ${r.getString(0)} n_docs=${r.getLong(1)} n_groups=${r.getLong(2)} n_clustered=${r.getLong(3)}"))
val total = p04rows.map(_.getLong(1)).sum
val docs = spark.table("documents").count()
assert(total == docs, s"p04 covers $total of $docs docs")


// --- d09 through the public registry ---
val d09 = graft.SparkEntry.queries("d09_editdist_neardup")(spark, sf)
val d09rows = d09.collect()
println(s"[drive] d09_editdist_neardup rows=${d09rows.length}")
assert(d09rows.nonEmpty)
assert(d09rows.forall(_.getLong(2) >= 0))

// --- RPT differential at the extensions boundary ---
spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
spark.conf.set("spark.graft.rpt.minProbeRows", "0")
val q = """SELECT n.n_name, count(*) AS cnt
           FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
           JOIN customer c ON o.o_custkey = c.c_custkey
           JOIN nation n ON c.c_nationkey = n.n_nationkey
           WHERE n.n_name = 'NATION_3' GROUP BY n.n_name"""
spark.conf.set("spark.graft.rpt.enabled", "true")
val on = spark.sql(q)
val onPlan = on.queryExecution.optimizedPlan.toString
val onProbes = "might_contain".r.findAllIn(onPlan).length
val onRes = on.collect().map(_.toString).sorted.toSeq
spark.conf.set("spark.graft.rpt.enabled", "false")
val off = spark.sql(q)
val offProbes = "might_contain".r.findAllIn(off.queryExecution.optimizedPlan.toString).length
val offRes = off.collect().map(_.toString).sorted.toSeq
println(s"[drive] probes on=$onProbes off=$offProbes resultsEqual=${onRes == offRes}")
assert(onProbes > 0, "rule on: expected might_contain probes")
assert(offProbes == 0, "rule off: expected no probes")
assert(onRes == offRes, "rule changed results")
spark.conf.set("spark.graft.rpt.enabled", "true")

// single-join stays untouched
val one = spark.sql("SELECT count(*) FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey")
assert("might_contain".r.findAllIn(one.queryExecution.optimizedPlan.toString).isEmpty, "1-edge query must be untouched")
println("[drive] ALL CHECKS PASSED")
System.exit(0)
