// Drive session 2 of 2 (the /verify recipe): the banked-filter stand-down
// differentials, split out of tools/drive.scala because the scala REPL's
// resident compiler crashes on long sessions. r18 NOTE: this environment's
// scalac 2.13.17 REPL corrupts its resident state BETWEEN top-level -I
// statements (observed across runs: "makeLocal called for a symbol whose
// type is Unit", "cannot find T2 in applied type Tuple2",
// "EmptyScope.enter", and bogus "required: Function1" mismatches — each
// silently truncating the session with exit 0), so this entire drive is
// ONE brace-balanced compound statement: the -I reader keeps parsing
// until braces balance, and the resident compiler sees a single unit.
// Run with the same spark-shell invocation as tools/drive.scala,
// substituting -I tools/drive2.scala. Must print "[drive] ALL CHECKS
// PASSED".
{
  var driveFailures = 0
  var driveChecksRun = 0
  def check(cond: Boolean, msg: String): Unit = { driveChecksRun += 1; if (!cond) { driveFailures += 1; println(s"[drive] CHECK FAILED: $msg") } }

  val sf = "/root/testdata/sf0.01"
  spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
  for (t <- Seq("part", "orders", "lineitem"))
    spark.read.parquet(s"$sf/$t.parquet").createOrReplaceTempView(t)

  // --- round 16: banked-filter stand-down (filteredProbeWaveMultiple).
  // A probe site carrying its own selective static predicate accepts no
  // BF probe while its scan volume is under the threshold; an unfiltered
  // probe site never banks; 0 disables; the gate is perf-only.
  spark.conf.set("spark.graft.rpt.minProbeRows", "0")
  spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
  spark.conf.set("spark.graft.rpt.minPlanWorkBytes", "0")
  spark.conf.set("spark.graft.rpt.waveCostBytes", "1")
  spark.conf.set("spark.graft.rpt.waveBuildBytesFraction", "0.0")
  val bkQ = "SELECT count(*) AS n FROM lineitem JOIN orders ON l_orderkey = o_orderkey JOIN part ON l_partkey = p_partkey WHERE p_size < 10 AND o_orderdate < DATE'1992-06-01' AND l_quantity < 3"
  spark.conf.set("spark.graft.rpt.filteredProbeWaveMultiple", String.valueOf(1L << 40))
  val bkOn = spark.sql(bkQ)
  val bkProbes = "might_contain".r.findAllIn(bkOn.queryExecution.optimizedPlan.toString).length
  val bkRes = bkOn.collect().map(_.toString).sorted.toSeq
  spark.conf.set("spark.graft.rpt.filteredProbeWaveMultiple", "0")
  val bkOff = spark.sql(bkQ)
  val bkOffProbes = "might_contain".r.findAllIn(bkOff.queryExecution.optimizedPlan.toString).length
  val bkOffRes = bkOff.collect().map(_.toString).sorted.toSeq
  spark.conf.set("spark.graft.rpt.filteredProbeWaveMultiple", String.valueOf(1L << 40))
  val bkOpenQ = "SELECT count(*) AS n FROM lineitem JOIN orders ON l_orderkey = o_orderkey JOIN part ON l_partkey = p_partkey WHERE p_size < 10 AND o_totalprice > 1000.0"
  val bkOpenProbes = "might_contain".r.findAllIn(spark.sql(bkOpenQ).queryExecution.optimizedPlan.toString).length
  println(s"[drive] bankedFilter gated=$bkProbes restored=$bkOffProbes open=$bkOpenProbes resultsEqual=${bkRes == bkOffRes}")
  check(bkProbes == 0, "filtered probe site must be banked under the gate")
  check(bkOffProbes > 0, "filteredProbeWaveMultiple=0 must restore transfers")
  check(bkOpenProbes > 0, "unfiltered probe site must keep transfers under the gate")
  check(bkRes == bkOffRes, "banked-filter gate changed results")

  // round 17: a probe-site filter embedding a scalar subquery must never
  // reach the planning-time count (countSafe) — the site banks on the
  // unknown-keep prior, and gate-off restores its probes
  val bkSubQ = "SELECT count(*) AS n FROM lineitem JOIN orders ON l_orderkey = o_orderkey JOIN part ON l_partkey = p_partkey WHERE p_size < 10 AND o_orderdate < DATE'1992-06-01' AND l_quantity < (SELECT min(l_quantity) + 2 FROM lineitem)"
  val bkSubOn = spark.sql(bkSubQ)
  val bkSubProbes = "might_contain".r.findAllIn(bkSubOn.queryExecution.optimizedPlan.toString).length
  val bkSubRes = bkSubOn.collect().map(_.toString).sorted.toSeq
  spark.conf.set("spark.graft.rpt.filteredProbeWaveMultiple", "0")
  val bkSubOff = spark.sql(bkSubQ)
  val bkSubOffProbes = "might_contain".r.findAllIn(bkSubOff.queryExecution.optimizedPlan.toString).length
  val bkSubOffRes = bkSubOff.collect().map(_.toString).sorted.toSeq
  println(s"[drive] bankedFilter subquery-filtered gated=$bkSubProbes restored=$bkSubOffProbes resultsEqual=${bkSubRes == bkSubOffRes}")
  check(bkSubProbes == 0, "subquery-filtered probe site must bank on the unknown-keep prior")
  check(bkSubOffProbes > 0, "gate off must restore probes on the subquery-filtered site")
  check(bkSubRes == bkSubOffRes, "subquery-filtered banked gate changed results")

  val driveExpected = 7
  if (driveFailures == 0 && driveChecksRun == driveExpected) println("[drive] ALL CHECKS PASSED") else println(s"[drive] FAILED: $driveFailures failed, $driveChecksRun/$driveExpected checks ran")
  System.exit(if (driveFailures == 0 && driveChecksRun == driveExpected) 0 else 1)
}
