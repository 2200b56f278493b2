package graft.rpt

import java.nio.file.Files

import graft.SparkTestBase

/**
 * Cross-query selectivity feedback (reference analog:
 * `SelectivityOptionalFilter`, rpt_optimizer.cpp:1482-1491): a probe that
 * measured ~no reduction is not re-injected when the same query shape is
 * planned again; a selective probe survives re-planning.
 */
class ProbeFeedbackSuite extends SparkTestBase {

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft_fb_").toFile
    d.deleteOnExit()
    import spark.implicits._
    spark.range(0, 40000)
      .selectExpr("id as k", "id % 97 as grp")
      .write.mode("overwrite").parquet(s"${d.getAbsolutePath}/fact.parquet")
    // dimAll covers EVERY fact key (probe keep-rate 1.0 — the no-win
    // build); dimFew covers two keys (selective — the probe must stay)
    spark.range(0, 40000).selectExpr("id as dk", "'keep' as tag")
      .write.mode("overwrite").parquet(s"${d.getAbsolutePath}/dimall.parquet")
    Seq((100L, "keep"), (200L, "keep"), (30000L, "drop")).toDF("dk", "tag")
      .write.mode("overwrite").parquet(s"${d.getAbsolutePath}/dimfew.parquet")
    Seq.tabulate(97)(i => (i.toLong, s"g$i")).toDF("gk", "gname")
      .write.mode("overwrite").parquet(s"${d.getAbsolutePath}/grp.parquet")
    d.getAbsolutePath
  }

  private def query(dim: String): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val fact = spark.read.parquet(s"$dir/fact.parquet")
    val d = spark.read.parquet(s"$dir/$dim.parquet").where("tag = 'keep'")
    val grp = spark.read.parquet(s"$dir/grp.parquet")
    fact.join(d, $"k" === $"dk").join(grp, $"grp" === $"gk")
      .groupBy($"tag").count()
  }

  private def probeCount(df: org.apache.spark.sql.DataFrame): Int =
    "might_contain".r
      .findAllIn(df.queryExecution.optimizedPlan.toString).length

  /** The feedback recording rides the ASYNC QueryExecutionListener bus —
    * poll until the cache grew (or time out). */
  private def awaitFeedback(minSize: Int): Unit = {
    val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
    while (ProbeFeedback.size < minSize && System.nanoTime() < deadline) {
      Thread.sleep(50)
    }
    assert(ProbeFeedback.size >= minSize,
      s"feedback cache never reached $minSize entries (has ${ProbeFeedback.size})")
  }

  /** Execute the plan AS BUILT (no select-reorder wrapper): the feedback
    * identity includes the query-plan hash, so the executed plan must be
    * the same shape the next planning round will produce. */
  private def fp(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("a probe that measured useless is not re-injected; a selective one is") {
    ProbeFeedback.clear()
    withConf(
      RptConf.PROBE_FEEDBACK -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      RptConf.FILTERED_BUILDS_ONLY -> "false") {
      // --- no-win shape: dimAll keeps every fact key ---
      val r1 = query("dimall")
      val probes1 = probeCount(r1)
      assert(probes1 > 0, "first planning must inject probes")
      val rows1 = fp(r1) // executes; listener records keep-rates
      awaitFeedback(1)
      val r2 = query("dimall")
      val probes2 = probeCount(r2)
      assert(probes2 < probes1,
        s"measured-useless probes must not be re-injected ($probes1 -> $probes2)")
      assert(fp(r2) === rows1, "suppression changed results")
      val off = withConf(RptConf.ENABLED -> "false")(fp(query("dimall")))
      assert(rows1 === off)

      // --- selective shape: dimFew keeps 2 of 40000 keys ---
      val s1 = query("dimfew")
      val sProbes1 = probeCount(s1)
      assert(sProbes1 > 0, "selective shape must inject probes")
      fp(s1)
      // wait for ITS records too (cache strictly grows; the dimall shape
      // already contributed 2 entries)
      awaitFeedback(3)
      val sProbes2 = probeCount(query("dimfew"))
      assert(sProbes2 === sProbes1,
        s"selective probes must survive re-planning ($sProbes1 -> $sProbes2)")
    }
  }

  test("feedback off: plans are identical across runs (no alias tags)") {
    ProbeFeedback.clear()
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      RptConf.FILTERED_BUILDS_ONLY -> "false") {
      val p1 = query("dimall")
      val n1 = probeCount(p1)
      assert(n1 > 0)
      fp(p1)
      Thread.sleep(200) // give the async listener a chance to mis-record
      assert(ProbeFeedback.size === 0,
        "feedback must not record when the conf is off")
      assert(probeCount(query("dimall")) === n1)
      // no feedback tags in the subquery aliases when off
      assert(!p1.queryExecution.optimizedPlan.toString.contains("graft_rpt_bf_fwd_q"),
        "alias tags must be absent with feedback off")
    }
  }

  test("over-cap eviction keeps the newest entries instead of clearing all") {
    ProbeFeedback.clear()
    try {
      // 600 distinct probe shapes: the cap is 512, so eviction must fire —
      // and the NEWEST records (the live workload) must survive it
      (1 to 600).foreach { i =>
        ProbeFeedback.record(s"shape_$i|k", keep = 0.99,
          rowsIn = ProbeFeedback.MinRows)
      }
      assert(ProbeFeedback.size > 0 && ProbeFeedback.size <= 513,
        s"cache size ${ProbeFeedback.size} escaped the cap")
      // the most recent shapes are still suppressing; a clear-all would
      // have lost them
      assert(ProbeFeedback.suppress("shape_600|k", 0.98),
        "newest entry was evicted")
      assert(ProbeFeedback.suppress("shape_550|k", 0.98),
        "recent entry was evicted")
      // the oldest half is the evicted half
      assert(!ProbeFeedback.suppress("shape_1|k", 0.98),
        "oldest entry survived an over-cap eviction")
    } finally ProbeFeedback.clear()
  }
}
