package graft.rpt

/**
 * Rule-on/off differential over the 33 JOB topologies of
 * [[JobTopologies]] — the measured counterpart of [[JobTopologySuite]]'s
 * correctness pin, at a scale where the transfer pays (default
 * `benchdata/sf1`). Shipping defaults, shuffle regime
 * (`autoBroadcastJoinThreshold=-1`, the reference's protocol analog),
 * min-of-N wall seconds per config, results asserted identical (the
 * global-MIN/count output is aggregation-order-independent, so exact
 * compare is safe). One JSON line.
 *
 * Usage: sbt "Test/runMain graft.rpt.JobTopologyBench [runs]"
 *        (GRAFT_JOB_SF overrides the fixture dir;
 *         GRAFT_JOB_QUERIES=1,29,30 limits the families — the sf10
 *         decade check runs the depth envelope plus a shallow control
 *         instead of all 33 × 4 executions of 10× data)
 */
object JobTopologyBench {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("GRAFT_JOB_SF", "/root/repo/benchdata/sf1")
    val runs = args.headOption.map(_.toInt).getOrElse(2)
    val spark = graft.GraftSession.build(appName = "graft-job-topo-bench")
    spark.sparkContext.setLogLevel("WARN")
    // shuffle regime by default (the reference's protocol analog);
    // GRAFT_JOB_REGIME=broadcast keeps Spark's default threshold so AQE
    // broadcast conversions stay in play
    val regime = sys.env.getOrElse("GRAFT_JOB_REGIME", "shuffle")
    if (regime == "shuffle") {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    }

    val tbls = JobTopologies.tableNames
      .map(n => n -> spark.read.parquet(s"$sfDir/$n.parquet")).toMap
    val onlyQ = sys.env.get("GRAFT_JOB_QUERIES")
      .map(_.split(",").map(_.trim.toInt).toSet)
    val families = JobTopologies.all
      .filter(t => onlyQ.forall(_.contains(t.q)))

    // one warm pass over the first selected shape: every family reuses
    // the same 7 tables, so page cache + codegen caches are hot before
    // any timed window (an unwarmed first config pays cold I/O the
    // second doesn't, inflating the differential)
    spark.conf.set(RptConf.ENABLED, "false")
    JobTopologies.build(families.head, tbls).collect()

    def timed(t: JobTopologies.Topo): (Double, String) = {
      var best = Double.MaxValue
      var res = ""
      for (_ <- 1 to runs) {
        val t0 = System.nanoTime()
        val rows = JobTopologies.build(t, tbls).collect()
        val sec = (System.nanoTime() - t0) / 1e9
        if (sec < best) best = sec
        res = rows.mkString
      }
      (best, res)
    }

    val out = new StringBuilder
    var rewritten = 0
    val speedups = scala.collection.mutable.ArrayBuffer[Double]()
    val perQ = scala.collection.mutable.LinkedHashMap[String, String]()
    families.foreach { t =>
      spark.conf.set(RptConf.ENABLED, "false")
      val (offSec, offRes) = timed(t)
      spark.conf.set(RptConf.ENABLED, "true")
      if (JobTopologies.build(t, tbls).queryExecution.optimizedPlan
          .toString.contains("might_contain")) rewritten += 1
      val (onSec, onRes) = timed(t)
      require(offRes == onRes, s"q${t.q} results diverged: $onRes vs $offRes")
      val sp = offSec / onSec
      speedups += sp
      perQ(s"q${t.q}") =
        f""""q${t.q}":{"rel":${t.relations},"off":$offSec%.3f,"on":$onSec%.3f,"speedup":$sp%.3f}"""
      // scalastyle:off println
      println(f"[jobtopo] q${t.q}%-3d rel=${t.relations}%-3d off=$offSec%7.3f on=$onSec%7.3f  ${sp}%5.2fx")
      // scalastyle:on println
    }
    val geomean = math.exp(speedups.map(math.log).sum / speedups.size)
    val faster = speedups.count(_ >= 1.1)
    val slower = speedups.count(_ <= 0.9)
    out ++= f"""{"sf":"$sfDir","runs":$runs,"regime":"$regime","rewritten":$rewritten,"geomean":$geomean%.3f,"faster":$faster,"slower":$slower,"same":${families.size - faster - slower},"""
    out ++= perQ.values.mkString("\"queries\":{", ",", "}}")
    // scalastyle:off println
    println(out.toString)
    // scalastyle:on println
    spark.stop()
  }
}
