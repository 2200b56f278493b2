package graft.tools

import org.apache.spark.sql.DataFrame

import graft.GraftSession

/**
 * Edge-count ladder for the deep-plan broadcast-gate boundary
 * (`spark.graft.rpt.deepPlanEdges`, default 6): the round-11 finding was
 * that plans at or past the boundary run 1.5–3x faster with the
 * broadcast-skip gate BYPASSED, while 3–5-table shapes lose 15–30% with
 * probes — but the default sat on measurements of only two workload
 * shapes. This probe measures one JOIN CHAIN at every length from 4 to
 * 12 edges, in the broadcast regime (the only regime the gate affects),
 * under three configs:
 *
 *  - `off`    — rule disabled (the baseline the gate protects);
 *  - `gated`  — deepPlanEdges=999: the margin-widened broadcast skip
 *               applies at every depth (the shallow-plan treatment);
 *  - `bypass` — deepPlanEdges=1: every plan counts as deep, the gate is
 *               skipped and transfers run (the deep-plan treatment).
 *
 * The default boundary is justified if `gated` ~= `off` everywhere
 * (the gate stands the rule down cleanly) while `bypass` crosses from
 * below `off` (probe overhead) to above it as edges grow; the crossover
 * edge count is the empirical boundary. One JSON line `LADDER_JSON {...}`.
 *
 * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.tools.DeepGateLadder [runs]
 */
object DeepGateLadder {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val runs = args.headOption.map(_.toInt).getOrElse(3)
    val spark = GraftSession.build(appName = "graft-deepgate-ladder")
    import org.apache.spark.sql.functions._

    def t(name: String) = spark.read.parquet(s"$sfDir/$name.parquet")

    /** Chain with exactly `edges` joins (edges+1 tables), selective
      * filters on the region and part dims so transfers carry signal;
      * every extension keeps fan-out ~1 per lineitem row. */
    def chain(edges: Int): DataFrame = {
      val l = t("lineitem")
      val o = t("orders")
      val c = t("customer")
      val n = t("nation")
      val r = t("region").where("r_name = 'ASIA'")
      val p = t("part").where("p_size < 10")
      val s = t("supplier")
      val n2 = t("nation").toDF(t("nation").columns.map(_ + "_2").toSeq: _*)
      val r2 = t("region").toDF(t("region").columns.map(_ + "_2").toSeq: _*)
      val o2 = t("orders").toDF(t("orders").columns.map(_ + "_2").toSeq: _*)
      val c2 = t("customer").toDF(t("customer").columns.map(_ + "_2").toSeq: _*)
      val n3 = t("nation").toDF(t("nation").columns.map(_ + "_3").toSeq: _*)
      val steps: Seq[DataFrame => DataFrame] = Seq(
        df => df.join(o, col("l_orderkey") === col("o_orderkey")),
        df => df.join(c, col("o_custkey") === col("c_custkey")),
        df => df.join(n, col("c_nationkey") === col("n_nationkey")),
        df => df.join(r, col("n_regionkey") === col("r_regionkey")),
        df => df.join(p, col("l_partkey") === col("p_partkey")),
        df => df.join(s, col("l_suppkey") === col("s_suppkey")),
        df => df.join(n2, col("s_nationkey") === col("n_nationkey_2")),
        df => df.join(r2, col("n_regionkey_2") === col("r_regionkey_2")),
        df => df.join(o2, col("l_orderkey") === col("o_orderkey_2")),
        df => df.join(c2, col("o_custkey_2") === col("c_custkey_2")),
        df => df.join(n3, col("c_nationkey_2") === col("n_nationkey_3")),
        df => df.join(t("part").toDF(t("part").columns.map(_ + "_2").toSeq: _*),
          col("l_partkey") === col("p_partkey_2")))
      require(edges <= steps.size, s"ladder tops out at ${steps.size} edges")
      steps.take(edges).foldLeft(l: DataFrame)((acc, f) => f(acc))
        .agg(count(lit(1)).as("n"), min(col("l_extendedprice")).as("m"))
    }

    def time(edges: Int): Double = {
      val t0 = System.nanoTime()
      chain(edges).collect()
      (System.nanoTime() - t0) / 1e9
    }

    // broadcast regime: stock threshold — the regime the gate exists for
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    val configs = Seq(
      "off" -> Seq("spark.graft.rpt.enabled" -> "false"),
      "gated" -> Seq("spark.graft.rpt.enabled" -> "true",
        "spark.graft.rpt.deepPlanEdges" -> "999",
        "spark.graft.rpt.deepPlanProbeRows" -> "999999999999"),
      "bypass" -> Seq("spark.graft.rpt.enabled" -> "true",
        "spark.graft.rpt.deepPlanEdges" -> "1"),
      "default" -> Seq("spark.graft.rpt.enabled" -> "true",
        "spark.graft.rpt.deepPlanEdges" -> "6",
        "spark.graft.rpt.deepPlanProbeRows" -> "16777216"))

    val out = new StringBuilder("LADDER_JSON {")
    (4 to 12).zipWithIndex.foreach { case (edges, i) =>
      // per-config result row, collected UNDER that config: a correctness
      // regression in any config must fail the ladder, not hide behind a
      // single collect under whatever conf the loop left last
      val resultRows = scala.collection.mutable.Map[String, org.apache.spark.sql.Row]()
      val row = configs.map { case (cname, confs) =>
        confs.foreach { case (k, v) => spark.conf.set(k, v) }
        time(edges) // warmup (also absorbs first-planning costs)
        val best = (1 to runs).map(_ => time(edges)).min
        resultRows(cname) = chain(edges).collect().head
        spark.conf.set("spark.graft.rpt.deepPlanEdges", "6")
        spark.conf.unset("spark.graft.rpt.deepPlanProbeRows")
        cname -> best
      }.toMap
      val counts = resultRows("off")
      require(resultRows.values.forall(_ == counts),
        s"config results disagree at $edges edges: $resultRows")
      if (i > 0) out.append(",")
      out.append(f""""e$edges":{"off":${row("off")}%.3f,"gated":${row("gated")}%.3f,""" +
        f""""bypass":${row("bypass")}%.3f,"default":${row("default")}%.3f,""" +
        f""""gated_vs_off":${row("off") / row("gated")}%.3f,""" +
        f""""bypass_vs_off":${row("off") / row("bypass")}%.3f,""" +
        f""""default_vs_off":${row("off") / row("default")}%.3f,"rows":${counts.getLong(0)}}""")
      // scalastyle:off println
      println(f"edges=$edges off=${row("off")}%.2fs gated=${row("gated")}%.2fs " +
        f"bypass=${row("bypass")}%.2fs default=${row("default")}%.2fs " +
        f"default_speedup=${row("off") / row("default")}%.2fx")
      // scalastyle:on println
    }
    out.append(s""","sf":"$sfDir","runs":$runs}""")
    // scalastyle:off println
    println(out.toString)
    // scalastyle:on println
    spark.stop()
  }
}
