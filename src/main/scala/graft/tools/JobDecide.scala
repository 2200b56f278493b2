package graft.tools

import graft.GraftSession
import graft.rpt.{RptExplain, RptProfiling}

/**
 * Per-query transfer DECISION RECORD over the real JOB workload: for each
 * selected query, rule-off vs rule-on walls plus the executed transfer
 * economics — every probe's rows in/out (measured selectivity) and every
 * build subquery's collect time and size — so a slow rule-on query can be
 * attributed to its mechanism (too many waves of fixed cost, an expensive
 * build scan, a useless probe) instead of guessed at.
 *
 * Usage: SPARK_GRAFT_SF_DIR=<imdbDir> runMain graft.tools.JobDecide 18b 29a
 *   SPARK_GRAFT_RPT_REGIMES=shuffle,broadcast  (default both)
 *   SPARK_GRAFT_BENCH_RUNS=N                   (default 2, min-of-N)
 */
object JobDecide {

  private val tables = Seq("title", "movie_companies", "movie_info",
    "movie_info_idx", "movie_keyword", "cast_info", "complete_cast",
    "comp_cast_type", "company_name", "company_type", "info_type",
    "keyword", "kind_type", "link_type", "movie_link", "name", "aka_name",
    "aka_title", "person_info", "char_name", "role_type")

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      sys.error("set SPARK_GRAFT_SF_DIR"))
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "2").toInt
    val names = args.toSeq
    require(names.nonEmpty, "pass query names, e.g. 18b 29a 17c")
    val regimes: Set[String] = sys.env.get("SPARK_GRAFT_RPT_REGIMES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .getOrElse(Set("broadcast", "shuffle"))

    val spark = GraftSession.build(appName = "graft-job-decide")
    spark.sparkContext.setLogLevel("WARN")
    tables.foreach { t =>
      spark.read.parquet(s"$dir/$t.parquet").createOrReplaceTempView(t)
    }
    val all = JobRealQueries.all.toMap

    def time(sql: String): Double = {
      val t0 = System.nanoTime()
      spark.sql(sql).collect()
      (System.nanoTime() - t0) / 1e9
    }

    // scalastyle:off println
    Seq("broadcast" -> "10485760", "shuffle" -> "-1")
      .filter { case (r, _) => regimes(r) }.foreach { case (regime, bc) =>
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bc)
      names.foreach { name =>
        val sql = all.getOrElse(name, sys.error(s"unknown query $name"))
        spark.conf.set("spark.graft.rpt.enabled", "false")
        time(sql) // warmup
        val off = (1 to runs).map(_ => time(sql)).min
        spark.conf.set("spark.graft.rpt.enabled", "true")
        val df = spark.sql(sql)
        df.collect()
        val on = (1 to runs).map(_ => time(sql)).min
        println(f"== $regime/$name off=$off%.3fs on=$on%.3fs " +
          f"speedup=${off / on}%.2fx")
        println(RptExplain.explain(df))
        println(RptProfiling.report(df))
      }
    }
    // scalastyle:on println
    spark.stop()
  }
}
