package graft.tools

import graft.GraftSession

/**
 * Runs the reconstructed 113-query JOB workload ([[JobRealQueries]]) on
 * the synthetic IMDB fixtures ([[ImdbFixtures]]) rule-on vs rule-off:
 * the real-text counterpart of [[graft.rpt.JobTopologies]] (which pins
 * the 33 join SHAPES on TPC-H-ish fixtures) — same predicates, same
 * 21-table schema, same MIN-aggregate outputs as the workload the
 * reference validates with (test_job_queries.sh).
 *
 * Per query and regime: rule-off result + wall, rule-on result + wall
 * (min of SPARK_GRAFT_BENCH_RUNS runs, warmup untimed), results REQUIRED
 * identical. One JSON line at the end (JOBREAL_JSON ...) with per-query
 * times and the differential geomean.
 *
 * Usage: SPARK_GRAFT_SF_DIR=<imdbDir> runMain graft.tools.JobReal
 *   SPARK_GRAFT_RPT_REGIMES=shuffle,broadcast  (default both)
 *   SPARK_GRAFT_BENCH_QUERIES=1a,17f           (default all 113)
 *   SPARK_GRAFT_BENCH_RUNS=N                   (default 1)
 */
object JobReal {

  /** Prior JOBREAL pins: regime -> query -> BEST recorded differential
    * speedup, from every `JOBREAL_r*.json` in `dir` whose fixture path
    * matches this run's (path-anchored like [[graft.Bench.priorPins]]).
    * Speedups, not walls: the ratio is box-speed-invariant, so a pin from
    * a faster round still identifies a RULE regression (a query whose
    * differential collapsed), never a slower box. Unparseable or
    * foreign-fixture artifacts contribute nothing. */
  private[graft] def priorPins(dir: String, fixtureDir: String)
      : Map[String, Map[String, Double]] = {
    val want = fixtureDir.replaceAll("/+$", "")
    val files = Option(new java.io.File(dir).listFiles())
      .getOrElse(Array.empty)
      .filter(_.getName.matches("JOBREAL_r\\d+\\.json"))
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val acc = scala.collection.mutable.Map[(String, String), Double]()
    files.foreach { f =>
      try {
        val root = om.readTree(f)
        val recorded = root.path("dir").asText("").replaceAll("/+$", "")
        if (recorded == want) {
          Seq("broadcast", "shuffle").foreach { regime =>
            val qs = root.path(regime).path("queries")
            qs.properties().forEach { e =>
              val s = e.getValue.path("speedup")
              val ok = e.getValue.path("match").asBoolean(true)
              if (s.isNumber && s.asDouble > 0 && ok) {
                val k = (regime, e.getKey)
                acc(k) = math.max(acc.getOrElse(k, 0.0), s.asDouble)
              }
            }
          }
        }
      } catch { case _: Exception => () }
    }
    acc.groupBy(_._1._1).map { case (regime, m) =>
      regime -> m.map { case ((_, q), v) => q -> v }.toMap
    }
  }

  private val tables = Seq("title", "movie_companies", "movie_info",
    "movie_info_idx", "movie_keyword", "cast_info", "complete_cast",
    "comp_cast_type", "company_name", "company_type", "info_type",
    "keyword", "kind_type", "link_type", "movie_link", "name", "aka_name",
    "aka_title", "person_info", "char_name", "role_type")

  def main(args: Array[String]): Unit = {
    val dir = args.headOption
      .orElse(sys.env.get("SPARK_GRAFT_SF_DIR"))
      .getOrElse(sys.error("pass <imdbDir> or set SPARK_GRAFT_SF_DIR"))
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "1").toInt
    val only: Set[String] = sys.env.get("SPARK_GRAFT_BENCH_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .getOrElse(Set.empty)
    val regimes: Set[String] = sys.env.get("SPARK_GRAFT_RPT_REGIMES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .getOrElse(Set.empty)

    val spark = GraftSession.build(appName = "graft-job-real")
    spark.sparkContext.setLogLevel("WARN")
    tables.foreach { t =>
      spark.read.parquet(s"$dir/$t.parquet").createOrReplaceTempView(t)
    }

    val queries = JobRealQueries.all
      .filter { case (n, _) => only.isEmpty || only(n) }
    require(queries.nonEmpty, s"query filter matched nothing: $only")

    // a MIN-aggregate query returns exactly one row; stringify with fixed
    // formatting so NULLs and numerics compare cleanly
    def result(sql: String): String = {
      val row = spark.sql(sql).collect()(0)
      (0 until row.length).map { i =>
        if (row.isNullAt(i)) "NULL" else String.valueOf(row.get(i))
      }.mkString("|")
    }

    def time(sql: String): Double = {
      val t0 = System.nanoTime()
      spark.sql(sql).collect()
      (System.nanoTime() - t0) / 1e9
    }

    def cls(s: Double): String =
      if (s > 1.05) "faster" else if (s < 0.95) "slower" else "same"

    val regimePlan = Seq("broadcast" -> "10485760", "shuffle" -> "-1")
      .filter { case (r, _) => regimes.isEmpty || regimes(r) }
    require(regimePlan.nonEmpty, s"regime filter matched nothing: $regimes")

    val mismatches = scala.collection.mutable.ArrayBuffer[String]()
    // cross-round differential pins: a query whose best recorded speedup
    // was a real win (>= 1.2x) and now measures under 2/3 of it is
    // flagged — the self-identification a one-shot artifact lacks
    val pins = priorPins(".", dir)
    val regimeJsons = regimePlan.map { case (regime, bc) =>
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bc)
      val rows = queries.map { case (name, sql) =>
        spark.conf.set("spark.graft.rpt.enabled", "false")
        time(sql) // warmup, untimed
        val offRes = result(sql)
        spark.conf.set("spark.graft.rpt.enabled", "true")
        val onRes = result(sql)
        if (onRes != offRes) {
          mismatches += s"$regime/$name: on=$onRes off=$offRes"
        }
        val (offs, ons) = (1 to runs).map { _ =>
          spark.conf.set("spark.graft.rpt.enabled", "false")
          val off = time(sql)
          spark.conf.set("spark.graft.rpt.enabled", "true")
          val on = time(sql)
          (off, on)
        }.unzip
        (name, offs.min, ons.min, offs.min / ons.min, offRes == onRes)
      }
      val geo = math.exp(rows.map(r => math.log(r._4)).sum / rows.size)
      // scalastyle:off println
      println(s"== regime: $regime (autoBroadcastJoinThreshold=$bc)")
      rows.foreach { case (name, off, on, s, eq) =>
        println(f"  $name%-4s off=$off%7.3fs on=$on%7.3fs " +
          f"speedup=$s%5.2fx ${cls(s)}%-6s match=$eq")
      }
      println(f"  geomean speedup: $geo%.3fx (" +
        s"${rows.count(r => cls(r._4) == "faster")} faster / " +
        s"${rows.count(r => cls(r._4) == "slower")} slower / " +
        s"${rows.count(r => cls(r._4) == "same")} same), " +
        s"matches ${rows.count(_._5)}/${rows.size}")
      // scalastyle:on println
      val regPins = pins.getOrElse(regime, Map.empty)
      val regressed = rows.flatMap { case (n, _, _, s, _) =>
        regPins.get(n).filter(p => p >= 1.2 && s < p * 2.0 / 3.0)
          .map(p => (n, p, s))
      }
      // scalastyle:off println
      regressed.foreach { case (n, p, s) =>
        println(f"  REGRESSION $n: best recorded speedup $p%.2fx, now $s%.2fx")
      }
      // scalastyle:on println
      val regJson = regressed.map { case (n, p, s) =>
        f""""$n":{"pin":$p%.3f,"now":$s%.3f}"""
      }.mkString(",")
      val qJson = rows.map { case (n, off, on, s, eq) =>
        f""""$n":{"off":$off%.3f,"on":$on%.3f,"speedup":$s%.3f,"match":$eq}"""
      }.mkString(",")
      f""""$regime":{"geomean":$geo%.3f,"matches":${rows.count(_._5)},"total":${rows.size},"regressions":{$regJson},"queries":{$qJson}}"""
    }

    // scalastyle:off println
    println(s"""JOBREAL_JSON {"dir":"$dir","runs":$runs,${regimeJsons.mkString(",")}}""")
    // scalastyle:on println
    require(mismatches.isEmpty,
      s"${mismatches.size} differential mismatches:\n${mismatches.take(5).mkString("\n")}")
    spark.stop()
  }
}
