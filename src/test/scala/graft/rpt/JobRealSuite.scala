package graft.rpt

import graft.SparkTestBase
import graft.tools.{ImdbFixtures, JobRealQueries}

/**
 * The reconstructed real-text JOB workload (113 queries,
 * [[graft.tools.JobRealQueries]]) on a tiny synthetic IMDB
 * ([[graft.tools.ImdbFixtures]]): every query must parse, run, and be
 * rule-on ≡ rule-off; the planted hero block must make the tightest
 * conjunctions non-empty (they are non-empty on the real IMDB — an
 * all-NULL MIN row would mean the differential tests a vacuous plan).
 * The at-scale differential is measured by [[graft.tools.JobReal]]
 * (JOBREAL artifact); this suite is the correctness pin.
 */
class JobRealSuite extends SparkTestBase {

  private lazy val imdbDir: String = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_imdb_suite_").toString
    ImdbFixtures.write(spark, dir, 0.001)
    Seq("title", "movie_companies", "movie_info", "movie_info_idx",
      "movie_keyword", "cast_info", "complete_cast", "comp_cast_type",
      "company_name", "company_type", "info_type", "keyword", "kind_type",
      "link_type", "movie_link", "name", "aka_name", "aka_title",
      "person_info", "char_name", "role_type").foreach { t =>
      spark.read.parquet(s"$dir/$t.parquet").createOrReplaceTempView(t)
    }
    dir
  }

  private def run(sql: String): String = {
    val row = spark.sql(sql).collect()(0)
    (0 until row.length).map(i =>
      if (row.isNullAt(i)) "NULL" else String.valueOf(row.get(i)))
      .mkString("|")
  }

  test("all 113 queries: rule-on == rule-off on the synthetic IMDB") {
    imdbDir // force fixture generation
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1",
        RptConf.MIN_PROBE_ROWS -> "0",
        RptConf.MIN_BUILD_PROBE_RATIO -> "0",
        RptConf.FILTERED_BUILDS_ONLY -> "false",
        RptConf.SKIP_BROADCASTABLE_BUILDS -> "false",
        RptConf.FAIL_FAST -> "true") {
      var rewritten = 0
      var nonEmpty = 0
      val bad = scala.collection.mutable.ArrayBuffer[String]()
      JobRealQueries.all.foreach { case (name, sql) =>
        spark.conf.set(RptConf.ENABLED, "false")
        val off = run(sql)
        spark.conf.set(RptConf.ENABLED, "true")
        val df = spark.sql(sql)
        if (df.queryExecution.optimizedPlan.toString
            .contains("might_contain")) rewritten += 1
        val on = run(sql)
        if (on != off) bad += s"$name: on=$on off=$off"
        if (!off.split("\\|").forall(_ == "NULL")) nonEmpty += 1
      }
      assert(bad.isEmpty, s"${bad.size} mismatches:\n${bad.mkString("\n")}")
      info(s"113 queries, $rewritten rewritten, $nonEmpty non-empty")
      // the rule must actually fire on a meaningful share of the workload
      assert(rewritten * 2 >= JobRealQueries.all.size,
        s"only $rewritten/113 plans rewritten")
      // the vocab alignment must keep most of the workload non-vacuous
      assert(nonEmpty * 10 >= JobRealQueries.all.size * 6,
        s"only $nonEmpty/113 queries returned rows")
    }
  }

  test("planted hero block: the tightest conjunctions return rows") {
    imdbDir
    // 29a/29b: Shrek 2 + char Queen + computer-animation + voice actress
    val q29 = JobRealQueries.all.toMap.apply("29a")
    assert(!run(q29).startsWith("NULL"),
      "29a (Shrek 2 conjunction) must hit the planted block")
    // 8b: One Piece / Dragon Ball Z japanese dub
    val q8b = JobRealQueries.all.toMap.apply("8b")
    assert(!run(q8b).split("\\|").forall(_ == "NULL"),
      "8b (anime dub conjunction) must hit the planted block")
    // 32a: 10,000-mile-club through movie_link
    val q32 = JobRealQueries.all.toMap.apply("32a")
    assert(!run(q32).split("\\|").forall(_ == "NULL"),
      "32a (10,000-mile-club link) must hit the planted block")
  }
}
