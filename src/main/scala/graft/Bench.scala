package graft

/** Benchmark main: runs every declared query on SPARK_GRAFT_SF_DIR, prints
  * ONE JSON line with total + per-query wall seconds. Timing is
  * action-to-completion (`count()` forces full execution); per query the
  * MIN of SPARK_GRAFT_BENCH_RUNS runs (default 2) is reported — the
  * reference's protocol (min of --runs N, test_job_queries.sh:169-199),
  * and the right estimator on a noisy shared machine.
  *
  * Fixture views are registered ONCE before any timing, so per-query numbers
  * measure the query, not 10 parquet re-reads per invocation. A query run
  * that throws is reported as -1 (never as a fast "win" of the min) and the
  * failing queries are listed in an `errors` field.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "2").toInt
    // optional comma-separated allowlist for solo-probing a few queries
    // under the exact bench protocol (same warmup, views, min-of-N)
    val only: Set[String] = sys.env.get("SPARK_GRAFT_BENCH_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .getOrElse(Set.empty)
    val spark = GraftSession.build(appName = "graft-bench")
    // warm the JVM/session on the smallest fixture so per-query numbers
    // measure the queries, not first-use initialization
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    // register the benchmark fixture's views outside the timed region
    queries.QueryDef.views(spark, sfDir)
    val errors = scala.collection.mutable.ArrayBuffer[String]()
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.isEmpty || only(name) }
      .map { case (name, fn) =>
      val times = (1 to runs).flatMap { _ =>
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).count()
          Some((System.nanoTime() - t0) / 1e9)
        } catch {
          case e: Throwable =>
            errors += s"$name: ${e.getClass.getSimpleName}"
            None
        }
      }
      name -> (if (times.isEmpty) -1.0 else times.min)
    }
    val total = results.map(_._2).filter(_ >= 0).sum
    val errJson = errors.distinct.map("\"" + _ + "\"").mkString("[", ",", "]")
    def jsonLine(keyed: Seq[(String, Double)]): String = {
      val qs = keyed.map { case (k, v) => "\"" + k + f"""\":$v%.3f""" }
        .mkString("{", ",", "}")
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir","errors":$errJson}"""
    }
    // The harness reading stdout keeps only a bounded tail (~2000 chars):
    // with a full registry (~85 queries) the full-name map (~2.7k chars) gets
    // its head truncated and the line no longer parses. The stdout line
    // therefore uses the short registry id (the unique "q01"/"d04"/"v10"
    // prefix) and the full-name JSON goes to target/bench_full.json.
    // Write the full-name file FIRST so a guard failure below still leaves
    // the measured data on disk instead of discarding the whole run.
    val full = java.nio.file.Paths.get("target", "bench_full.json")
    java.nio.file.Files.createDirectories(full.getParent)
    java.nio.file.Files.write(full,
      jsonLine(results).getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val shortKeyed = results.map { case (k, v) => k.split('_').head -> v }
    require(shortKeyed.map(_._1).distinct.size == shortKeyed.size,
      "short registry ids must stay unique for the bench stdout line")
    val line = jsonLine(shortKeyed)
    require(line.length <= 1800,
      s"bench stdout line ${line.length} chars would overflow the harness tail buffer")
    println(line)
    spark.stop()
  }
}
