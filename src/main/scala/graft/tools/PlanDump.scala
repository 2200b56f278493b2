package graft.tools

import java.nio.file.{Files, Paths}

import graft.{GraftSession, SparkEntry}

/**
 * Dumps `.explain("formatted")` for every declared query (or an allowlist)
 * to one file per query — the before/after plan evidence for optimization
 * rounds. Planning only: nothing executes, so this is safe to run on any
 * fixture scale.
 *
 * Usage: SPARK_GRAFT_SF_DIR=<dir> [SPARK_GRAFT_BENCH_QUERIES=a,b]
 *          runMain graft.tools.PlanDump <outDir> [suffix]
 */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "args: <outDir> [suffix]")
    val outDir = Paths.get(args(0))
    val suffix = if (args.length > 1) "_" + args(1) else ""
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val only: Set[String] = sys.env.get("SPARK_GRAFT_BENCH_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .getOrElse(Set.empty)
    Files.createDirectories(outDir)
    val spark = GraftSession.build(appName = "graft-plan-dump")
    graft.queries.QueryDef.views(spark, sfDir)
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only(n) }
      .foreach { case (name, fn) =>
        val text =
          try fn(spark, sfDir).queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          catch { case e: Throwable => s"PLAN FAILED: ${e.getMessage}" }
        Files.write(outDir.resolve(s"$name$suffix.txt"),
          text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        // scalastyle:off println
        println(s"PLANDUMP $name -> ${outDir.resolve(s"$name$suffix.txt")}")
        // scalastyle:on println
      }
    spark.stop()
  }
}
