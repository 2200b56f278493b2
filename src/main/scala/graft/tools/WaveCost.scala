package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

import graft.GraftSession

/**
 * Direct measurement of Spark's per-transfer-wave FIXED cost — the
 * constant the planning-time work floor is calibrated from (see
 * [[graft.rpt.RptConf.WAVE_COST_BYTES]]).
 *
 * Protocol: a star of K single-row filtered dimension tables around one
 * probe table just big enough to clear `minProbeRows`. Every build scans
 * one row (build work ~0), every probe keeps everything (probe work ~=
 * the bare hash, and the adaptive drop latches it off), so
 * `wall(rule on) - wall(rule off)` is K waves of pure fixed cost: one
 * build subquery stage launch + result broadcast each — the cost the
 * reference does not pay (its CREATE_BF re-emits materialized chunks
 * in-process, physical_create_bf.cpp:441-557). Reported per wave,
 * min-of-N over fresh executions, shuffle regime (no broadcast gates).
 *
 * Usage: runMain graft.tools.WaveCost [dims=8] [probeRows=1000000] [runs=7]
 */
object WaveCost {

  def main(args: Array[String]): Unit = {
    val dims = args.headOption.map(_.toInt).getOrElse(8)
    val probeRows = args.drop(1).headOption.map(_.toLong).getOrElse(1000000L)
    val runs = args.drop(2).headOption.map(_.toInt).getOrElse(7)

    val spark = GraftSession.build(appName = "graft-wave-cost")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_wavecost_").toFile
    dir.deleteOnExit()

    // probe: one fact keyed 1..dims; every key column hits every dim row
    val probeCols = (1 to dims).map(i => s"CAST(id % 97 AS BIGINT) AS k$i")
    spark.range(probeRows).selectExpr(("id" +: probeCols): _*)
      .write.parquet(s"$dir/probe")
    // dims: 97 rows each, filtered to ALL 97 by a tautological-but-
    // selective-looking range (keeps every probe row -> probe work ~0,
    // but the filter qualifies the unit as a transfer build)
    (1 to dims).foreach { i =>
      spark.range(97).selectExpr("id AS dk", "CAST(id AS INT) AS dv")
        .write.parquet(s"$dir/d$i")
    }
    spark.read.parquet(s"$dir/probe").createOrReplaceTempView("probe")
    (1 to dims).foreach { i =>
      spark.read.parquet(s"$dir/d$i").createOrReplaceTempView(s"d$i")
    }

    val joins = (1 to dims).map(i => s"JOIN d$i ON probe.k$i = d$i.dk")
      .mkString(" ")
    // keeps every row, but as an OR the footer keep gate cannot price it
    // (one-sided by design), so the build is not stood down statically —
    // exactly the unestimable-filter shape whose waves we are pricing
    val filters = (1 to dims).map(i => s"(d$i.dv >= 0 OR d$i.dv IS NULL)")
      .mkString(" AND ")
    val sql = s"SELECT min(probe.id) FROM probe $joins WHERE $filters"

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.graft.rpt.minProbeRows", "1")
    // the floor would stand this byte-tiny star down — hold it open: this
    // tool MEASURES the constant the floor is calibrated from
    spark.conf.set("spark.graft.rpt.waveCostBytes", "0")
    // the floor charges one flat waveCostBytes per (build, keys, pass)
    // ADMISSION GROUP; pin filterType=bfOnly so each group plans exactly
    // one build subquery and the calibration denominator below (non-reused
    // build subqueries) equals the charge denominator — under
    // filterType=all a group launches bf + per-pair min/max subqueries
    // and the constant would be diluted
    spark.conf.set("spark.graft.rpt.filterType", "bfOnly")

    def time(): Double = {
      val t0 = System.nanoTime()
      spark.sql(sql).collect()
      (System.nanoTime() - t0) / 1e9
    }

    def minOf(n: Int): Double = (1 to n).map(_ => time()).min

    // scalastyle:off println
    spark.conf.set("spark.graft.rpt.enabled", "false")
    time(); val off = minOf(runs)
    spark.conf.set("spark.graft.rpt.enabled", "true")
    val planned = {
      val df = spark.sql(sql)
      df.collect()
      graft.rpt.RptProfiling.buildStats(df.queryExecution)
        .count(!_.reused)
    }
    val on = minOf(runs)
    // clamp at 0: (on - off) can dip negative under box noise, and a
    // negative "fixed cost per wave" is a misleading calibration constant
    val perWave = math.max(0.0, on - off) / math.max(1, planned)
    println(f"WAVECOST_JSON {" +
      f""""dims":$dims,"probeRows":$probeRows,"runs":$runs,""" +
      f""""waves":$planned,"off":$off%.3f,"on":$on%.3f,""" +
      f""""perWaveSec":$perWave%.4f}""")
    // scalastyle:on println
    spark.stop()
  }
}
