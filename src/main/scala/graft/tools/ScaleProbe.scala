package graft.tools

import scala.collection.mutable

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.queries.{DedupQueries, QueryDef}

/**
 * Dedup-spine scale probe: runs the expensive half of the dedup pipeline
 * (d04 MinHash band join → d08 connected components → d10 survivor
 * election → p04 leakage split) on a fixture dir and prints ONE JSON line
 * with per-stage wall seconds, the band join's skew profile (bucket-size
 * max/p99 — the quantity that decides whether the banded equi-join
 * survives real duplicate density), and per-CC-round timings + edge
 * counts (the O(log n) convergence evidence).
 *
 * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.tools.ScaleProbe
 * (pair with ScaleFixtures ×100 of sf0.1 for the sf10 probe — verbatim
 * copies make an exact-dup-heavy corpus, the hard regime for banding.)
 */
object ScaleProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.build(appName = "graft-scale-probe")
    QueryDef.views(spark, sfDir)
    def timed[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val nDocs = spark.table("documents").count()

    // band-key skew profile of the d04 LSH join input
    val buckets = spark.sql(
      s"""WITH ${DedupQueries.sparkMinhashCtes}
         |SELECT count(*) AS c FROM bands GROUP BY band, sig""".stripMargin)
      .select(col("c")).cache()
    val (bstats, bucketSec) = timed {
      buckets.agg(
        count(lit(1)), max(col("c")),
        expr("approx_percentile(c, 0.99)"), sum(col("c"))).head()
    }
    buckets.unpersist()

    // d04: distinct near-dup candidate pairs through the banded join
    val (nPairs, pairSec) = timed(DedupQueries.minhashPairs(spark).count())

    // d08: connected components with per-round instrumentation
    val rounds = mutable.ArrayBuffer[(Int, Double, Long)]()
    val (labels, ccSec) = timed {
      val l = graft.ops.ConnectedComponents.labels(
        DedupQueries.minhashPairs(spark), "doc_a", "doc_b",
        roundObserver = (r, sec, edges) => rounds += ((r, sec, edges)))
      l.cache().count()
      l
    }
    val nLabels = labels.count()
    labels.unpersist()

    // d10 + p04 through the registry (shared ClusterLabels closure: the
    // first call pays CC once more, the second reads the cache)
    def run(name: String): (Long, Double) =
      timed(graft.SparkEntry.queries(name)(spark, sfDir).count())
    val (d10Rows, d10Sec) = run("d10_cluster_survivors")
    val (p04Rows, p04Sec) = run("p04_leakage_split")

    val roundJson = rounds.map { case (r, sec, edges) =>
      f"""{"round":$r,"sec":$sec%.2f,"edges":$edges}"""
    }.mkString("[", ",", "]")
    println(
      f"""SCALEPROBE_JSON {"sf":"$sfDir","docs":$nDocs,""" +
      f""""band_buckets":${bstats.getLong(0)},"bucket_max":${bstats.getLong(1)},""" +
      f""""bucket_p99":${bstats.get(2).asInstanceOf[Number].doubleValue()}%.0f,"band_rows":${bstats.getLong(3)},""" +
      f""""bucket_stats_sec":$bucketSec%.2f,""" +
      f""""pairs":$nPairs,"pair_gen_sec":$pairSec%.2f,""" +
      f""""cc_rounds":$roundJson,"cc_total_sec":$ccSec%.2f,"labels":$nLabels,""" +
      f""""d10_rows":$d10Rows,"d10_sec":$d10Sec%.2f,""" +
      f""""p04_rows":$p04Rows,"p04_sec":$p04Sec%.2f}""")
    spark.stop()
  }
}
