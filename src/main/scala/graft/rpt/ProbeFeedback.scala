package graft.rpt

/**
 * Cross-query selectivity feedback for injected probe filters — the
 * Spark-idiomatic analog of the reference's `SelectivityOptionalFilter`
 * wrapper (rpt_optimizer.cpp:1482-1491), which lets the host engine stop
 * evaluating an unselective scan filter mid-query. Spark cannot drop a
 * planned filter mid-query, so the feedback loop spans QUERIES instead:
 * [[RptProfiling]]'s listener records each probe's measured keep-rate
 * keyed by a stable (query plan, build unit, pass, probe columns)
 * identity — carried in the build subquery's alias when
 * `spark.graft.rpt.probeFeedback` is on — and the next planning of the
 * same shape skips re-injecting probes that measured ≥ the configured
 * keep threshold (default 0.98: the probe removed ≤2% of rows and is pure
 * overhead).
 *
 * Suppression is perf-only: a stale or colliding entry can only withhold
 * an optimization, never change results. Entries expire after a TTL so a
 * data change (new builds suddenly selective) re-enables probes within
 * minutes, mirroring [[RuntimeCounts]].
 */
private[graft] object ProbeFeedback {
  private val TTL_NANOS = 10L * 60 * 1000 * 1000 * 1000 // 10 minutes
  /** Records below this many probed rows are noise — never suppress from
    * them (an empty or broadcast-pruned run measures nothing useful). */
  val MinRows = 1024L

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, (Double, Long)]()

  /** Stable probe identity: the pass+query+build-tagged subquery alias
    * plus the probe-side key column names. */
  def key(alias: String, probeCols: Seq[String]): String =
    alias + "|" + probeCols.sorted.mkString(",")

  def record(key: String, keep: Double, rowsIn: Long): Unit = {
    if (rowsIn >= MinRows) {
      if (cache.size > MaxEntries) evict()
      cache.put(key, (keep, System.nanoTime()))
    }
  }

  private val MaxEntries = 512

  /** Over-cap eviction: drop expired entries first, then the oldest half
    * if still over cap — a workload with >512 live probe shapes keeps its
    * newest half of the feedback instead of thrashing a clear-all. */
  private def evict(): Unit = synchronized {
    if (cache.size <= MaxEntries) return
    val now = System.nanoTime()
    cache.entrySet().removeIf(e => now - e.getValue._2 >= TTL_NANOS)
    if (cache.size > MaxEntries) {
      import scala.jdk.CollectionConverters._
      val oldestFirst = cache.asScala.toSeq.sortBy(_._2._2)
      oldestFirst.take(cache.size / 2).foreach { case (k, _) => cache.remove(k) }
    }
  }

  def suppress(key: String, keepThreshold: Double): Boolean =
    Option(cache.get(key)).exists { case (keep, at) =>
      System.nanoTime() - at < TTL_NANOS && keep >= keepThreshold
    }

  private[graft] def size: Int = cache.size
  private[graft] def clear(): Unit = cache.clear()
  private[rpt] def snapshot: Map[String, Double] = {
    import scala.jdk.CollectionConverters._
    cache.asScala.map { case (k, (keep, _)) => k -> keep }.toMap
  }
}
