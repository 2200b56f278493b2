package graft.queries

import java.nio.file.Files

import graft.SparkTestBase

/**
 * Regression pin for the fixture-layout trap in StreamingQueries.runStream:
 * driver fixtures are single FILES (`sfDir/table.parquet`), but Spark-written
 * fixtures (ScaleFixtures, any production writer) are DIRECTORIES of part
 * files. `pathGlobFilter` matches LEAF file names only, so the file-source
 * glob that works for the file layout silently yields an EMPTY stream on the
 * directory layout — the v0x bench numbers would measure nothing without
 * erroring. runStream must detect the layout and stream the table directory
 * directly.
 */
class StreamingQueriesSuite extends SparkTestBase {

  test("v0x stream reads a Spark-written DIRECTORY fixture, not an empty glob") {
    val dir = Files.createTempDirectory("graft_dirfix_").toFile
    dir.deleteOnExit()
    val sfDir = dir.getAbsolutePath
    // re-write every fixture table in the directory layout a Spark writer
    // produces (multiple part files for the bigger ones)
    graft.GraftSession.loadTables(spark, "/root/testdata/sf0.001")
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings"))
      spark.table(t).repartition(2).write.mode("overwrite")
        .parquet(s"$sfDir/$t.parquet")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val nDocs = docs.count()
    assert(nDocs > 0)

    val v03 = StreamingQueries.defs.find(_.name == "v03_stream_shard_assign").get
    val streamed = v03.fn(spark, sfDir)
    assert(streamed.count() === nDocs,
      "directory-layout stream must see every row (empty = the leaf-only glob regression)")

    // values, not just counts: the stream output must equal the batch analog
    val batch = graft.streaming.StreamingOps.shardAssign(docs)
      .select("doc_id", "shard")
    assert(streamed.select("doc_id", "shard").exceptAll(batch).isEmpty &&
      batch.exceptAll(streamed.select("doc_id", "shard")).isEmpty)

    // and the sink view must not leak into the catalog (driver-memory pin)
    assert(!spark.catalog.listTables().collect()
      .exists(_.name.startsWith("graft_stream_sink_")))

    // the original single-FILE layout keeps working through the same path
    val fromFile = v03.fn(spark, "/root/testdata/sf0.001")
    assert(fromFile.count() ===
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet").count())
  }

  test("v08 sentinel advances the watermark: every closed window emits") {
    // The event-time gates (v08–v11) hinge on one mechanism: a far-future
    // sentinel row advancing the global watermark so append-mode state
    // fully emits in a drain-to-completion run. Pin it end to end against
    // the batch q24 aggregate (same rows, win-for-win), including that
    // the sentinel's own (still-open) window never leaks into the output.
    val v08 = StreamingQueries.defs.find(_.name == "v08_stream_hourly_rollup").get
    val streamed = v08.fn(spark, sfDir)
    val batch = RelationalQueries.defs.find(_.name == "q24_events_hourly").get
      .fn(spark, sfDir)
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
      "streamed hourly rollup must equal the batch window aggregate")
    assert(streamed.where("event_type LIKE '%sentinel%'").isEmpty)
  }
}
