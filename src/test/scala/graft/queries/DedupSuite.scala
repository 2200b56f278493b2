package graft.queries

import graft.SparkTestBase

/** d03's hot-shingle document-frequency cap (DedupQueries.hotShingleDf):
  * scale guard against k^2 pair blowup from boilerplate shingles. */
class DedupSuite extends SparkTestBase {

  private def sparkD03(): org.apache.spark.sql.DataFrame =
    DedupQueries.defs.find(_.name == "d03_ngram_jaccard").get
      .fn(spark, sfDir)

  test("cap is inert on the fixture corpus (no fixture shingle is hot)") {
    val capped = fingerprint(sparkD03())
    val maxDf = spark.sql(
      """SELECT max(cnt) AS m FROM (
        |  SELECT h, count(*) AS cnt FROM (
        |    SELECT DISTINCT doc_id,
        |           graft_hash60(concat_ws(' ', slice(w, i, 3))) AS h
        |    FROM (SELECT doc_id, split(text, ' ') AS w FROM documents
        |          WHERE size(split(text, ' ')) >= 3) d
        |    LATERAL VIEW explode(sequence(1, size(w) - 2)) t AS i)
        |  GROUP BY h)""".stripMargin).collect()(0).getLong(0)
    assert(maxDf <= DedupQueries.hotShingleDf,
      s"fixture has a shingle in $maxDf docs — cap would change results; " +
        "raise hotShingleDf or this invariant no longer holds")
    assert(capped.nonEmpty, "d03 returned nothing on the fixture")
  }

  test("boilerplate corpus: hot shingles generate zero candidate pairs") {
    val fixtureDocs = tables("documents")
    try {
      import spark.implicits._
      // 100 identical docs: every shingle has df=100 > cap -> no pairs
      // (without the cap this corpus generates 100*99/2 candidate pairs
      // per shingle — the k^2 blowup the cap exists to stop)
      (1 to 100).map(i =>
          (i.toLong, "common boilerplate sentence repeated in every doc", "s"))
        .toDF("doc_id", "text", "source")
        .createOrReplaceTempView("documents")
      val out = sparkD03().collect()
      assert(out.isEmpty,
        s"expected no pairs from all-hot shingles, got ${out.length}")
    } finally {
      fixtureDocs.createOrReplaceTempView("documents")
    }
  }

  test("d08 labels are the transitive closure of the d04 pair graph") {
    val pairs = DedupQueries.minhashPairs(spark)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(pairs.nonEmpty, "fixture produced no minhash pairs")
    val labels = DedupQueries.defs.find(_.name == "d08_dup_clusters").get
      .fn(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // every doc incident to a pair is labeled, and only those
    assert(labels.keySet == pairs.flatMap(p => Seq(p._1, p._2)).toSet)
    // both endpoints of every pair share a representative (1-hop closure)
    pairs.foreach { case (a, b) =>
      assert(labels(a) == labels(b), s"pair ($a,$b) split across clusters")
    }
    // the representative is the smallest member of its cluster (so it is
    // a member, and clusters are canonically named)
    labels.groupBy(_._2).foreach { case (rep, members) =>
      assert(members.keys.min == rep,
        s"cluster $rep: min member ${members.keys.min} != rep")
    }
  }

  test("d11 contamination matrix aggregates exactly the d04 pair graph") {
    val pairs = DedupQueries.defs.find(_.name == "d04_minhash_lsh").get
      .fn(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val srcOf = spark.table("documents")
      .selectExpr("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val expected = pairs
      .map { case (a, b) =>
        val (sa, sb) = (srcOf(a), srcOf(b))
        (if (sa <= sb) (sa, sb) else (sb, sa), sa != sb)
      }
      .groupBy(_._1)
      .map { case (k, vs) => k -> (vs.size.toLong, vs.count(_._2).toLong) }

    val got = DedupQueries.defs.find(_.name == "d11_source_contamination").get
      .fn(spark, sfDir)
      .collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == expected, "matrix disagrees with direct pair attribution")
    // source_a <= source_b canonical ordering holds on every row
    got.keys.foreach { case (a, b) => assert(a <= b, s"unordered row ($a,$b)") }
  }
}
