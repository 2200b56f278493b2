package graft.queries

import graft.SparkTestBase

/** t08 vocabulary-divergence invariants (the rest of the t-family is
  * covered by the DuckDB oracle gate; t08 additionally gets a direct
  * recomputation check because its cosine must stay integer-exact up to
  * the single final division). */
class TextSuite extends SparkTestBase {

  test("t08 cosine matches a direct driver-side recomputation") {
    val rows = TextQueries.defs.find(_.name == "t08_vocab_divergence").get
      .fn(spark, sfDir).collect()
    assert(rows.nonEmpty, "no source pairs on the fixture")

    val tf: Map[String, Map[String, Long]] = spark.table("documents")
      .selectExpr("source", "explode(split(text, ' ')) AS tok")
      .collect()
      .groupBy(_.getString(0))
      .map { case (s, rs) =>
        s -> rs.groupBy(_.getString(1)).map { case (t, g) => t -> g.length.toLong }
      }
    rows.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      assert(a < b, s"non-canonical pair ordering ($a,$b)")
      val (va, vb) = (tf(a), tf(b))
      val shared = va.keySet.intersect(vb.keySet)
      assert(r.getLong(2) == shared.size.toLong, s"shared_vocab mismatch on ($a,$b)")
      val dot = shared.toSeq.map(t => va(t) * vb(t)).sum.toDouble
      val cos = dot / (math.sqrt(va.values.map(c => c * c).sum.toDouble) *
        math.sqrt(vb.values.map(c => c * c).sum.toDouble))
      assert(math.abs(r.getDouble(3) - cos) < 1e-12, s"cosine mismatch on ($a,$b)")
      assert(r.getDouble(3) > 0.0 && r.getDouble(3) <= 1.0 + 1e-12)
    }
  }
}
