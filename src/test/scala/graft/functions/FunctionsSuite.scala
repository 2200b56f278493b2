package graft.functions

import graft.SparkTestBase
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** The custom codegen expressions must be bit-identical to the portable
 *  SQL forms they replace (those forms are what the DuckDB oracle runs). */
class FunctionsSuite extends SparkTestBase {

  test("graft_hash60 == conv(substr(md5)) on random strings") {
    val gen = Gen.listOfN(200, Gen.oneOf(
      Gen.alphaNumStr, Gen.asciiPrintableStr, Gen.const(""),
      Gen.listOfN(5, Gen.oneOf("päö", "漢字", "a b c", ":", "💥"))
        .map(_.mkString(" "))))
    val strings = gen(Gen.Parameters.default, Seed(42L)).get.distinct
    import spark.implicits._
    val df = strings.toDF("s")
    df.createOrReplaceTempView("h60_strings")
    val rows = spark.sql(
      """SELECT s, graft_hash60(s) AS fast,
        |       CAST(conv(substr(md5(s), 1, 15), 16, 10) AS BIGINT) AS slow
        |FROM h60_strings""".stripMargin).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(2),
        s"hash60 mismatch for ${r.getString(0)}: ${r.getLong(1)} != ${r.getLong(2)}")
      assert(r.getLong(1) >= 0L)
    }
  }

  test("graft_dot == aggregate(zip_with(...)) incl. null/length-mismatch") {
    val rows = spark.sql(
      """SELECT graft_dot(a, b) AS fast,
        |       aggregate(zip_with(a, b, (x, y) -> x * y),
        |                 CAST(0 AS DOUBLE), (acc, v) -> acc + v) AS slow
        |FROM VALUES
        |  (array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)),
        |  (array(0.1D, -0.2D), array(1e300D, 2e-300D)),
        |  (array(1.0D), array(1.0D, 2.0D)),
        |  (CAST(NULL AS ARRAY<DOUBLE>), array(1.0D)),
        |  (array(CAST(NULL AS DOUBLE), 1.0D), array(1.0D, 1.0D)),
        |  (array(), array())
        |AS t(a, b)""".stripMargin).collect()
    rows.foreach { r =>
      val fast = if (r.isNullAt(0)) None else Some(r.getDouble(0))
      val slow = if (r.isNullAt(1)) None else Some(r.getDouble(1))
      assert(fast == slow, s"graft_dot mismatch: $fast != $slow")
    }
  }
}
