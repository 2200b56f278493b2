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

  test("graft_shingles60 == HOF composition on fixture docs + edge cases") {
    import spark.implicits._
    // real corpus text plus the edge shapes the SQL form defines behavior
    // for: <3 tokens (empty result), consecutive spaces (empty tokens),
    // repeated shingles (distinct on the FULL hash, first occurrence),
    // unicode
    val docs = tables("documents").select("text").limit(300).as[String]
      .collect().toSeq ++ Seq(
      "", "one", "two words", "a b c", "a b c d",
      "x  y   z  w", "dup dup dup dup dup", "漢字 テスト 文字 列")
    val df = docs.toDF("text")
      .selectExpr("split(text, ' ') AS w").where("size(w) >= 0")
    df.createOrReplaceTempView("sh60_docs")
    Seq(true, false).foreach { mod =>
      val modded =
        if (mod) "h -> h % 1073741789" else "h -> h"
      val rows = spark.sql(
        s"""SELECT graft_shingles60(w, $mod) AS fast,
           |       CASE WHEN size(w) < 3 THEN CAST(array() AS ARRAY<BIGINT>)
           |            ELSE transform(array_distinct(
           |              transform(sequence(1, size(w) - 2),
           |                i -> graft_hash60(concat_ws(' ', slice(w, i, 3))))),
           |              $modded) END AS slow
           |FROM sh60_docs""".stripMargin).collect()
      rows.foreach { r =>
        assert(r.getSeq[Long](0) == r.getSeq[Long](1),
          s"shingles60(mod=$mod) mismatch: ${r.getSeq[Long](0)} vs ${r.getSeq[Long](1)}")
      }
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
