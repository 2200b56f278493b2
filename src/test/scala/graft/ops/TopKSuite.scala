package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class TopKSuite extends SparkTestBase {

  test("bounded top-k aggregate == window row_number form") {
    val agg = spark.table("events")
      .groupBy("event_type")
      .agg(TopK.topK(3)(col("value"), col("event_id")).as("top"))
      .selectExpr("event_type", "explode(top) AS t")
      .selectExpr("event_type", "t._1 AS value", "t._2 AS event_id")
    val window = spark.sql(
      """SELECT event_type, value, event_id FROM (
        |  SELECT event_type, value, event_id,
        |         row_number() OVER (PARTITION BY event_type
        |                            ORDER BY value DESC, event_id) AS rn
        |  FROM events) WHERE rn <= 3""".stripMargin)
    assert(fingerprint(agg) == fingerprint(window))
  }

  test("null value/id rows are ignored, not a decode failure") {
    import spark.implicits._
    val df = Seq[(Option[Double], Option[Long])](
      (Some(3.0), Some(1L)), (None, Some(2L)), (Some(9.0), None),
      (Some(1.0), Some(4L)))
      .toDF("v", "id")
    val out = df.agg(TopK.topK(5)(col("v"), col("id")).as("top"))
      .selectExpr("explode(top) AS t").selectExpr("t._1", "t._2")
      .as[(Double, Long)].collect().toSeq
    assert(out == Seq((3.0, 1L), (1.0, 4L)))
  }

  test("top-k with k larger than group size returns the whole group") {
    import spark.implicits._
    val df = Seq((1.0, 1L), (2.0, 2L)).toDF("v", "id")
    val out = df.agg(TopK.topK(10)(col("v"), col("id")).as("top"))
      .selectExpr("size(top) AS n").collect()(0).getInt(0)
    assert(out == 2)
  }
}
