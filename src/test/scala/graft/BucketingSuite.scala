package graft

/** Scale claim made concrete: pre-bucketed tables co-locate their join —
 *  the executed plan has NO shuffle exchange between the scans and the
 *  join (at 100 TB this is the difference between reading and
 *  re-shuffling the fact table). */
class BucketingSuite extends SparkTestBase {

  test("bucketed tables join without a shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.read.parquet(s"$sfDir/orders.parquet")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_orders")
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("b_lineitem")
    try {
      withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
        val df = spark.sql(
          """SELECT count(*) AS n FROM b_orders
            |JOIN b_lineitem ON l_orderkey = o_orderkey""".stripMargin)
        val n = df.collect()(0).getLong(0)
        assert(n > 0)
        val plan = df.queryExecution.executedPlan.toString
        assert(!plan.contains("Exchange hashpartitioning"),
          s"bucketed join still shuffled:\n$plan")
        // and the unbucketed equivalent DOES shuffle (sanity of the check)
        val df2 = spark.sql(
          """SELECT count(*) AS n FROM orders
            |JOIN lineitem ON l_orderkey = o_orderkey""".stripMargin)
        df2.collect()
        assert(df2.queryExecution.executedPlan.toString
          .contains("Exchange hashpartitioning"))
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
