package graft

import java.nio.file.Files

/** Source/sink coverage: the host-engine formats the reference's DuckDB
 *  runs on (parquet/csv/json) round-trip through stock Spark readers with
 *  identical content — the RPT rule applies regardless of source format. */
class SourcesSuite extends SparkTestBase {

  test("csv and json round-trip the parquet fixtures identically") {
    val dir = Files.createTempDirectory("graft_sources").toString
    val parquet = spark.read.parquet(s"$sfDir/nation.parquet")
    parquet.write.option("header", "true").csv(s"$dir/nation_csv")
    parquet.write.json(s"$dir/nation_json")

    val csv = spark.read.option("header", "true")
      .schema(parquet.schema).csv(s"$dir/nation_csv")
    val json = spark.read.schema(parquet.schema).json(s"$dir/nation_json")

    assert(fingerprint(csv) == fingerprint(parquet))
    assert(fingerprint(json) == fingerprint(parquet))
  }

  test("orc round-trips identically") {
    val dir = Files.createTempDirectory("graft_orc").toString
    val parquet = spark.read.parquet(s"$sfDir/nation.parquet")
    parquet.write.orc(s"$dir/nation_orc")
    val orc = spark.read.orc(s"$dir/nation_orc")
    assert(fingerprint(orc) == fingerprint(parquet))
  }

  test("jdbc source round-trips through embedded Derby with pushdown") {
    val dir = Files.createTempDirectory("graft_jdbc").toString
    val url = s"jdbc:derby:$dir/graftdb;create=true"
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    val nation = spark.read.parquet(s"$sfDir/nation.parquet")
    nation.write.mode("overwrite").jdbc(url, "nation_jdbc", props)
    val back = spark.read.jdbc(url, "nation_jdbc", props)
    assert(fingerprint(back) == fingerprint(nation))
    // filters must push into the JDBC source, not evaluate in Spark
    val filtered = spark.read.jdbc(url, "nation_jdbc", props)
      .where("n_nationkey < 5")
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.replaceAll("\\s", "").contains("LessThan(N_NATIONKEY,5)") ||
      plan.contains("n_nationkey"), s"jdbc pushdown missing:\n$plan")
    assert(filtered.count() == 5)
  }

  test("partitioned sink enables partition pruning on read") {
    val dir = Files.createTempDirectory("graft_part").toString
    spark.read.parquet(s"$sfDir/documents.parquet")
      .write.partitionBy("source").parquet(s"$dir/docs")
    val df = spark.read.parquet(s"$dir/docs")
      .where("source = 'web' AND doc_id >= 0")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the source predicate must prune partitions, not filter rows
    assert(plan.contains("PartitionFilters: [isnotnull(source"),
      s"partition filter missing:\n${plan.take(800)}")
    val expected = spark.read.parquet(s"$sfDir/documents.parquet")
      .where("source = 'web'").count()
    assert(df.count() == expected)
  }

  test("rule rewrites joins over non-parquet sources too") {
    val dir = Files.createTempDirectory("graft_sources2").toString
    val nation = spark.read.parquet(s"$sfDir/nation.parquet")
    val customer = spark.read.parquet(s"$sfDir/customer.parquet")
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    nation.write.json(s"$dir/nation")
    customer.write.json(s"$dir/customer")
    orders.write.json(s"$dir/orders")
    spark.read.schema(nation.schema).json(s"$dir/nation")
      .createOrReplaceTempView("j_nation")
    spark.read.schema(customer.schema).json(s"$dir/customer")
      .createOrReplaceTempView("j_customer")
    spark.read.schema(orders.schema).json(s"$dir/orders")
      .createOrReplaceTempView("j_orders")
    val sql =
      """SELECT n_name, count(*) AS n FROM j_nation
        |JOIN j_customer ON c_nationkey = n_nationkey
        |JOIN j_orders ON o_custkey = c_custkey
        |WHERE n_name LIKE 'NATION_1%' GROUP BY n_name""".stripMargin
    // shuffle regime + gates open: the fixture is tiny, and the point here
    // is that the MECHANISM works over non-parquet sources
    withConf(graft.rpt.RptConf.ENABLED -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      graft.rpt.RptConf.MIN_PROBE_ROWS -> "0") {
      val plan = spark.sql(sql).queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain"), "no transfer over json sources")
      val on = fingerprint(spark.sql(sql))
      val off = withConf(graft.rpt.RptConf.ENABLED -> "false")(
        fingerprint(spark.sql(sql)))
      assert(on == off && on.nonEmpty)
    }
  }
}
