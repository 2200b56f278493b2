package graft.ops

import graft.SparkTestBase

class SkewJoinSuite extends SparkTestBase {

  test("salted join == plain join, with salt in the shuffle key") {
    val orders = spark.table("orders")
    val customer = spark.table("customer")
    val plain = orders.join(customer,
      orders("o_custkey") === customer("c_custkey"))
    val salted = withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      SkewJoin.saltedJoin(orders, customer, "o_custkey", "c_custkey", 4)
    }
    assert(salted.columns.toSeq == plain.columns.toSeq)
    assert(fingerprint(salted) == fingerprint(plain))
    // the shuffle must be keyed on (key, salt)
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val phys = SkewJoin.saltedJoin(orders, customer,
        "o_custkey", "c_custkey", 4).queryExecution.executedPlan.toString
      assert(phys.contains("__graft_salt"), phys.take(500))
    }
  }

  test("salted join with a genuinely skewed key distribution") {
    import spark.implicits._
    // 10k rows, 95% on one key
    val skewed = spark.range(10000)
      .selectExpr("CASE WHEN id % 20 = 0 THEN id ELSE 7 END AS k", "id AS v")
    val dim = spark.range(500).selectExpr("id AS dk", "id * 2 AS dv")
    val plain = skewed.join(dim, $"k" === $"dk").selectExpr("sum(v + dv) AS s")
    val salted = SkewJoin.saltedJoin(skewed.toDF(), dim.toDF(), "k", "dk", 8)
      .selectExpr("sum(v + dv) AS s")
    assert(fingerprint(salted) == fingerprint(plain))
  }
}
