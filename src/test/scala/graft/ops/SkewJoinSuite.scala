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

  test("identical duplicate rows of one hot key spread across salts") {
    import spark.implicits._
    // the pathological LLM-dedup shape: one key, 10k IDENTICAL rows (a
    // content-derived salt would map all of them to ONE salt)
    val hot = spark.range(10000).selectExpr("7L AS k", "1L AS v")
    val dim = Seq((7L, 99L)).toDF("dk", "dv")
    val salted = SkewJoin.saltedJoin(hot.toDF(), dim, "k", "dk", 8)
    // correctness: row multiplicity preserved vs the plain join
    assert(salted.count() == 10000)
    assert(fingerprint(salted) ==
      fingerprint(hot.join(dim, $"k" === $"dk")))
    // distribution: the salting expression must hit >1 salt on identical
    // rows (the salt column is internal, so assert on its definition)
    val saltsHit = hot
      .withColumn("s", org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.monotonically_increasing_id(),
        org.apache.spark.sql.functions.lit(8L)))
      .select("s").distinct().count()
    assert(saltsHit > 1, s"expected identical rows on >1 salt, got $saltsHit")
  }

  test("salt column name does not collide with user columns") {
    import spark.implicits._
    // inputs already carrying a __graft_salt-prefixed column must survive
    val l = Seq((1L, 5L)).toDF("k", "__graft_salt_1")
    val r = Seq((1L, 6L)).toDF("dk", "__graft_salt_2")
    val out = SkewJoin.saltedJoin(l, r, "k", "dk", 4)
    assert(out.columns.toSet ==
      Set("k", "__graft_salt_1", "dk", "__graft_salt_2"))
    assert(out.count() == 1)
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
