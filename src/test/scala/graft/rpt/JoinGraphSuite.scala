package graft.rpt

import graft.SparkTestBase

/** Unit tests for join-graph extraction over real optimized plans —
 *  unit classification, edge orientation, and outer/semi/existence
 *  filterability (rpt_optimizer.cpp:45-139 analog). */
class JoinGraphSuite extends SparkTestBase {

  private def graphOf(sql: String): JoinGraph =
    JoinGraph.extract(spark.sql(sql).queryExecution.optimizedPlan)

  test("5-table chain: 5 units, 4 edges, all bidirectional") {
    val g = graphOf(
      """SELECT n_name, count(*) FROM region
        |JOIN nation ON n_regionkey = r_regionkey
        |JOIN customer ON c_nationkey = n_nationkey
        |JOIN orders ON o_custkey = c_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE r_name = 'ASIA' GROUP BY n_name""".stripMargin)
    assert(g.units.size == 5, g.units.map(_.plan.nodeName))
    assert(g.edges.size == 4)
    assert(g.edges.forall(e => e.canFilterA && e.canFilterB))
    // the filtered region scan is one unit WITH its filter (BFs build
    // from filtered rows, reference lifts CREATE_BF for the same effect)
    assert(g.units.exists(_.plan.nodeName == "Filter"))
  }

  test("left outer join: preserved side is not filterable") {
    val g = graphOf(
      """SELECT c_name, o_orderkey FROM customer
        |LEFT JOIN orders ON o_custkey = c_custkey""".stripMargin)
    assert(g.edges.size == 1)
    val e = g.edges.head
    // exactly one side filterable (the non-preserved orders side)
    assert(e.canFilterA != e.canFilterB)
    val filterableUnit = if (e.canFilterA) e.a else e.b
    val cols = g.units(filterableUnit).plan.output.map(_.name)
    assert(cols.contains("o_custkey"), s"wrong side filterable: $cols")
  }

  test("global aggregate is a barrier unit") {
    val g = graphOf(
      """SELECT o_orderkey FROM orders
        |JOIN (SELECT max(l_orderkey) AS mk FROM lineitem) m
        |  ON o_orderkey = m.mk""".stripMargin)
    // the scalar-aggregate side must be a unit (barrier), not traversed
    // into lineitem
    assert(g.units.exists(_.plan.nodeName == "Aggregate"),
      g.units.map(_.plan.nodeName))
  }

  test("grouped aggregate is transparent for its grouping keys") {
    val g = graphOf(
      """SELECT c_name, t.n FROM customer
        |JOIN (SELECT o_custkey, count(*) AS n FROM orders
        |      GROUP BY o_custkey) t ON t.o_custkey = c_custkey""".stripMargin)
    // edge must connect customer to the ORDERS unit through the aggregate
    // (units identified by their output columns — Relation doesn't print
    // the table name)
    assert(g.edges.size == 1)
    val plans = Seq(g.edges.head.a, g.edges.head.b).map(i =>
      g.units(i).plan.output.map(_.name).mkString(","))
    assert(plans.exists(_.contains("o_custkey")), plans)
    assert(plans.exists(_.contains("c_custkey")), plans)
  }

  test("union is a barrier but nested joins still contribute edges") {
    val g = graphOf(
      """SELECT * FROM (
        |  SELECT o_orderkey AS k FROM orders JOIN customer ON o_custkey = c_custkey
        |  UNION ALL
        |  SELECT l_orderkey AS k FROM lineitem) u
        |JOIN nation ON u.k = n_nationkey""".stripMargin)
    // inner join inside the union branch produces its own edge; the
    // union itself is a unit for the outer join edge
    assert(g.units.exists(_.plan.nodeName == "Union"),
      g.units.map(_.plan.nodeName))
    assert(g.edges.size >= 2)
  }

  test("computed join keys (alias of an expression) form edges") {
    // keys defined as projected expressions — CAST(hash(...)) aliases and
    // inline computed conjunct sides must resolve to their owning unit
    // (beyond the reference's col=col matching, rpt_optimizer.cpp:58-62)
    spark.sql("""SELECT id, CAST(hash(id, 1) % 10 AS INT) AS fk
                 FROM range(100)""").createOrReplaceTempView("jg_fact")
    spark.sql("""SELECT CAST(hash(id, 2) % 10 AS INT) AS dk, id AS dv
                 FROM range(20)""").createOrReplaceTempView("jg_dim")
    val g = graphOf(
      """SELECT count(*) AS n
        |FROM jg_fact f
        |JOIN jg_dim d ON f.fk = d.dk
        |JOIN jg_dim d2 ON CAST(d.dv % 7 AS INT) = d2.dk
        |WHERE f.id > 1""".stripMargin)
    assert(g.edges.size == 2,
      s"expected both computed-key edges, got ${g.edges.size}")
    // rebased keys must reference only base (unit-owned) attributes
    g.edges.foreach { e =>
      (e.keyPairs.map(_._1) ++ e.keyPairs.map(_._2)).foreach { k =>
        assert(k.references.nonEmpty && k.deterministic, k.sql)
      }
    }
  }

  test("aggregate-result aliases never become join-key definitions") {
    // sum(x) AS s joined downstream must NOT be treated as computable
    // over the unit (an aggregate is not a per-row expression)
    val g = graphOf(
      """SELECT n, o_orderstatus
        |FROM (SELECT o_custkey AS ck, count(*) AS n FROM orders
        |      GROUP BY o_custkey) a
        |JOIN orders ON a.n = o_custkey
        |JOIN customer ON o_custkey = c_custkey""".stripMargin)
    // the orders<->customer edge must exist; any edge claiming the
    // aggregate output would carry an AggregateExpression key
    assert(g.edges.nonEmpty)
    g.edges.foreach { e =>
      (e.keyPairs.map(_._1) ++ e.keyPairs.map(_._2)).foreach { k =>
        assert(!k.exists(_.isInstanceOf[
          org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression]),
          s"aggregate leaked into join key: ${k.sql}")
      }
    }
  }

  test("non-equi join contributes no edge") {
    val g = graphOf(
      """SELECT count(*) FROM orders
        |JOIN lineitem ON l_orderkey < o_orderkey""".stripMargin)
    assert(g.edges.isEmpty)
  }

  test("cardinality estimates order units sensibly") {
    val g = graphOf(
      """SELECT count(*) FROM nation
        |JOIN customer ON c_nationkey = n_nationkey
        |JOIN orders ON o_custkey = c_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey""".stripMargin)
    val cards = g.units.map(u =>
      u.plan.output.map(_.name).mkString(",") -> u.card)
    val nationCard = cards.find(_._1.contains("n_nationkey")).get._2
    val lineitemCard = cards.find(_._1.contains("l_orderkey")).get._2
    assert(lineitemCard > nationCard,
      s"lineitem should dwarf nation: $cards")
  }
}
