package graft.rpt

import graft.{SparkEntry, SparkTestBase}

/**
 * Transfer-schedule pin at JOB workload depth: q35's 14-table chain×star
 * join is the registry's deepest graph (the reference's native envelope
 * joins up to 17 tables — README.md:81-109). These assertions freeze the
 * graph extraction and the two-pass cascade at that depth so a future
 * traversal or schedule edit that silently drops deep-graph coverage
 * fails here, not in a bench regression.
 */
class JobDepthSuite extends SparkTestBase {

  private lazy val graph: JoinGraph = {
    val plan = withConf(RptConf.ENABLED -> "false") {
      val df = SparkEntry.queries("q35_job_depth")(spark, sfDir)
      df.queryExecution.optimizedPlan // force inside withConf: lazy val
    }
    JoinGraph.extract(plan)
  }

  private def connected: Seq[TableUnit] = {
    val touched = graph.edges.flatMap(e => Seq(e.a, e.b)).toSet
    graph.units.filter(u => touched(u.id))
  }

  test("q35 extracts a 14-unit, 13-edge transfer tree") {
    assert(connected.size == 14, s"units: ${connected.size}")
    assert(graph.edges.size == 13, s"edges: ${graph.edges.size}")
    // chain × star: a tree (no cycles), so MST == the graph itself and
    // the schedule's depth is the tree's depth
    assert(graph.edges.size == connected.size - 1)
  }

  private def bfsDepth(from: Int): (Int, Int) = {
    val adj = graph.edges.flatMap(e => Seq(e.a -> e.b, e.b -> e.a))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var frontier = Set(from)
    var seen = Set(from)
    var depth = 0
    while (frontier.nonEmpty) {
      val next = frontier.flatMap(u => adj.getOrElse(u, Nil)).diff(seen)
      if (next.nonEmpty) depth += 1
      seen ++= next
      frontier = next
    }
    (depth, seen.size)
  }

  test("q35 cascade depth >= 5 from the root, tree diameter >= 8") {
    val root = connected.maxBy(_.card).id
    val (depth, reached) = bfsDepth(root)
    assert(reached == 14, "BFS must reach every unit (tree is connected)")
    // the lineitem root sits mid-tree: its eccentricity (= MST depth, the
    // per-pass cascade length) is 5 — the schema's maximum, since every
    // path threads lineitem→orders→customer/supplier→nation→region
    assert(depth >= 5,
      s"transfer cascade depth $depth — the JOB-depth coverage regressed")
    // diameter = the longest filter-propagation path (one region leaf to
    // the opposite region leaf). Only the forward+backward two-pass
    // cascade covers it — a single pass reaches at most `depth` hops.
    val diameter = connected.map(u => bfsDepth(u.id)._1).max
    assert(diameter >= 8,
      s"tree diameter $diameter — deep cross-leaf propagation regressed")
  }

  test("q36 extracts the width-envelope graph: 17 units, 16 edges, " +
      "fan-out diamonds") {
    val plan = withConf(RptConf.ENABLED -> "false") {
      val df = graft.SparkEntry.queries("q36_job_width")(spark, sfDir)
      df.queryExecution.optimizedPlan
    }
    val g = JoinGraph.extract(plan)
    val touched = g.edges.flatMap(e => Seq(e.a, e.b)).toSet
    assert(touched.size == 17, s"units: ${touched.size}")
    assert(g.edges.size == 16, s"edges: ${g.edges.size}")
    // two fan-out points (customer → {o1, o2}, o1 → {l1, l3}): at least
    // two units carry 3+ edges — the shape that stresses the schedule's
    // member-overlap (diamond) guard
    val degree = g.edges.flatMap(e => Seq(e.a, e.b))
      .groupBy(identity).view.mapValues(_.size)
    assert(degree.count(_._2 >= 3) >= 2,
      s"expected >=2 fan-out units, got degrees ${degree.toMap}")
    // the schedule still probes every unit
    val ops = TransferSchedule.largestRoot(g, "both")
    val probed = ops.map(_.probe).toSet
    assert(touched.forall(probed), s"unprobed: ${touched.filterNot(probed)}")
  }

  test("q35 joinOrder heuristic also covers the full graph at depth") {
    val ops = TransferSchedule.joinOrder(graph, "both", flipRoots = true)
    assert(ops.nonEmpty, "joinOrder produced no schedule at JOB depth")
    val probed = ops.map(_.probe).toSet
    assert(connected.forall(u => probed(u.id)),
      s"joinOrder left units unprobed: " +
        s"${connected.map(_.id).filterNot(probed)}")
    // both passes present (the DAG orientation must not collapse one)
    assert(ops.exists(_.forward) && ops.exists(!_.forward))
  }

  test("q35 full two-pass cascade: every unit probed, 13 ops per pass") {
    val ops = TransferSchedule.largestRoot(graph, "both")
    val (fwd, bwd) = ops.partition(_.forward)
    assert(fwd.size == 13, s"forward ops: ${fwd.size}")
    assert(bwd.size == 13, s"backward ops: ${bwd.size}")
    // Yannakakis-style full reduction: every edge-connected unit is
    // semi-join-reduced at least once across the two passes
    val probed = ops.map(_.probe).toSet
    assert(connected.forall(u => probed(u.id)),
      s"unprobed units: ${connected.map(_.id).filterNot(probed)}")
  }
}
