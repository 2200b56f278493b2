package graft.rpt

import scala.collection.mutable

import org.apache.spark.sql.catalyst.expressions.Expression

/**
 * One unit of plan modification: unit `build` materializes a bloom filter
 * over `buildKeys`; unit `probe` is filtered by membership of `probeKeys`.
 * Ops are ORDERED — applying them sequentially, with each build reading the
 * probe-filtered-so-far plan of its unit, is what makes the transfer
 * transitive (the reference's stacked CREATE_BF/USE_BF pipeline deps,
 * src/optimizer/graph_manager.hpp:46-57).
 */
case class ScheduledOp(
    build: Int,
    buildKeys: Seq[Expression],
    probe: Int,
    probeKeys: Seq[Expression],
    forward: Boolean)

/**
 * Builds the transfer schedule from a [[JoinGraph]].
 *
 * `largestRoot` heuristic (reference default): Prim's MAXIMUM spanning tree
 * per connected component — edge weight = #equi-conditions, ties broken by
 * the larger `min(card(a), card(b))` — rooted at the largest-cardinality
 * table, then a forward (leaves→root) and backward (root→leaves) pass over
 * the rooted tree; within a BFS level nodes are processed smallest
 * cardinality first. An approximation of Yannakakis' full reducer.
 * (reference: LargestRoot rpt_optimizer.cpp:215-276, BuildRootedTree
 * :278-376, GenerateStageModifications :826-995.)
 *
 * `joinOrder` heuristic: derive the transfer DAG from the host optimizer's
 * chosen join order instead of re-deriving an MST. In the reference this
 * walks DuckDB's physical join tree build-first so that DFS index =
 * execution order and the later-executed side of every join becomes the
 * parent (rpt_optimizer.cpp:516-672). The Spark analog: every `JoinEdge`
 * was extracted at a `Join` node whose LEFT subtree is the streaming/probe
 * spine that keeps executing upward, so the left endpoint is "executed
 * later" = parent, and the right endpoint (the build side that terminates
 * at that join) = child. Multi-parent nodes are kept (a DAG, not a tree —
 * rpt_optimizer.hpp:35-46). `flipRoots` then demotes every non-largest
 * root to a leaf by edge reversal to fixpoint (FlipRootsToLeaves,
 * rpt_optimizer.cpp:715-810, default on via rpt_flip_roots).
 *
 * The reference's backward-pass broadcast optimization — one bloom filter
 * per column-equivalence class, built at the highest ancestor and probed by
 * every descendant (rpt_optimizer.cpp:1070-1158) — is structural here: all
 * class members probe with a subquery over the SAME build plan and keys,
 * and Catalyst's ReuseSubquery/MergeScalarSubqueries collapse those into
 * one executed build.
 */
object TransferSchedule {

  def largestRoot(g: JoinGraph, passMode: String): Seq[ScheduledOp] = {
    if (g.units.size < 2 || g.edges.isEmpty) return Nil
    val n = g.units.size

    // adjacency: unit -> edge indices
    val adj = Array.fill(n)(mutable.ArrayBuffer[Int]())
    g.edges.zipWithIndex.foreach { case (e, i) =>
      adj(e.a) += i
      adj(e.b) += i
    }

    val inTree = Array.fill(n)(false)
    val visitedComponent = Array.fill(n)(false)
    val ops = mutable.ArrayBuffer[ScheduledOp]()

    // process components largest-root-first until all edge-connected units
    // are covered
    val order = g.units.sortBy(-_.card).map(_.id)
    for (start <- order if !visitedComponent(start) && adj(start).nonEmpty) {
      val (parentOf, depth, members) = primTree(g, adj, start, inTree)
      members.foreach(visitedComponent(_) = true)
      ops ++= schedulePasses(g, parentOf, depth, members, passMode)
    }
    ops.toSeq
  }

  /** Transfer DAG from the optimizer's join order (see class doc). Every
   *  edge is oriented child(right/build endpoint) → parent(left/stream
   *  endpoint); `flipRoots` then reverses edges at non-largest roots until
   *  only the largest-cardinality root of each component remains
   *  (reference: rpt_optimizer.cpp:516-810). */
  def joinOrder(
      g: JoinGraph, passMode: String, flipRoots: Boolean): Seq[ScheduledOp] = {
    if (g.units.size < 2 || g.edges.isEmpty) return Nil
    val n = g.units.size

    // directed edge: (child, parent, underlying edge). JoinGraph orients
    // keyPairs._1 = left subtree, so parent = e.a, child = e.b initially.
    var dedges = g.edges.map(e => (e.b, e.a, e)).toArray

    if (flipRoots) {
      // fixpoint: demote any root that is not the largest unit of its
      // weakly-connected component to a leaf by reversing its edges
      val comp = components(n, g.edges)
      val largestOfComp = g.units.groupBy(u => comp(u.id))
        .map { case (c, us) => c -> us.maxBy(_.card).id }
      var changed = true
      var guard = 0
      while (changed && guard < n) {
        changed = false
        guard += 1
        // roots: appear as parent, never as child
        val childSet = dedges.map(_._1).toSet
        val roots = dedges.map(_._2).distinct.filterNot(childSet.contains)
        roots.foreach { r =>
          if (r != largestOfComp(comp(r))) {
            dedges = dedges.map { case (c, p, e) =>
              if (p == r) (p, c, e) else (c, p, e)
            }
            changed = true
          }
        }
      }
    }

    // level = longest path from a root (parents before children). A cycle
    // (possible after adversarial flipping) aborts to the MST heuristic.
    val level = Array.fill(n)(-1)
    val indeg = Array.fill(n)(0) // #edges in which the unit is the child
    val touched = Array.fill(n)(false)
    dedges.foreach { case (c, p, _) =>
      indeg(c) += 1; touched(c) = true; touched(p) = true
    }
    val queue = mutable.Queue[Int]()
    (0 until n).foreach { u =>
      if (touched(u) && indeg(u) == 0) { level(u) = 0; queue += u }
    }
    var processed = 0
    while (queue.nonEmpty) {
      val p = queue.dequeue()
      processed += 1
      dedges.foreach { case (c, p2, _) =>
        if (p2 == p) {
          level(c) = math.max(level(c), level(p) + 1)
          indeg(c) -= 1
          if (indeg(c) == 0) queue += c
        }
      }
    }
    if (processed < touched.count(identity)) {
      // orientation produced a cycle — fall back to the MST heuristic
      return largestRoot(g, passMode)
    }

    val ops = mutable.ArrayBuffer[ScheduledOp]()
    // forward: deepest children first (their own probes have landed), so
    // each build reads an already-reduced plan; within a level smallest
    // cardinality first (reference level sort, rpt_optimizer.cpp:876-880)
    dedges.sortBy { case (c, _, _) => (-level(c), g.units(c).card) }
      .foreach { case (c, p, e) =>
        if (e.canFilter(p) && g.units(c).buildable) {
          ops += ScheduledOp(c, e.keysOf(c), p, e.keysOf(p), forward = true)
        }
      }
    // backward: roots first
    if (passMode != "forwardOnly") {
      dedges.sortBy { case (c, _, _) => (level(c), g.units(c).card) }
        .foreach { case (c, p, e) =>
          if (e.canFilter(c) && g.units(p).buildable) {
            ops += ScheduledOp(p, e.keysOf(p), c, e.keysOf(c), forward = false)
          }
        }
    }
    ops.toSeq
  }

  /** Weakly-connected component id per unit. */
  private def components(n: Int, edges: Seq[JoinEdge]): Array[Int] = {
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val nx = parent(c); parent(c) = r; c = nx }
      r
    }
    edges.foreach(e => parent(find(e.a)) = find(e.b))
    Array.tabulate(n)(find)
  }

  /** Prim's max-ST from `root`; returns (parent edge per unit, BFS depth,
   *  members). Tie-break: larger min-cardinality of the endpoints
   *  (reference: rpt_optimizer.cpp:215-276). */
  private def primTree(
      g: JoinGraph,
      adj: Array[mutable.ArrayBuffer[Int]],
      root: Int,
      inTree: Array[Boolean]): (Map[Int, JoinEdge], Map[Int, Int], Seq[Int]) = {
    val parentOf = mutable.HashMap[Int, JoinEdge]() // child -> edge to parent
    val parent = mutable.HashMap[Int, Int]()
    val members = mutable.ArrayBuffer[Int](root)
    inTree(root) = true

    def better(e1: JoinEdge, e2: JoinEdge): Boolean = {
      if (e1.weight != e2.weight) e1.weight > e2.weight
      else {
        val m1 = math.min(g.units(e1.a).card, g.units(e1.b).card)
        val m2 = math.min(g.units(e2.a).card, g.units(e2.b).card)
        m1 > m2
      }
    }

    var continue = true
    while (continue) {
      // max-weight edge from tree to non-tree
      var best: Option[(JoinEdge, Int, Int)] = None // (edge, treeSide, newSide)
      members.foreach { u =>
        adj(u).foreach { ei =>
          val e = g.edges(ei)
          val v = e.other(u)
          if (!inTree(v) && best.forall(b => better(e, b._1))) {
            best = Some((e, u, v))
          }
        }
      }
      best match {
        case Some((e, u, v)) =>
          inTree(v) = true
          members += v
          parentOf(v) = e
          parent(v) = u
        case None => continue = false
      }
    }

    val depth = mutable.HashMap[Int, Int](root -> 0)
    // members were appended in Prim order; parents always precede children
    members.drop(1).foreach(v => depth(v) = depth(parent(v)) + 1)
    (parentOf.toMap, depth.toMap, members.toSeq)
  }

  /** Forward pass: deepest level first, each node builds a BF over its side
   *  of the parent edge, the parent is probed. Backward pass: shallowest
   *  first, parent builds (over its forward-filtered self), child probed.
   *  Level-internal order: cardinality ascending so the smallest (most
   *  selective) filters land first (reference: rpt_optimizer.cpp:876-880). */
  private def schedulePasses(
      g: JoinGraph,
      parentOf: Map[Int, JoinEdge],
      depth: Map[Int, Int],
      members: Seq[Int],
      passMode: String): Seq[ScheduledOp] = {
    if (members.size < 2) return Nil
    val ops = mutable.ArrayBuffer[ScheduledOp]()
    val byLevelDesc = members.filter(parentOf.contains)
      .sortBy(u => (-depth(u), g.units(u).card))

    // forward: child -> parent
    byLevelDesc.foreach { child =>
      val e = parentOf(child)
      val par = e.other(child)
      if (e.canFilter(par) && g.units(child).buildable) {
        ops += ScheduledOp(child, e.keysOf(child), par, e.keysOf(par),
          forward = true)
      }
    }

    // backward: parent -> child
    if (passMode != "forwardOnly") {
      val byLevelAsc = members.filter(parentOf.contains)
        .sortBy(u => (depth(u), g.units(u).card))
      byLevelAsc.foreach { child =>
        val e = parentOf(child)
        val par = e.other(child)
        if (e.canFilter(child) && g.units(par).buildable) {
          ops += ScheduledOp(par, e.keysOf(par), child, e.keysOf(child),
            forward = false)
        }
      }
    }
    ops.toSeq
  }
}
