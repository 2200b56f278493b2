package graft.rpt

import org.apache.spark.sql.execution.QueryExecution

/**
 * ASCII rendering of the transfer schedule — the analog of the reference's
 * `rpt_display_dag` visualization (src/utils/dag_printer.cpp), plus the
 * post-execution boxed-tree renderer `renderPhysical` — the analog of
 * `rpt_display_physical_dag` (dag_printer.cpp's RenderSubtree boxes,
 * rpt_optimizer.cpp:812-824) with each unit box annotated by its MEASURED
 * probe rows/selectivity from [[RptProfiling]].
 */
object DagPrinter {

  /** One rendered box/subtree: text lines + connector column. */
  private case class Block(lines: Vector[String], center: Int) {
    def width: Int = lines.map(_.length).max
  }

  private def fmtCard(card: Double): String =
    if (card >= 1e9) f"${card / 1e9}%.1fB rows"
    else if (card >= 1e6) f"${card / 1e6}%.1fM rows"
    else if (card >= 1e3) f"${card / 1e3}%.1fK rows"
    else f"$card%.0f rows"

  private def box(lines: Seq[String]): Block = {
    val w = lines.map(_.length).max
    val top = "+" + "-" * (w + 2) + "+"
    val body = lines.map(l => "| " + l + " " * (w - l.length) + " |")
    Block((top +: body :+ top).toVector, top.length / 2)
  }

  /** Stack `parent` over its children blocks, reference-style: children
    * laid out left-to-right, a connector from the parent's center to each
    * child's center. */
  private def stack(parent: Block, children: Seq[Block]): Block = {
    if (children.isEmpty) return parent
    val gap = 2
    // child center columns in the combined row; shift whichever side is
    // narrower so the parent connector meets the children's midpoint
    val rawOffsets = children.scanLeft(0)((acc, c) => acc + c.width + gap).init
    val rawCenters = rawOffsets.zip(children).map { case (o, c) => o + c.center }
    val rawMid = (rawCenters.head + rawCenters.last) / 2
    val childShift = math.max(0, parent.center - rawMid)
    val offsets = rawOffsets.map(_ + childShift)
    val centers = rawCenters.map(_ + childShift)
    val totalW = childShift +
      children.map(_.width).sum + gap * (children.size - 1)
    val mid = (centers.head + centers.last) / 2
    val shift = math.max(0, mid - parent.center)
    val shiftedParent = parent.lines.map(" " * shift + _)
    val parentCenter = parent.center + shift
    // connector: vertical tick under the parent, a rail across the child
    // centers, then a tick down into each child
    val rail = {
      val sb = new StringBuilder(" " * (math.max(totalW, parentCenter + 1)))
      centers.foreach(c => sb.setCharAt(c, '+'))
      for (i <- centers.head + 1 until centers.last)
        if (sb.charAt(i) == ' ') sb.setCharAt(i, '-')
      if (parentCenter < sb.length && sb.charAt(parentCenter) == '-')
        sb.setCharAt(parentCenter, '+')
      sb.toString
    }
    val ticks = {
      val sb = new StringBuilder(" " * totalW)
      centers.foreach(c => sb.setCharAt(c, '|'))
      sb.toString
    }
    val vertical = {
      val sb = new StringBuilder(" " * (parentCenter + 1))
      sb.setCharAt(parentCenter, '|')
      sb.toString
    }
    val maxH = children.map(_.lines.size).max
    val childRows = (0 until maxH).map { r =>
      " " * childShift + children.map { c =>
        val line = if (r < c.lines.size) c.lines(r) else ""
        line + " " * (c.width - line.length)
      }.mkString(" " * gap)
    }
    Block(shiftedParent ++ Vector(vertical, rail, ticks) ++ childRows,
      parentCenter)
  }

  /**
   * Post-execution boxed operator DAG: the rooted transfer tree (forward
   * edges child→parent), each box carrying the unit's name, estimated
   * cardinality, and — joined from the executed plan's metrics — the
   * measured probe rows in→out with selectivity. Probe stats attach to
   * the unit whose output columns cover the probe's key columns (the
   * measured analog of the reference's per-op profiling print,
   * rpt_profiling.hpp:122-216 + dag_printer.cpp RenderSubtree).
   */
  def renderPhysical(
      graph: JoinGraph, ops: Seq[ScheduledOp], qe: QueryExecution): String = {
    val stats = RptProfiling.probeStats(qe)
    val used = collection.mutable.Set[Int]()
    def statsFor(u: TableUnit): Seq[RptProfiling.ProbeStat] = {
      val names = u.plan.output.map(_.name).toSet
      stats.zipWithIndex.collect {
        case (s, i) if !used(i) && s.probeCols.nonEmpty &&
            s.probeCols.forall(names.contains) =>
          used += i; s
      }
    }
    val fwd = ops.filter(_.forward)
    val childrenOf: Map[Int, Seq[Int]] =
      fwd.groupBy(_.probe).view.mapValues(_.map(_.build)).toMap
    val isChild = fwd.map(_.build).toSet
    val inTree = (fwd.map(_.build) ++ fwd.map(_.probe)).distinct
    val roots = inTree.filterNot(isChild)

    def render(id: Int, seen: Set[Int]): Block = {
      val u = graph.units(id)
      val probeLines = statsFor(u).map { s =>
        f"${s.pass} probe: ${s.rowsIn}%,d -> ${s.rowsOut}%,d (${s.selectivity * 100}%.2f%%)"
      }
      val head = s"${u.plan.nodeName} (unit $id)"
      val b = box(head +: fmtCard(u.card) +: probeLines)
      val kids = childrenOf.getOrElse(id, Nil).filterNot(seen)
      stack(b, kids.map(k => render(k, seen + id)))
    }

    val sb = new StringBuilder("rpt physical DAG (forward tree, measured probes):\n")
    roots.foreach { r =>
      render(r, Set(r)).lines.foreach(l => sb.append(l).append('\n'))
    }
    val builds = RptProfiling.buildStats(qe)
    if (builds.nonEmpty) {
      sb.append("builds:\n")
      builds.foreach { b =>
        val t = if (b.collectMs >= 0) f"${b.collectMs}%,d ms" else "--"
        sb.append(f"  ${b.name}%-24s $t  ${math.max(0L, b.dataBytes)}%,d B" +
          (if (b.reused) "  (reused)" else "") + "\n")
      }
    }
    sb.toString
  }

  def render(graph: JoinGraph, ops: Seq[ScheduledOp]): String = {
    val sb = new StringBuilder
    sb.append("units:\n")
    graph.units.foreach { u =>
      val head = u.plan.nodeName
      val cols = u.plan.output.take(4).map(_.name).mkString(", ")
      sb.append(f"  [${u.id}%2d] card=${u.card}%,.0f $head($cols${if (u.plan.output.size > 4) ", ..." else ""})\n")
    }
    sb.append("edges:\n")
    graph.edges.foreach { e =>
      val keys = e.keyPairs.map { case (l, r) => s"${l.sql}=${r.sql}" }.mkString(" AND ")
      sb.append(s"  ${e.a} -- ${e.b} [$keys] w=${e.weight}\n")
    }
    sb.append("schedule:\n")
    ops.zipWithIndex.foreach { case (op, i) =>
      val dir = if (op.forward) "fwd" else "bwd"
      sb.append(f"  #$i%2d $dir CREATE@${op.build}(${op.buildKeys.map(_.sql).mkString(",")}) -> PROBE@${op.probe}(${op.probeKeys.map(_.sql).mkString(",")})\n")
    }
    sb.toString
  }
}
