package graft.rpt

/**
 * ASCII rendering of the transfer schedule — the analog of the reference's
 * `rpt_display_dag` visualization (src/utils/dag_printer.cpp).
 */
object DagPrinter {
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
