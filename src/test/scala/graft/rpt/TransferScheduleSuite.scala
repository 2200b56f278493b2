package graft.rpt

import org.apache.spark.sql.catalyst.expressions.AttributeReference
import org.apache.spark.sql.catalyst.plans.logical.OneRowRelation
import org.apache.spark.sql.types.LongType
import org.scalatest.funsuite.AnyFunSuite

/** Pure unit tests for the transfer-schedule builders (no SparkSession):
 *  root selection, pass structure and ordering, DAG orientation, root
 *  flipping — the reference's LargestRoot/BuildRootedTree/
 *  GenerateStageModifications logic (rpt_optimizer.cpp:215-995). */
class TransferScheduleSuite extends AnyFunSuite {

  private def attr(name: String) = AttributeReference(name, LongType)()

  /** Chain A(10) - B(100) - C(1000): largest root = C. */
  private def chainGraph: JoinGraph = {
    val units = IndexedSeq(
      TableUnit(0, OneRowRelation(), 10, buildable = true),
      TableUnit(1, OneRowRelation(), 100, buildable = true),
      TableUnit(2, OneRowRelation(), 1000, buildable = true))
    val edges = IndexedSeq(
      JoinEdge(0, 1, Seq((attr("a"), attr("b1"))), true, true),
      JoinEdge(1, 2, Seq((attr("b2"), attr("c"))), true, true))
    JoinGraph(units, edges)
  }

  test("largestRoot: forward = leaves to root, backward mirrors") {
    val ops = TransferSchedule.largestRoot(chainGraph, "both")
    val fwd = ops.filter(_.forward)
    val bwd = ops.filterNot(_.forward)
    // forward: A builds for B, then B builds for C (deepest first)
    assert(fwd.map(o => (o.build, o.probe)) == Seq((0, 1), (1, 2)))
    // backward: C builds for B, then B builds for A (root first)
    assert(bwd.map(o => (o.build, o.probe)) == Seq((2, 1), (1, 0)))
  }

  test("largestRoot: forwardOnly drops the backward pass") {
    val ops = TransferSchedule.largestRoot(chainGraph, "forwardOnly")
    assert(ops.nonEmpty && ops.forall(_.forward))
  }

  test("largestRoot: outer-join safety respected per direction") {
    val units = IndexedSeq(
      TableUnit(0, OneRowRelation(), 10, buildable = true),
      TableUnit(1, OneRowRelation(), 1000, buildable = true))
    // only side b may be filtered (left-outer: left rows preserved)
    val g = JoinGraph(units, IndexedSeq(
      JoinEdge(0, 1, Seq((attr("a"), attr("b"))), false, true)))
    val ops = TransferSchedule.largestRoot(g, "both")
    assert(ops.nonEmpty)
    assert(ops.forall(_.probe == 1), s"filtered the preserved side: $ops")
  }

  test("largestRoot: non-buildable units never build") {
    val units = IndexedSeq(
      TableUnit(0, OneRowRelation(), 10, buildable = false),
      TableUnit(1, OneRowRelation(), 1000, buildable = true))
    val g = JoinGraph(units, IndexedSeq(
      JoinEdge(0, 1, Seq((attr("a"), attr("b"))), true, true)))
    val ops = TransferSchedule.largestRoot(g, "both")
    assert(ops.forall(_.build != 0))
  }

  test("largestRoot: disconnected components each get a schedule") {
    val units = IndexedSeq(
      TableUnit(0, OneRowRelation(), 10, buildable = true),
      TableUnit(1, OneRowRelation(), 100, buildable = true),
      TableUnit(2, OneRowRelation(), 10, buildable = true),
      TableUnit(3, OneRowRelation(), 100, buildable = true))
    val g = JoinGraph(units, IndexedSeq(
      JoinEdge(0, 1, Seq((attr("a"), attr("b"))), true, true),
      JoinEdge(2, 3, Seq((attr("c"), attr("d"))), true, true)))
    val ops = TransferSchedule.largestRoot(g, "forwardOnly")
    assert(ops.map(o => (o.build, o.probe)).toSet == Set((0, 1), (2, 3)))
  }

  test("joinOrder: edges orient build/right endpoint toward stream/left") {
    // edges extracted with ._1 = left subtree: b is child, a is parent
    val ops = TransferSchedule.joinOrder(chainGraph, "forwardOnly",
      flipRoots = false)
    // A-B edge: parent A (left), child B; B-C edge: parent B, child C
    assert(ops.map(o => (o.build, o.probe)).toSet == Set((1, 0), (2, 1)))
  }

  test("joinOrder: flipRoots demotes non-largest roots") {
    // without flipping, unit 0 (card 10) is the root of the DAG — the
    // worst table to anchor transfers; flipping reroots at unit 2 (1000)
    val opsNoFlip = TransferSchedule.joinOrder(chainGraph, "forwardOnly",
      flipRoots = false)
    val opsFlip = TransferSchedule.joinOrder(chainGraph, "forwardOnly",
      flipRoots = true)
    assert(opsNoFlip != opsFlip)
    // after flipping, forward transfers run toward the largest table
    assert(opsFlip.map(o => (o.build, o.probe)).toSet == Set((0, 1), (1, 2)))
  }

  test("largestRoot: multi-key edge keeps all key pairs") {
    val k1 = (attr("x1"), attr("y1")); val k2 = (attr("x2"), attr("y2"))
    val g = JoinGraph(IndexedSeq(
      TableUnit(0, OneRowRelation(), 10, buildable = true),
      TableUnit(1, OneRowRelation(), 1000, buildable = true)),
      IndexedSeq(JoinEdge(0, 1, Seq(k1, k2), true, true)))
    val ops = TransferSchedule.largestRoot(g, "forwardOnly")
    assert(ops.head.buildKeys.size == 2 && ops.head.probeKeys.size == 2)
  }
}
