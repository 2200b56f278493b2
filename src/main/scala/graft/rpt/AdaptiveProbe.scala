package graft.rpt

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Predicate, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._

/**
 * Self-disabling wrapper around a spliced transfer probe — the Spark
 * analog of the reference wrapping its pushed BF scan filters in
 * `SelectivityOptionalFilter(1, 1000000)` so the host's scan can abandon
 * an unselective filter mid-query (reference:
 * physical_create_bf.cpp:326-328). Spark cannot unplan a `Filter`, but a
 * predicate can stop paying for itself: each partition evaluates the
 * wrapped probe normally while counting its keep-rate, and once
 * `sampleRows` rows have been seen with `kept/seen >= keepThreshold` the
 * instance latches off and returns `true` without evaluating the child —
 * the per-row hash + bloom lookup stops. A probe that stays selective
 * stops paying the sampling counters once the sample window closes; its
 * only permanent tax is one boolean/long comparison per row.
 *
 * Correctness: a transfer probe is superset-safe by construction (it only
 * removes rows that cannot survive the join), so replacing it with `true`
 * for the remainder of a partition can only pass extra rows that the join
 * itself filters — results are unchanged, pinned by AdaptiveProbeSuite.
 * Null child results (null probe key — cannot match an equi-join either)
 * keep their drop semantics while sampling and count as drops.
 *
 * State is per-instance: under whole-stage codegen the counters are
 * mutable fields of the per-partition generated class; interpreted, each
 * task deserializes its own expression tree. Were an interpreted instance
 * ever shared across threads, a counter race could only perturb WHEN the
 * latch fires — both branches (keep evaluating / pass-through) are
 * individually correct, so the race is benign by construction. The
 * decision is checked once, exactly at `seen == sampleRows` (the
 * reference's single 1M-row sample), so a partition smaller than the
 * sample never disables and behaves byte-identically to the bare probe.
 */
case class AdaptiveProbe(
    child: Expression,
    sampleRows: Long,
    keepThreshold: Double)
  extends UnaryExpression with Predicate {

  override def nullable: Boolean = child.nullable

  override def prettyName: String = "graft_adaptive_probe"

  @transient private var seen = 0L
  @transient private var kept = 0L
  @transient private var off = false

  override def eval(input: InternalRow): Any = {
    if (off) true
    else {
      val v = child.eval(input)
      if (seen < sampleRows) {
        seen += 1
        if (v == true) kept += 1
        if (seen == sampleRows &&
            kept >= (keepThreshold * sampleRows).toLong) {
          off = true
          AdaptiveProbe.noteDisable()
        }
      }
      v
    }
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val seenV = ctx.addMutableState(CodeGenerator.JAVA_LONG, "graftProbeSeen")
    val keptV = ctx.addMutableState(CodeGenerator.JAVA_LONG, "graftProbeKept")
    val offV =
      ctx.addMutableState(CodeGenerator.JAVA_BOOLEAN, "graftProbeOff")
    // Steady-state fast path (RPTBENCH_r13 part 3 finding 2: the wrap's
    // residual deep-plan tax is per-row branch+counter mechanics): once
    // the sample window closes WITHOUT latching — the selective-probe
    // common case, i.e. the partitions where the probe runs for its whole
    // life — the row loop takes ONE predictable branch (`fastOn`) and
    // falls straight into the bare probe, the closest row-at-a-time
    // codegen gets to the reference's per-vector check
    // (physical_use_bf.cpp:145-190). The sampling window and the latched
    // pass-through both live on the slow arm, whose cost is bounded by
    // the window (64k rows) or repaid by the skipped probe.
    val fastOnV =
      ctx.addMutableState(CodeGenerator.JAVA_BOOLEAN, "graftProbeFastOn")
    val c = child.genCode(ctx)
    val keptFloor = (keepThreshold * sampleRows).toLong
    ev.copy(code =
      code"""
        boolean ${ev.isNull} = false;
        boolean ${ev.value} = true;
        if (!$offV) {
          ${c.code}
          ${ev.isNull} = ${c.isNull};
          ${ev.value} = ${c.value};
          if (!$fastOnV) {
            $seenV++;
            if (!${c.isNull} && ${c.value}) $keptV++;
            if ($seenV == ${sampleRows}L) {
              if ($keptV >= ${keptFloor}L) {
                $offV = true;
                graft.rpt.AdaptiveProbe.noteDisable();
              } else {
                $fastOnV = true;
              }
            }
          }
        }
      """)
  }

  override protected def withNewChildInternal(
      newChild: Expression): AdaptiveProbe = copy(child = newChild)
}

object AdaptiveProbe {
  /** Per-JVM count of partition-instances that latched off — incremented
   *  at most once per partition (the latch), so the counter costs nothing
   *  on the per-row path. Diagnostic: in local mode and tests it is the
   *  total; on a cluster it is per-executor. Held in the System
   *  properties table rather than a companion field because layered
   *  classloaders (sbt runMain, REPLs) load a separate companion object
   *  for executor-deserialized expression trees — an AtomicLong reached
   *  through the bootstrap-loaded Properties singleton is the one JVM-wide
   *  instance every loader sees. */
  private val disableCount: java.util.concurrent.atomic.AtomicLong = {
    val key = "graft.rpt.adaptiveProbe.disables"
    val props = System.getProperties
    props.synchronized {
      props.get(key) match {
        case a: java.util.concurrent.atomic.AtomicLong => a
        case _ =>
          val a = new java.util.concurrent.atomic.AtomicLong
          props.put(key, a)
          a
      }
    }
  }

  def noteDisable(): Unit = disableCount.incrementAndGet()
  def disables: Long = disableCount.get()
  def resetDisables(): Unit = disableCount.set(0L)
}
