package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/**
 * 48-bit SimHash of a token array, bit-identical to the batch d05 SQL
 * (explode → [[Hash60]] per token → 48 signed bit-balances → bit j set
 * iff balance_j > 0) but computed IN-ROW in one native loop.
 *
 * Why an expression and not SQL: the higher-order-function form
 * (`aggregate` + `zip_with` + `transform` over a 48-element array per
 * token) is interpreted — no whole-stage codegen for lambda functions —
 * and allocates two 48-element arrays per token per document. At sf1
 * (50k docs × ~200 distinct tokens) that measured 339 s; this loop is
 * int-array arithmetic inside generated code. The ingest-time streaming
 * fingerprint (StreamingOps.simhash) is its consumer — the operator
 * stays stateless and shuffle-free, per-row cost drops ~100×.
 */
case class SimHash48(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_simhash48"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<STRING>, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    SimHash48.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash48.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash48 =
    copy(child = newChild)
}

object SimHash48 {

  /** Signed bit-balance SimHash over the token array (null tokens skip). */
  def compute(tokens: ArrayData): Long = {
    val n = tokens.numElements()
    val bal = new Array[Int](48)
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = Hash60.hash60(tokens.getUTF8String(i))
        var j = 0
        while (j < 48) {
          bal(j) += (((h >>> j) & 1L).toInt << 1) - 1 // bit ? +1 : -1
          j += 1
        }
      }
      i += 1
    }
    var v = 0L
    var j = 0
    while (j < 48) {
      if (bal(j) > 0) v |= 1L << j
      j += 1
    }
    v
  }
}
