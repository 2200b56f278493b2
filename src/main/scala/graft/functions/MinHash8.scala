package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/**
 * The 8 MinHash permutation minima of a shingle-hash array in ONE native
 * pass — bit-identical to the batch d04 SQL
 * (`min((hb * a_i + b_i) % 1073741789)` per permutation, constants
 * [[MinHash8.AB]]) and to the former streaming form (8 separate
 * `array_min(transform(...))` columns).
 *
 * Why an expression: the higher-order-function form evaluates 8
 * interpreted lambdas per shingle and allocates 8 intermediate arrays
 * per document (no codegen for lambda functions); this loop keeps 8
 * scalar accumulators. Same reasoning as [[SimHash48]] — measured 6.4 s
 * at sf1 for the v02 stream, ~5× less native.
 *
 * Input elements must already be reduced mod 1073741789 (the shared
 * `hb` convention): `a * hb < 2^56` keeps the arithmetic overflow-safe
 * in any engine's BIGINT.
 */
case class MinHash8(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_minhash8"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<BIGINT>, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    MinHash8.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHash8.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): MinHash8 =
    copy(child = newChild)
}

object MinHash8 {

  /** The 8 fixed universal-hash (a, b) pairs — odd multipliers < 2^26 so
    * `a * hb < 2^56` stays overflow-safe in both engines' BIGINT
    * arithmetic. Shared with the batch SQL via DedupQueries.minhashAB. */
  val AB: Seq[(Long, Long)] = Seq(
    (12582917L, 29123L), (23456789L, 399491L), (14348907L, 735632L),
    (28629151L, 104729L), (17895697L, 999331L), (21233231L, 77611L),
    (19487171L, 555557L), (25357351L, 11939L))

  val P = 1073741789L

  private val A = AB.map(_._1).toArray
  private val B = AB.map(_._2).toArray

  /** 8 permutation minima; empty/all-null input yields Long.MaxValue
    * minima (callers filter docs with no shingles, matching the batch
    * CTE's implicit drop). Null elements skip. */
  def compute(hb: ArrayData): ArrayData = {
    val n = hb.numElements()
    val mins = Array.fill(8)(Long.MaxValue)
    var i = 0
    while (i < n) {
      if (!hb.isNullAt(i)) {
        val h = hb.getLong(i)
        var j = 0
        while (j < 8) {
          val v = (h * A(j) + B(j)) % P
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}
