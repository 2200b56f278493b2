package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Repetition statistics of a token array in one native pass:
 * `struct(top_cnt, n_tok, n_grams, distinct_grams)` where `top_cnt` is
 * the highest token multiplicity and the gram counts cover the adjacent
 * 2-grams — the integer inputs of the t06/Gopher repetition gate
 * (`top_word_frac = top_cnt / n_tok`,
 * `dup_2gram_frac = 1 - distinct_grams / n_grams`). The fraction math
 * stays in SQL so stream and batch keep bit-identical doubles.
 *
 * Why an expression: the HOF form (sorted-run `aggregate` with a struct
 * accumulator per token + `zip_with` gram concat + `array_distinct`) is
 * interpreted and allocates per token; this is two index sorts. 2-grams
 * compare as token PAIRS, which equals the SQL's `concat(a, ' ', b)`
 * distinctness because tokens cannot contain the separator. Same
 * reasoning as [[SimHash48]]/[[MinHash8]] — v05 measured 4.7 s at sf1.
 */
case class RepStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("top_cnt", IntegerType, nullable = false),
    StructField("n_tok", IntegerType, nullable = false),
    StructField("n_grams", IntegerType, nullable = false),
    StructField("distinct_grams", IntegerType, nullable = false)))

  override def prettyName: String = "graft_repstats"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<STRING>, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    RepStats.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RepStats.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): RepStats =
    copy(child = newChild)
}

object RepStats {

  /** Null tokens count as distinct-from-everything empties (split() never
    * produces them; guarded for safety). */
  def compute(tokens: ArrayData): InternalRow = {
    val n = tokens.numElements()
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      toks(i) = if (tokens.isNullAt(i)) UTF8String.EMPTY_UTF8
                else tokens.getUTF8String(i)
      i += 1
    }
    // top multiplicity: sort a copy, longest equal run
    val sorted = toks.clone()
    java.util.Arrays.sort(sorted, (a: UTF8String, b: UTF8String) => a.compareTo(b))
    var top = if (n > 0) 1 else 0
    var run = 1
    i = 1
    while (i < n) {
      if (sorted(i) == sorted(i - 1)) run += 1 else run = 1
      if (run > top) top = run
      i += 1
    }
    // distinct adjacent 2-grams: sort gram START indices by (tok, next)
    val nGrams = math.max(0, n - 1)
    var distinct = 0
    if (nGrams > 0) {
      val idx = new Array[Integer](nGrams)
      i = 0
      while (i < nGrams) { idx(i) = Integer.valueOf(i); i += 1 }
      java.util.Arrays.sort(idx, (x: Integer, y: Integer) => {
        val c1 = toks(x.intValue).compareTo(toks(y.intValue))
        if (c1 != 0) c1
        else toks(x.intValue + 1).compareTo(toks(y.intValue + 1))
      })
      distinct = 1
      i = 1
      while (i < nGrams) {
        val a = idx(i - 1).intValue
        val b = idx(i).intValue
        if (!(toks(a) == toks(b) && toks(a + 1) == toks(b + 1))) distinct += 1
        i += 1
      }
    }
    new GenericInternalRow(Array[Any](top, n, nGrams, distinct))
  }
}
