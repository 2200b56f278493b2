package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/**
 * Distinct 3-token-shingle hashes of a word array in ONE native pass —
 * bit-identical to the composed SQL form the v02 stream used:
 *
 * {{{
 * transform(array_distinct(transform(sequence(1, size(w) - 2),
 *   i -> graft_hash60(concat_ws(' ', slice(w, i, 3))))),
 *   h -> h %% 1073741789)
 * }}}
 *
 * (and therefore to the batch d04 shingle CTE, which computes the same
 * `graft_hash60` per exploded window with DISTINCT applied on the
 * 60-bit hash BEFORE the mod — two hashes colliding mod P legitimately
 * both survive).
 *
 * Why an expression: lambda functions never enter whole-stage codegen,
 * so the HOF form pays interpreted dispatch plus three allocations per
 * shingle (the slice array, the concatenated string, the boxed hash) and
 * two more intermediate arrays per document. This loop md5-streams each
 * token's bytes directly into one thread-local digest — the only
 * per-document allocations are the token byte cache and the result.
 * Same reasoning as [[MinHash8]]/[[SimHash48]]; measured 6.1 s at sf1
 * for the v02 stream against 2.2 s for the batch twin whose explode
 * pipeline DOES codegen.
 *
 * Contract notes, mirrored from the SQL form exactly:
 *  - fewer than 3 tokens -> empty array (callers additionally filter
 *    such docs out, matching the batch CTE's implicit drop);
 *  - null tokens are SKIPPED by concat_ws, shrinking the joined string
 *    (not its window) — replicated here;
 *  - first-occurrence order of distinct hashes is preserved, as
 *    `array_distinct` does.
 */
case class ShingleHashes60(child: Expression, modP: Boolean = true)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_shingles60"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<STRING>, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    ShingleHashes60.compute(input.asInstanceOf[ArrayData], modP)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ShingleHashes60.compute($c, $modP)")

  override protected def withNewChildInternal(
      newChild: Expression): ShingleHashes60 = copy(child = newChild)
}

object ShingleHashes60 {

  private val P = MinHash8.P
  private val Space = ' '.toByte

  private val digests = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** Distinct (on the 60-bit hash, first-occurrence order) shingle
    * hashes; `modP = false` keeps the full 60-bit values (the
    * [[graft.streaming.StreamingOps.shingleHashes]] convention — batch
    * d03/d07 join on the FULL hash, only minhash reduces mod P). */
  def compute(w: ArrayData, modP: Boolean): ArrayData = {
    val n = w.numElements()
    if (n < 3) return new GenericArrayData(Array.emptyLongArray)
    // each token's UTF-8 bytes feed up to 3 windows — copy once
    val toks = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      if (!w.isNullAt(i)) toks(i) = w.getUTF8String(i).getBytes
      i += 1
    }
    val md = digests.get()
    val digest = new Array[Byte](16)
    val seen = new java.util.HashSet[java.lang.Long](Math.min(n * 2, 1 << 16))
    val out = new Array[Long](n - 2)
    var m = 0
    i = 0
    while (i <= n - 3) {
      md.reset()
      var first = true
      var k = i
      while (k <= i + 2) {
        if (toks(k) != null) { // concat_ws skips nulls
          if (!first) md.update(Space)
          md.update(toks(k))
          first = false
        }
        k += 1
      }
      md.digest(digest, 0, 16)
      val h = Hash60.fromDigest(digest)
      if (seen.add(h)) {
        out(m) = if (modP) h % P else h
        m += 1
      }
      i += 1
    }
    new GenericArrayData(if (m == out.length) out else out.take(m))
  }
}
