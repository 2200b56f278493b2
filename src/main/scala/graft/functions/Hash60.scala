package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * 60-bit md5-prefix hash, bit-identical to the portable SQL form
 * `CAST(conv(substr(md5(x), 1, 15), 16, 10) AS BIGINT)` (and DuckDB's
 * `CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)`): the first 15 hex
 * digits of the md5 = digest bytes 0..6 plus the high nibble of byte 7.
 *
 * The SQL form materializes a 32-char hex string, substrings it, and
 * re-parses base-16 per row; this expression reads the digest bytes
 * directly (one thread-local MessageDigest, zero intermediate strings) —
 * the hot hash of the dedup pipeline (SURVEY.md §7 roadmap ops d03-d05).
 */
case class Hash60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_hash60"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    Hash60.hash60(input.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Hash60.hash60($c)")

  override protected def withNewChildInternal(newChild: Expression): Hash60 =
    copy(child = newChild)
}

object Hash60 {
  private val digests = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** First 60 bits of md5(s) as a non-negative long. */
  def hash60(s: UTF8String): Long = {
    val md = digests.get()
    md.reset()
    fromDigest(md.digest(s.getBytes))
  }

  /** First 60 bits of an md5 digest (bytes 0..6 + high nibble of 7) —
    * shared with [[ShingleHashes60]], which streams token bytes into the
    * digest instead of materializing the shingle string. */
  def fromDigest(d: Array[Byte]): Long = {
    var v = 0L
    var i = 0
    while (i < 7) {
      v = (v << 8) | (d(i) & 0xffL)
      i += 1
    }
    (v << 4) | ((d(7) & 0xffL) >>> 4)
  }
}
