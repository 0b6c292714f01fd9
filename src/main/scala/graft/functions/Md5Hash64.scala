package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd 64-bit md5 prefix of a string: the first 8 digest
  * bytes, big-endian — numerically identical to parsing the first 16 hex
  * characters of `md5(s)` as an unsigned 64-bit value, which is exactly
  * what an engine-neutral oracle recomputes
  * (`CAST(concat('0x', substr(md5(w), 1, 16)) ...)` via two 32-bit
  * halves). Replaces the built-in 3-op chain
  * `conv(substring(md5(w), ...), 16, 10)` that round-trips through a hex
  * STRING and decimal-string parsing per row (two of them for a 64-bit
  * value); here the digest bytes feed the long directly.
  *
  * Cross-engine hashing contract: md5 is the repo's only engine-shared
  * hash primitive (xxhash64/murmur are Spark-only). This expression is
  * the hot-path form of that contract for simhash-style per-token
  * hashing.
  */
case class Md5Hash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"md5_hash64 requires a string input, got ${t.sql}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "md5_hash64"

  override def nullSafeEval(input: Any): Any =
    Md5Hash64.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Hash64.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Hash64 =
    copy(child = newChild)
}

object Md5Hash64 {
  // MessageDigest is stateful and not thread-safe; one per executor thread
  private val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** First 8 md5 bytes of the utf-8 encoding, big-endian. */
  def hash(s: UTF8String): Long = {
    val md = digest.get()
    md.reset()
    val d = md.digest(s.getBytes)
    ((d(0) & 0xFFL) << 56) | ((d(1) & 0xFFL) << 48) |
      ((d(2) & 0xFFL) << 40) | ((d(3) & 0xFFL) << 32) |
      ((d(4) & 0xFFL) << 24) | ((d(5) & 0xFFL) << 16) |
      ((d(6) & 0xFFL) << 8) | (d(7) & 0xFFL)
  }
}
