package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * MD5 as a tuned NATIVE expression family. The built-in `md5` routes
 * through commons-codec's `DigestUtils.md5Hex`, which allocates a fresh
 * `MessageDigest` per ROW plus a `char[]` + `String` + `UTF8String` for
 * the hex rendering; the sketch pipelines additionally parse that hex
 * back into a number via `conv(substring(...))` — string round-trips on
 * every value of a 100 TB scan. These expressions keep the EXACT md5
 * contract (the cross-engine oracle currency: any engine replays it)
 * while removing the per-row allocation tax:
 *
 *  - [[Md5HexExpression]] — drop-in `md5(string)`: thread-local digest
 *    instance, hex bytes written directly into the result buffer.
 *    Output is byte-identical to `functions.md5`.
 *  - [[Md5Prefix48Expression]] — the fused sketch hash: first 48 bits
 *    (12 hex chars) of the digest as a LONG, equal to
 *    `conv(substring(md5(x), 1, 12), 16, 10)` with the hex string never
 *    materialized. Non-negative, < 2^48, so (k-1)·2^48 stays in a
 *    signed long for every KMV k in range.
 *
 * Both stay inside whole-stage codegen (`doGenCode` emits a static
 * call), so the projection pipeline around them never breaks into an
 * eval boundary.
 */
object Md5Codegen {
  private val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))
  private val outBufs: ThreadLocal[Array[Byte]] =
    ThreadLocal.withInitial(() => new Array[Byte](16))

  /** Digest of the UTF-8 bytes into the thread-local 16-byte buffer
    * (valid until this thread's next call). */
  private def digest(u: UTF8String): Array[Byte] = {
    val md = digests.get()
    md.reset()
    val b = u.getBytes
    md.update(b, 0, b.length)
    val out = outBufs.get()
    md.digest(out, 0, 16)
    out
  }

  private val HEX: Array[Byte] = "0123456789abcdef".getBytes

  /** 32-char lowercase hex digest — byte-identical to the built-in
    * `md5` of the same string. */
  def md5Hex(u: UTF8String): UTF8String = {
    val d = digest(u)
    val hex = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      hex(2 * i) = HEX((d(i) >> 4) & 0xf)
      hex(2 * i + 1) = HEX(d(i) & 0xf)
      i += 1
    }
    UTF8String.fromBytes(hex)
  }

  /** First 48 bits of the digest as a non-negative long — the fused
    * `conv(substring(md5(x), 1, 12), 16, 10)`. */
  def md5Prefix48(u: UTF8String): Long = {
    val d = digest(u)
    ((d(0) & 0xffL) << 40) | ((d(1) & 0xffL) << 32) |
      ((d(2) & 0xffL) << 24) | ((d(3) & 0xffL) << 16) |
      ((d(4) & 0xffL) << 8) | (d(5) & 0xffL)
  }
}

case class Md5HexExpression(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"md5_fast requires STRING, got ${t.simpleString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "md5_fast"

  override def nullSafeEval(input: Any): Any =
    Md5Codegen.md5Hex(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Codegen.md5Hex($c)")

  override protected def withNewChildInternal(
      newChild: Expression): Md5HexExpression = copy(child = newChild)
}

case class Md5Prefix48Expression(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"md5_prefix48 requires STRING, got ${t.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "md5_prefix48"

  override def nullSafeEval(input: Any): Any =
    Md5Codegen.md5Prefix48(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Codegen.md5Prefix48($c)")

  override protected def withNewChildInternal(
      newChild: Expression): Md5Prefix48Expression = copy(child = newChild)
}

object Md5Functions {
  /** Byte-identical, allocation-free drop-in for `functions.md5` on
    * STRING input. */
  def md5Hex(c: Column): Column =
    ColumnShim.column(Md5HexExpression(ColumnShim.expression(c)))

  /** `conv(substring(md5(x), 1, 12), 16, 10)` fused to one LONG-typed
    * native call. */
  def md5Prefix48(c: Column): Column =
    ColumnShim.column(Md5Prefix48Expression(ColumnShim.expression(c)))
}
