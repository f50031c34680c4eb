package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._

/**
 * Native crawl-log tokenizer, byte-exact to the reference's
 * `line.split("\\s+")` after its one-trailing-CR strip
 * (CrawlLogLoader.java:44-60): Java split semantics — a line starting
 * with whitespace keeps ONE leading empty token (fields shift, exactly
 * as the reference mis-parses such a line), trailing empty tokens are
 * dropped, and an empty/all-whitespace line yields `[""]` (which the
 * >= 12-token filter drops).
 *
 * This replaces `split(trim(regexp_replace(line, "\r$", "")), "\\s+")`,
 * which was BOTH slower (two regex passes per line dominated the whole
 * parse) and less faithful: Spark's `trim` strips only spaces, and
 * Spark's `split` keeps trailing empties, so lines with edge tabs/CRs
 * tokenized differently from the reference. Every Java `\s` byte
 * ([ \t\n\x0B\f\r]) is ASCII and ASCII bytes never occur inside a
 * multi-byte UTF-8 sequence, so a byte scan is exact on any input.
 */
case class WhitespaceSplitExpression(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"ws_split requires STRING, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "ws_split"

  override def nullSafeEval(input: Any): Any =
    TextSplitCodegen.wsSplit(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextSplitCodegen.wsSplit($c)")

  override protected def withNewChildInternal(
      newChild: Expression): WhitespaceSplitExpression =
    copy(child = newChild)
}

/** Static entry points shared by interpreted eval and generated code. */
object TextSplitCodegen {

  import org.apache.spark.unsafe.types.UTF8String

  def hexHighBits(s: UTF8String): java.lang.Integer = {
    if (s.numBytes() < 32) return null
    val bytes = s.getBytes
    var mask = 0
    var j = 0
    while (j < 32) {
      val b = bytes(j)
      val high =
        if (b >= '0' && b <= '7') false
        else if ((b >= '8' && b <= '9') || (b >= 'a' && b <= 'f') ||
          (b >= 'A' && b <= 'F')) true
        else return null
      if (high) mask |= (1 << j)
      j += 1
    }
    java.lang.Integer.valueOf(mask)
  }

  def hexSliceLong(s: UTF8String, pos: Int, len: Int): java.lang.Long = {
    if (s.numBytes() < pos + len) return null
    val bytes = s.getBytes
    var v = 0L
    var i = pos
    val end = pos + len
    while (i < end) {
      val b = bytes(i)
      val d =
        if (b >= '0' && b <= '9') b - '0'
        else if (b >= 'a' && b <= 'f') b - 'a' + 10
        else if (b >= 'A' && b <= 'F') b - 'A' + 10
        else return null
      v = (v << 4) | d
      i += 1
    }
    java.lang.Long.valueOf(v)
  }

  @inline private def isWs(b: Byte): Boolean =
    b == ' ' || (b >= 0x09 && b <= 0x0d)

  def wsSplit(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    var end = bytes.length
    // one trailing CR strip (CrawlLogLoader.java:44-46)
    if (end > 0 && bytes(end - 1) == '\r') end -= 1
    // Java split("\\s+"): leading whitespace yields ONE empty first
    // token; trailing empties are dropped; "" and all-ws input → [""]
    val leadingEmpty = end > 0 && isWs(bytes(0))
    // pass 1: count non-empty runs
    var n = 0
    var i = 0
    var inTok = false
    while (i < end) {
      val ws = isWs(bytes(i))
      if (!ws && !inTok) n += 1
      inTok = !ws
      i += 1
    }
    if (n == 0)
      return new GenericArrayData(Array[Any](UTF8String.EMPTY_UTF8))
    // pass 2: fill
    val out = new Array[Any](if (leadingEmpty) n + 1 else n)
    var k = 0
    if (leadingEmpty) { out(0) = UTF8String.EMPTY_UTF8; k = 1 }
    i = 0
    var tokStart = 0
    while (i <= end) {
      if (i == end || isWs(bytes(i))) {
        if (i > tokStart) {
          out(k) = UTF8String.fromBytes(bytes, tokStart, i - tokStart)
          k += 1
        }
        tokStart = i + 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  private val EmptyRows = new GenericArrayData(Array.empty[Any])

  def wsSplitRows(s: UTF8String, minTokens: Int): ArrayData = {
    val toks = wsSplit(s)
    if (toks.numElements() < minTokens) EmptyRows
    else new GenericArrayData(Array[Any](toks))
  }
}

/**
 * [[WhitespaceSplitExpression]] wrapped for `explode`: the token array
 * boxed as a 1-element `array<array<string>>` when it has at least
 * `minTokens` tokens, an EMPTY outer array otherwise. `explode` of this
 * drops short lines with NO Filter operator in the plan — the point:
 * a `where(size(toks) >= minTokens)` predicate gets pushed below the
 * token-staging projection (and, when the line is itself rendered, below
 * that render too), re-evaluating the split AND the render once in the
 * Filter and again in the Project (A/B'd +45% on the q17 parse). A
 * generator has no predicate to push, so line → tokens is evaluated
 * exactly once per row.
 */
case class WsSplitRowsExpression(child: Expression, minTokens: Int)
    extends UnaryExpression {

  require(minTokens >= 0, s"minTokens must be >= 0, got $minTokens")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"ws_split_rows requires STRING, got ${t.simpleString}")
  }

  override def dataType: DataType =
    ArrayType(ArrayType(StringType, containsNull = false),
      containsNull = false)
  override def prettyName: String = "ws_split_rows"

  override def nullSafeEval(input: Any): Any =
    TextSplitCodegen.wsSplitRows(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      minTokens)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextSplitCodegen.wsSplitRows($c, $minTokens)")

  override protected def withNewChildInternal(
      newChild: Expression): WsSplitRowsExpression =
    copy(child = newChild)
}

/**
 * Parse `len` hex chars of a string at 0-based `pos` into a LONG —
 * `CAST(conv(substring(s, pos+1, len), 16, 10) AS BIGINT)` without the
 * substring allocation or the string round-trip. Purpose-built for the
 * minhash signature aggregation: min() over a fixed-width LONG keeps the
 * hash-aggregate buffer in the UnsafeRow fast path, where min() over a
 * sliced string allocates and compares varlen bytes per input row.
 * NULL when the slice is out of range or a char is not [0-9a-fA-F].
 *
 * PRECONDITION: `pos`/`len` index UTF-8 BYTES, not characters — the
 * substring-equivalence above holds only for ASCII input (one byte per
 * char). On multibyte input the byte slice lands mid-codepoint and, since
 * no multibyte UTF-8 byte is a hex digit, returns NULL rather than a
 * wrong value. Intended inputs are hex digests (md5/sha hex), which are
 * ASCII by construction.
 */
case class HexSliceLongExpression(child: Expression, pos: Int, len: Int)
    extends UnaryExpression {

  require(pos >= 0 && len >= 1 && len <= 15,
    s"hexSliceLong: pos must be >= 0 and 1 <= len <= 15 (got $pos, $len)")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hex_slice_long requires STRING, got ${t.simpleString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "hex_slice_long"

  override def nullSafeEval(input: Any): Any =
    TextSplitCodegen.hexSliceLong(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], pos, len)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      |java.lang.Long ${ev.value}Boxed =
      |  graft.functions.TextSplitCodegen.hexSliceLong($c, $pos, $len);
      |if (${ev.value}Boxed == null) {
      |  ${ev.isNull} = true;
      |} else {
      |  ${ev.value} = ${ev.value}Boxed.longValue();
      |}
      |""".stripMargin)

  override protected def withNewChildInternal(
      newChild: Expression): HexSliceLongExpression =
    copy(child = newChild)
}

/**
 * High-nibble mask of the first 32 hex chars: bit j is set iff char j is
 * in [8-9a-fA-F] — the SimHash per-word vote vector packed into ONE int.
 * The 32 bit-vote aggregates then run on integer shifts of this mask
 * instead of 32 per-row substring allocations + string compares.
 * NULL when the input is shorter than 32 chars or not hex.
 */
case class HexHighBitsExpression(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hex_high_bits requires STRING, got ${t.simpleString}")
  }

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "hex_high_bits"

  override def nullSafeEval(input: Any): Any =
    TextSplitCodegen.hexHighBits(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      |java.lang.Integer ${ev.value}Boxed =
      |  graft.functions.TextSplitCodegen.hexHighBits($c);
      |if (${ev.value}Boxed == null) {
      |  ${ev.isNull} = true;
      |} else {
      |  ${ev.value} = ${ev.value}Boxed.intValue();
      |}
      |""".stripMargin)

  override protected def withNewChildInternal(
      newChild: Expression): HexHighBitsExpression =
    copy(child = newChild)
}

/** Column builder. */
object TextFunctions {
  def wsSplit(c: Column): Column =
    ColumnShim.column(WhitespaceSplitExpression(ColumnShim.expression(c)))
  def wsSplitRows(c: Column, minTokens: Int): Column =
    ColumnShim.column(
      WsSplitRowsExpression(ColumnShim.expression(c), minTokens))
  def hexSliceLong(c: Column, pos: Int, len: Int): Column =
    ColumnShim.column(
      HexSliceLongExpression(ColumnShim.expression(c), pos, len))
  def hexHighBits(c: Column): Column =
    ColumnShim.column(HexHighBitsExpression(ColumnShim.expression(c)))
}
