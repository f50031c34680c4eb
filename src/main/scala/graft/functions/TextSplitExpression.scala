package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._

/**
 * Native crawl-log tokenizer: semantics of
 * `split(trim(regexp_replace(line, "\r$", "")), "\\s+")` — strip ONE
 * trailing CR (CrawlLogLoader.java:44-46), trim edge whitespace, split on
 * runs of Java `\s` ([ \t\n\x0B\f\r]) — as a single regex-free byte scan.
 *
 * The declarative formulation runs two regex passes per line and was the
 * dominant cost of the crawl-log parse; every `\s` byte is ASCII, and
 * ASCII bytes never occur inside a multi-byte UTF-8 sequence, so a byte
 * scan is exact on any input. An all-whitespace line yields `[""]`
 * (Spark's `split("", pat)` shape), which the >= 12-token filter drops.
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

/** Static entry point shared by interpreted eval and generated code. */
object TextSplitCodegen {

  import org.apache.spark.unsafe.types.UTF8String

  @inline private def isWs(b: Byte): Boolean =
    b == ' ' || (b >= 0x09 && b <= 0x0d)

  def wsSplit(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    var end = bytes.length
    // one trailing CR (the "\r$" replace), then Java-trim (chars <= 0x20)
    if (end > 0 && bytes(end - 1) == '\r') end -= 1
    var start = 0
    while (start < end && (bytes(start) & 0xff) <= 0x20) start += 1
    while (end > start && (bytes(end - 1) & 0xff) <= 0x20) end -= 1
    if (start == end)
      return new GenericArrayData(Array[Any](UTF8String.EMPTY_UTF8))
    // pass 1: count tokens (runs of non-\s bytes; edges are non-\s)
    var n = 1
    var i = start
    var inWs = false
    while (i < end) {
      val ws = isWs(bytes(i))
      if (ws && !inWs) n += 1
      inWs = ws
      i += 1
    }
    // pass 2: fill
    val out = new Array[Any](n)
    var k = 0
    i = start
    var tokStart = start
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
}

/** Column builder. */
object TextFunctions {
  def wsSplit(c: Column): Column =
    ColumnShim.column(WhitespaceSplitExpression(ColumnShim.expression(c)))
}
