package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * All five Gopher quality metrics in ONE byte walk — the fused native
 * form of the regex/HOF chain in [[graft.operators.llm.TextAnalysis
 * .gopherQuality]]:
 *
 *   n_words   space-split tokens that are nonempty
 *   sum_len   their lengths in code points, summed
 *   n_sym     code points outside [A-Za-z0-9 ] in the whole text
 *   n_alpha   nonempty tokens containing at least one ASCII letter
 *   n_stop    DISTINCT stopwords present as whole tokens
 *
 * The declarative chain evaluated a regexp_replace over the full text,
 * a second regex per word, and two array HOF passes — five scans of
 * every document, regex machinery on two of them; measured as the
 * dominant cost of q83 and the q86 pipeline at sf0.1. This expression
 * reads the UTF-8 bytes once: split on the 0x20 byte (a continuation
 * byte can never alias it), count code points by lead bytes, classify
 * alnum/space as ASCII ranges (any multi-byte code point is a symbol —
 * identical semantics to the `[A-Za-z0-9 ]` character class), and match
 * stopwords by exact byte comparison. Output values are byte-identical
 * to the regex formulation (property-pinned in LlmOpsSpec).
 */
object GopherStatsCodegen {

  /** Stopword list is part of the expression (folded constant). */
  def stats(u: UTF8String, stops: Array[Array[Byte]]): GenericInternalRow = {
    val b = u.getBytes
    val n = b.length
    var nWords = 0L
    var sumLen = 0L
    var nSym = 0L
    var nAlpha = 0L
    val stopSeen = new Array[Boolean](stops.length)
    var wordStart = 0
    var i = 0
    while (i <= n) {
      val atSep = i == n || b(i) == ' '
      if (atSep) {
        val len = i - wordStart
        if (len > 0) {
          nWords += 1
          // code points + letter flag for this word
          var j = wordStart
          var cp = 0L
          var hasLetter = false
          while (j < i) {
            val c = b(j)
            if ((c & 0xc0) != 0x80) cp += 1
            if ((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z'))
              hasLetter = true
            j += 1
          }
          sumLen += cp
          if (hasLetter) nAlpha += 1
          var s = 0
          while (s < stops.length) {
            if (!stopSeen(s) && stops(s).length == len) {
              var k = 0
              var eq = true
              while (eq && k < len) {
                if (b(wordStart + k) != stops(s)(k)) eq = false
                k += 1
              }
              if (eq) stopSeen(s) = true
            }
            s += 1
          }
        }
        wordStart = i + 1
      }
      if (i < n) {
        val c = b(i)
        // a symbol is a code point outside [A-Za-z0-9 ]: ASCII bytes
        // classify directly; a multi-byte code point counts once (its
        // lead byte), continuation bytes never count
        val isLead = (c & 0xc0) != 0x80
        val isAscii = (c & 0x80) == 0
        val plain = isAscii && (c == ' ' ||
          (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
          (c >= '0' && c <= '9'))
        if (isLead && !plain) nSym += 1
      }
      i += 1
    }
    var nStop = 0L
    var s = 0
    while (s < stopSeen.length) { if (stopSeen(s)) nStop += 1; s += 1 }
    new GenericInternalRow(Array[Any](nWords, sumLen, nSym, nAlpha, nStop))
  }
}

case class GopherStatsExpression(child: Expression, stopwords: Seq[String])
    extends UnaryExpression {
  require(stopwords.forall(s => s.nonEmpty && s.forall(_ < 128)),
    "stopwords must be nonempty ASCII tokens")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"gopher_stats requires STRING, got ${t.simpleString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("sum_len", LongType, nullable = false),
    StructField("n_sym", LongType, nullable = false),
    StructField("n_alpha", LongType, nullable = false),
    StructField("n_stop", LongType, nullable = false)))
  override def prettyName: String = "gopher_stats"

  @transient private lazy val stopBytes: Array[Array[Byte]] =
    stopwords.map(_.getBytes("US-ASCII")).toArray

  override def nullSafeEval(input: Any): Any =
    GopherStatsCodegen.stats(input.asInstanceOf[UTF8String], stopBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val stopsRef = ctx.addReferenceObj("gopherStops", stopBytes,
      "byte[][]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.GopherStatsCodegen.stats($c, $stopsRef)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): GopherStatsExpression = copy(child = newChild)
}

object GopherStatsFunctions {
  def gopherStats(text: Column, stopwords: Seq[String]): Column =
    ColumnShim.column(
      GopherStatsExpression(ColumnShim.expression(text), stopwords))
}
