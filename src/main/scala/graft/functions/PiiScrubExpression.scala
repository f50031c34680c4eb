package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Fused PII scrub: ONE evaluation per row producing
 * `struct<clean: string, n_emails: int, n_numbers: int>`, replacing the
 * previous plan's four independent regex evaluations over the same
 * column (two `regexp_replace` passes for the scrub + two
 * `regexp_extract_all` passes for the counts — see q47's round-8 shape,
 * SparkEntry "q47_pii_scrub").
 *
 * Semantics are EXACTLY the composed built-ins:
 *   clean     = regexp_replace(regexp_replace(text, EMAIL, "<EMAIL>"),
 *                              NUM, "<NUM>")
 *   n_emails  = size(regexp_extract_all(text, EMAIL))
 *   n_numbers = size(regexp_extract_all(text, NUM))   -- over the ORIGINAL
 *                                                        text, incl. digits
 *                                                        inside emails
 * with EMAIL = [a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,} and
 * NUM = [0-9]{6,}.
 *
 * Why the fusion is sound:
 *  - `<EMAIL>` contains no digits, so a digit run in the email-scrubbed
 *    text can never cross a replacement token; replacing 6+ digit runs
 *    inside each inter-email gap of the ORIGINAL text is therefore
 *    byte-identical to running the NUM replace on the scrubbed text.
 *  - The regex engine's leftmost-match rule means the character before
 *    an email match can never be local-part-eligible (it would have
 *    started the match earlier), so gaps never end in a digit adjacent
 *    to a match — gap-local digit runs are maximal runs.
 *  - `[0-9]{6,}` on maximal-munch engines matches each maximal digit
 *    run of length >= 6 exactly once, so counting runs in a single char
 *    scan equals counting regex matches.
 * Net per-row cost: one email matcher pass + one char scan + one output
 * build, vs four full regex passes and three intermediate strings.
 *
 * Patterns stay restricted to character classes + counted quantifiers
 * (identical semantics in Java regex and RE2-family engines) so the
 * DuckDB oracle replays them unchanged.
 */
case class PiiScrubExpression(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pii_scrub_all requires STRING, got ${t.simpleString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("clean", StringType, nullable = false),
    StructField("n_emails", IntegerType, nullable = false),
    StructField("n_numbers", IntegerType, nullable = false)))

  override def prettyName: String = "pii_scrub_all"

  override def nullSafeEval(input: Any): Any =
    PiiScrubCodegen.scrubAll(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.PiiScrubCodegen.scrubAll($c)")

  override protected def withNewChildInternal(
      newChild: Expression): PiiScrubExpression = copy(child = newChild)
}

/** Static entry point shared by interpreted eval and generated code. */
object PiiScrubCodegen {

  /** Same pattern strings as graft.operators.llm.TextAnalysis — defined
    * here (functions is the lower layer) and aliased there. */
  val EmailPattern = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  val NumberPattern = "[0-9]{6,}"

  private val Email = Pattern.compile(EmailPattern)

  private final val EmailToken = "<EMAIL>"
  private final val NumToken = "<NUM>"

  def scrubAll(s: UTF8String): InternalRow = {
    val str = s.toString
    val len = str.length

    // n_numbers: maximal digit runs >= 6 over the ORIGINAL text — a
    // single char scan, no regex (see soundness note on the expression).
    var nNumbers = 0
    var i = 0
    while (i < len) {
      if (isDigit(str.charAt(i))) {
        var j = i + 1
        while (j < len && isDigit(str.charAt(j))) j += 1
        if (j - i >= 6) nNumbers += 1
        i = j
      } else i += 1
    }

    // Email pass builds `clean` directly: email spans -> <EMAIL>, and the
    // gaps between them get their 6+ digit runs -> <NUM> inline.
    val sb = new java.lang.StringBuilder(len)
    val m = Email.matcher(str)
    var nEmails = 0
    var last = 0
    while (m.find()) {
      nEmails += 1
      appendGapScrubbed(sb, str, last, m.start())
      sb.append(EmailToken)
      last = m.end()
    }
    appendGapScrubbed(sb, str, last, len)

    new GenericInternalRow(Array[Any](
      UTF8String.fromString(sb.toString),
      Integer.valueOf(nEmails), Integer.valueOf(nNumbers)))
  }

  @inline private def isDigit(c: Char): Boolean = c >= '0' && c <= '9'

  private def appendGapScrubbed(sb: java.lang.StringBuilder, str: String,
                                from: Int, until: Int): Unit = {
    var i = from
    while (i < until) {
      val c = str.charAt(i)
      if (isDigit(c)) {
        var j = i + 1
        while (j < until && isDigit(str.charAt(j))) j += 1
        if (j - i >= 6) sb.append(NumToken) else sb.append(str, i, j)
        i = j
      } else {
        sb.append(c)
        i += 1
      }
    }
  }
}

object PiiScrubFunctions {
  /** `struct(clean, n_emails, n_numbers)` — one pass per row. */
  def piiScrubAll(c: Column): Column =
    ColumnShim.column(PiiScrubExpression(ColumnShim.expression(c)))
}
