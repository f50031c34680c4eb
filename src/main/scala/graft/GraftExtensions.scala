package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/**
 * Engine extensions, enabled with
 * `.config("spark.sql.extensions", "graft.GraftExtensions")`:
 * registers the native `surt(url)` expression so SQL and `expr(...)`
 * call sites get the codegen'd canonicalizer instead of a UDF.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("surt"),
      new ExpressionInfo(classOf[graft.functions.SurtExpression].getName,
        null, "surt", "surt(url) - SURT-canonicalize a URL", ""),
      (children: Seq[Expression]) => {
        // surplus args must not silently drop; zero args must not throw a
        // bare NoSuchElementException from Seq.head
        require(children.length == 1,
          s"surt expects exactly 1 argument, got ${children.length}")
        graft.functions.SurtExpression(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("quantize1000"),
      new ExpressionInfo(classOf[graft.functions.QuantizeExpression].getName,
        null, "quantize1000",
        "quantize1000(vec) - ARRAY<FLOAT|DOUBLE> -> ARRAY<BIGINT>, round(x*1000)", ""),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          s"quantize1000 expects exactly 1 argument, got ${children.length}")
        graft.functions.QuantizeExpression(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("dotl"),
      new ExpressionInfo(classOf[graft.functions.DotLongExpression].getName,
        null, "dotl", "dotl(a, b) - integer inner product of two ARRAY<BIGINT>", ""),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"dotl expects exactly 2 arguments, got ${children.length}")
        graft.functions.DotLongExpression(children(0), children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("ws_split"),
      new ExpressionInfo(
        classOf[graft.functions.WhitespaceSplitExpression].getName,
        null, "ws_split",
        "ws_split(s) - split on whitespace runs, Java split(\"\\\\s+\") " +
          "parity (leading whitespace -> one empty token, trailing -> none)", ""),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          s"ws_split expects exactly 1 argument, got ${children.length}")
        graft.functions.WhitespaceSplitExpression(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("hex_slice_long"),
      new ExpressionInfo(
        classOf[graft.functions.HexSliceLongExpression].getName,
        null, "hex_slice_long",
        "hex_slice_long(s, pos, len) - parse len hex BYTES at 0-based " +
          "byte pos as BIGINT (ASCII input; NULL out of range / non-hex)", ""),
      (children: Seq[Expression]) => {
        require(children.length == 3,
          s"hex_slice_long expects exactly 3 arguments, got ${children.length}")
        graft.functions.HexSliceLongExpression(children.head,
          intLiteral(children(1), "pos"), intLiteral(children(2), "len"))
      }))
    ext.injectFunction((
      FunctionIdentifier("hex_high_bits"),
      new ExpressionInfo(
        classOf[graft.functions.HexHighBitsExpression].getName,
        null, "hex_high_bits",
        "hex_high_bits(s) - INT mask of the high bits of 32 hex chars " +
          "(the SimHash vote vector of an md5)", ""),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          s"hex_high_bits expects exactly 1 argument, got ${children.length}")
        graft.functions.HexHighBitsExpression(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("md5_fast"),
      new ExpressionInfo(
        classOf[graft.functions.Md5HexExpression].getName,
        null, "md5_fast",
        "md5_fast(s) - md5 hex digest, byte-identical to md5(s) on " +
          "STRING input, without the per-row digest/hex allocations", ""),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          s"md5_fast expects exactly 1 argument, got ${children.length}")
        graft.functions.Md5HexExpression(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("md5_prefix48"),
      new ExpressionInfo(
        classOf[graft.functions.Md5Prefix48Expression].getName,
        null, "md5_prefix48",
        "md5_prefix48(s) - conv(substring(md5(s), 1, 12), 16, 10) fused " +
          "to one LONG-typed native call (the sketch-hash hot path)", ""),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          s"md5_prefix48 expects exactly 1 argument, got ${children.length}")
        graft.functions.Md5Prefix48Expression(children.head)
      }))
  }

  /** The slice geometry is part of the expression (codegen'd constants),
    * so SQL call sites must pass INT literals. */
  private def intLiteral(e: Expression, name: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(
        v: java.lang.Integer, _) => v.intValue()
    case other => throw new IllegalArgumentException(
      s"$name must be an INT literal, got $other")
  }
}
