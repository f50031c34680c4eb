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
  }
}
