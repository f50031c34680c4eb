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
  }
}
