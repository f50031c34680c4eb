package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.{CdxFunctions, Surt}

class SurtExpressionSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  private val urls = Seq(
    "http://WWW.Example.com/A/",
    "https://site.org:443/p/1?b=2&a=1",
    "http://user@host.net/x#frag",
    "scheme-less.org/path")

  test("native expression matches the Scala canonicalizer on all vectors") {
    val got = urls.toDF("url")
      .select(CdxFunctions.surtCol(col("url"))).as[String].collect().toSeq
    assert(got == urls.map(Surt.surtLenient))
  }

  test("null in → null out") {
    val got = Seq[String](null).toDF("url")
      .select(CdxFunctions.surtCol(col("url"))).collect().head
    assert(got.isNullAt(0))
  }

  test("SQL `surt` resolves via GraftExtensions to the native expression") {
    val r = spark.sql("SELECT surt('http://WWW.Example.com/A/') AS k")
      .as[String].collect().head
    assert(r == "com,example)/a")
    // the plan contains our expression, not a UDF eval boundary
    val plan = spark.sql("SELECT surt(url) FROM VALUES ('http://a.b/') t(url)")
      .queryExecution.executedPlan.toString
    assert(plan.contains("surt") && !plan.contains("BatchEvalPython"))
  }

  test("generated code actually COMPILES (no silent interpreted fallback)") {
    // The `*(1) Project` plan-string check below is necessary but not
    // sufficient: a Janino compile error surfaces only at runtime and
    // Spark falls back to interpreted eval with just a WARN. Compiling
    // the projection through the codegen API throws instead.
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
    import org.apache.spark.sql.types.StringType
    import org.apache.spark.unsafe.types.UTF8String
    val expr = graft.functions.SurtExpression(
      BoundReference(0, StringType, nullable = true))
    val proj = GenerateUnsafeProjection.generate(Seq(expr))
    val out = proj(InternalRow(UTF8String.fromString("http://WWW.Example.com/A/")))
    assert(out.getUTF8String(0).toString == "com,example)/a")
  }

  test("projection with surt stays inside WholeStageCodegen") {
    // range source → a real physical projection (a local Seq would be
    // pre-evaluated by ConvertToLocalRelation, which itself proves the
    // expression is interpretable, but not the codegen span)
    val df = spark.range(100)
      .select(concat(lit("http://WWW.Site"), col("id"), lit(".org/P/")).as("url"))
      .select(CdxFunctions.surtCol(col("url")).as("k"))
    // the "*(n)" prefix marks operators fused into WholeStageCodegen
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [surt("), plan)
    val got = df.as[String].collect().toSet
    assert(got == (0 until 100).map(i => s"org,site$i)/p").toSet)
  }
}
