package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.Md5Functions

class Md5ExpressionsSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  // unicode, empty, long, hex-edge and numeric-string vectors — the
  // call sites hash both raw tokens and longs cast to strings
  private val vectors = Seq(
    "", "a", "abc", "The quick brown fox", "héllo wörld é中文",
    "1234567890", "-42", "0", "x" * 300,
    "0:deadbeef", "2:ffffffffffff")

  test("md5Hex is byte-identical to built-in md5 on every vector") {
    val df = vectors.toDF("s")
      .select(md5(col("s")).as("builtin"), Md5Functions.md5Hex(col("s")).as("fused"))
    df.collect().foreach(r => assert(r.getString(0) == r.getString(1)))
  }

  test("md5Prefix48 equals conv(substring(md5, 1, 12), 16, 10)") {
    val df = vectors.toDF("s")
      .select(conv(substring(md5(col("s")), 1, 12), 16, 10).cast("long").as("chain"),
        Md5Functions.md5Prefix48(col("s")).as("fused"))
    df.collect().foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("md5Prefix48 on longs-cast-to-string matches the oracle convention") {
    val df = spark.range(0, 1000)
      .select((col("id") * 7919 - 500000).as("v"))
      .select(conv(substring(md5(col("v").cast("string")), 1, 12), 16, 10)
        .cast("long").as("chain"),
        Md5Functions.md5Prefix48(col("v").cast("string")).as("fused"))
    df.collect().foreach(r => assert(r.getLong(0) == r.getLong(1)))
    // range property: non-negative, < 2^48
    val mm = df.agg(min("fused"), max("fused")).collect().head
    assert(mm.getLong(0) >= 0L && mm.getLong(1) < (1L << 48))
  }

  test("null in → null out") {
    val r = Seq[String](null).toDF("s")
      .select(Md5Functions.md5Hex(col("s")), Md5Functions.md5Prefix48(col("s")))
      .collect().head
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("SQL md5_fast / md5_prefix48 resolve via GraftExtensions") {
    val r = spark.sql(
      "SELECT md5_fast('abc') AS h, md5_prefix48('abc') AS p").collect().head
    assert(r.getString(0) == "900150983cd24fb0d6963f7d28e17f72")
    assert(r.getLong(1) == java.lang.Long.parseLong("900150983cd2", 16))
  }

  test("generated code actually COMPILES (no silent interpreted fallback)") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
    import org.apache.spark.sql.types.StringType
    import org.apache.spark.unsafe.types.UTF8String
    val in = BoundReference(0, StringType, nullable = true)
    val proj = GenerateUnsafeProjection.generate(Seq(
      graft.functions.Md5HexExpression(in),
      graft.functions.Md5Prefix48Expression(in)))
    val out = proj(InternalRow(UTF8String.fromString("abc")))
    assert(out.getUTF8String(0).toString == "900150983cd24fb0d6963f7d28e17f72")
    assert(out.getLong(1) == java.lang.Long.parseLong("900150983cd2", 16))
  }
}
