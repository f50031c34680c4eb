package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.llm.AnnOps

class BucketPairsSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  // deterministic mixed-sign vectors, several buckets incl. singletons
  private def emb(n: Int, dim: Int) = {
    val rnd = new scala.util.Random(7)
    (0 until n).map { i =>
      (i.toLong, Array.fill(dim)((rnd.nextInt(2001) - 1000) / 1000.0f).toSeq,
        s"b${i % 4}")
    }.toDF("vec_id", "embedding", "label")
  }

  test("native dot-pair expansion matches the HOF reference formulation") {
    val e = emb(60, 16).where(col("label") =!= "b3")
    val got = AnnOps.withinBucketPairs(e, "vec_id", "embedding", "label",
      minDot = -2000000L).orderBy("vec_a", "vec_b").collect().toSeq
    // reference: independent HOF expansion + post-filter
    val ref = e
      .select(col("label"), struct(col("vec_id").as("id"),
        AnnOps.quantize(col("embedding")).as("q")).as("r"))
      .groupBy("label").agg(sort_array(collect_list(col("r"))).as("rs"))
      .where(size(col("rs")) > 1)
      .select(col("label"), explode(expr(
        """flatten(transform(rs, (a, i) ->
          |  transform(slice(rs, i + 2, size(rs)), b -> struct(
          |    a.id AS vec_a, b.id AS vec_b,
          |    dotl(a.q, b.q) AS dot))))""".stripMargin)).as("p"))
      .select(col("p.vec_a").as("vec_a"), col("p.vec_b").as("vec_b"),
        col("label"), col("p.dot").as("dot"))
      .where(col("dot") >= -2000000L)
      .orderBy("vec_a", "vec_b").collect().toSeq
    assert(got == ref)
    assert(got.nonEmpty)
  }

  test("native cosine-pair expansion matches the SQL CASE/DECIMAL reference") {
    val e = emb(60, 16)
    val minBp = 100L
    val got = AnnOps.withinBucketCosinePairs(e, "vec_id", "embedding",
      "label", minCos2Bp = minBp).orderBy("vec_a", "vec_b").collect().toSeq
    val ref = e
      .select(col("label"), struct(col("vec_id").as("id"),
        AnnOps.quantize(col("embedding")).as("q")).as("r"))
      .select(col("label"), col("r").withField("n2",
        graft.functions.VectorFunctions.dotl(col("r.q"), col("r.q"))).as("r"))
      .groupBy("label").agg(sort_array(collect_list(col("r"))).as("rs"))
      .where(size(col("rs")) > 1)
      .select(col("label"), explode(expr(
        """flatten(transform(rs, (a, i) ->
          |  transform(slice(rs, i + 2, size(rs)), b -> struct(
          |    a.id AS vec_a, b.id AS vec_b, dotl(a.q, b.q) AS dot,
          |    a.n2 AS na2, b.n2 AS nb2))))""".stripMargin)).as("p"))
      .select(col("p.vec_a").as("vec_a"), col("p.vec_b").as("vec_b"),
        col("label"),
        expr("""CASE WHEN p.dot <= 0 OR p.na2 = 0 OR p.nb2 = 0 THEN 0L
               |     ELSE CAST(CAST(p.dot AS DECIMAL(38,0)) * p.dot DIV p.na2
               |          AS DECIMAL(38,0)) * 10000 DIV p.nb2
               |END""".stripMargin).as("cos2_bp"))
      .where(col("cos2_bp") >= minBp)
      .orderBy("vec_a", "vec_b").collect().toSeq
    assert(got == ref)
    assert(got.nonEmpty)
  }

  test("minCos2Bp = 0 keeps zero-score (opposite / zero-norm) pairs") {
    val e = Seq(
      (0L, Seq(1.0f, 0.0f), "b"), (1L, Seq(-1.0f, 0.0f), "b"),
      (2L, Seq(0.0f, 0.0f), "b")).toDF("vec_id", "embedding", "label")
    val got = AnnOps.withinBucketCosinePairs(e, "vec_id", "embedding",
      "label", minCos2Bp = 0L).orderBy("vec_a", "vec_b")
      .select("vec_a", "vec_b", "cos2_bp").as[(Long, Long, Long)]
      .collect().toSeq
    assert(got == Seq((0L, 1L, 0L), (0L, 2L, 0L), (1L, 2L, 0L)))
  }

  test("generated code actually COMPILES (no silent interpreted fallback)") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
    import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    import org.apache.spark.sql.types._
    val memberType = ArrayType(StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("q", ArrayType(LongType, containsNull = false),
        nullable = false))))
    val in = BoundReference(0, memberType, nullable = true)
    val proj = GenerateUnsafeProjection.generate(Seq(
      graft.functions.BucketDotPairsExpression(in, Long.MinValue),
      graft.functions.BucketCosinePairsExpression(in, 0L)))
    def m(id: Long, q: Array[Long]) =
      new GenericInternalRow(Array[Any](id, ArrayData.toArrayData(q)))
    val arr = new GenericArrayData(Array[Any](
      m(1L, Array(1000L, 0L)), m(2L, Array(1000L, 1000L))))
    val out = proj(InternalRow(arr))
    val dots = out.getArray(0)
    assert(dots.numElements() == 1)
    assert(dots.getStruct(0, 3).getLong(2) == 1000000L)
    val cos = out.getArray(1)
    // cos² = dot²/(na2*nb2) = 10^12/(10^6 * 2*10^6) → 5000 bp
    assert(cos.getStruct(0, 3).getLong(2) == 5000L)
  }
}
