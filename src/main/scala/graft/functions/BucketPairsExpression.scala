package graft.functions

import java.math.BigInteger

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._

/**
 * In-bucket pair expansion as a NATIVE expression family — the hot loop
 * of the bucketed near-dup operators ([[graft.operators.llm.AnnOps
 * .withinBucketPairs]] / `withinBucketCosinePairs`, q36/q70/q81).
 *
 * The higher-order-function formulation (`transform(rs, (a, i) ->
 * transform(slice(rs, i + 2, ...), b -> struct(..., dotl(a.q, b.q))))`)
 * evaluates its lambdas INTERPRETED, allocates a slice per outer
 * element and a struct per candidate pair, and leaves thresholding to a
 * post-explode filter — measured as the dominant cost of q81 at sf0.1
 * (~0.3 s of interpreted per-pair overhead on ~250k pairs). These
 * expressions run the n² loop in one static call: member ids/vectors
 * are extracted once per bucket, the dot (and, for the cosine form, the
 * two norms — computed once per MEMBER, not per pair) stays in
 * primitive longs, and the threshold is applied before any output
 * allocation, so sub-threshold pairs cost two longs of arithmetic and
 * zero allocation.
 *
 * Input: `array<struct<id: bigint, q: array<bigint>>>` — the bucket's
 * sorted member list (sort_array on struct(id, q) orders by the unique
 * id). Pairs are emitted with i < j, so vec_a < vec_b, in the same
 * order as the HOF expansion.
 *
 * The cosine form reproduces the integer-exact score of the SQL
 * formulation bit for bit: `((dot² DIV na2) * 10000) DIV nb2` with
 * dot² in 128-bit (BigInteger — the DECIMAL(38,0) widening), 0 for
 * non-positive dots or zero norms, truncation at each step matching
 * the HUGEINT oracle.
 */
object BucketPairsCodegen {

  private def dot(a: Array[Long], b: Array[Long]): Long = {
    var s = 0L
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { s += a(i) * b(i); i += 1 }
    s
  }

  private def memberIds(arr: ArrayData): Array[Long] = {
    val n = arr.numElements()
    val ids = new Array[Long](n)
    var i = 0
    while (i < n) { ids(i) = arr.getStruct(i, 2).getLong(0); i += 1 }
    ids
  }

  private def memberVecs(arr: ArrayData): Array[Array[Long]] = {
    val n = arr.numElements()
    val qs = new Array[Array[Long]](n)
    var i = 0
    while (i < n) { qs(i) = arr.getStruct(i, 2).getArray(1).toLongArray(); i += 1 }
    qs
  }

  /** (vec_a, vec_b, dot) for every i<j pair with dot >= minDot. */
  def dotPairs(arr: ArrayData, minDot: Long): ArrayData = {
    val ids = memberIds(arr)
    val qs = memberVecs(arr)
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    while (i < ids.length) {
      var j = i + 1
      while (j < ids.length) {
        val d = dot(qs(i), qs(j))
        if (d >= minDot)
          out += new GenericInternalRow(Array[Any](ids(i), ids(j), d))
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  private val TenThousand = BigInteger.valueOf(10000L)

  /** Integer-exact squared cosine in bp: ((dot² DIV na2) * 10000) DIV
    * nb2; 0 for non-positive dot or zero norms. */
  def cos2Bp(d: Long, na2: Long, nb2: Long): Long =
    if (d <= 0L || na2 == 0L || nb2 == 0L) 0L
    else {
      val dd = BigInteger.valueOf(d)
      dd.multiply(dd).divide(BigInteger.valueOf(na2))
        .multiply(TenThousand).divide(BigInteger.valueOf(nb2))
        .longValueExact()
    }

  /** (vec_a, vec_b, cos2_bp) for every i<j pair with cos2_bp >=
    * minCos2Bp; norms computed once per member. */
  def cosinePairs(arr: ArrayData, minCos2Bp: Long): ArrayData = {
    val ids = memberIds(arr)
    val qs = memberVecs(arr)
    val n2 = qs.map(q => dot(q, q))
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    while (i < ids.length) {
      var j = i + 1
      while (j < ids.length) {
        val score = cos2Bp(dot(qs(i), qs(j)), n2(i), n2(j))
        if (score >= minCos2Bp)
          out += new GenericInternalRow(Array[Any](ids(i), ids(j), score))
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

sealed abstract class BucketPairsBase extends UnaryExpression {
  protected def scoreField: String

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(Array(
        StructField(_, LongType, _, _),
        StructField(_, ArrayType(LongType, _), _, _))), _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<STRUCT<BIGINT, ARRAY<BIGINT>>>, " +
        s"got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("vec_a", LongType, nullable = false),
    StructField("vec_b", LongType, nullable = false),
    StructField(scoreField, LongType, nullable = false))),
    containsNull = false)
}

case class BucketDotPairsExpression(child: Expression, minDot: Long)
    extends BucketPairsBase {
  override protected def scoreField: String = "dot"
  override def prettyName: String = "bucket_dot_pairs"

  override def nullSafeEval(input: Any): Any =
    BucketPairsCodegen.dotPairs(input.asInstanceOf[ArrayData], minDot)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.BucketPairsCodegen.dotPairs($c, ${minDot}L)")

  override protected def withNewChildInternal(
      newChild: Expression): BucketDotPairsExpression = copy(child = newChild)
}

case class BucketCosinePairsExpression(child: Expression, minCos2Bp: Long)
    extends BucketPairsBase {
  override protected def scoreField: String = "cos2_bp"
  override def prettyName: String = "bucket_cosine_pairs"

  override def nullSafeEval(input: Any): Any =
    BucketPairsCodegen.cosinePairs(input.asInstanceOf[ArrayData], minCos2Bp)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.BucketPairsCodegen.cosinePairs($c, ${minCos2Bp}L)")

  override protected def withNewChildInternal(
      newChild: Expression): BucketCosinePairsExpression = copy(child = newChild)
}

object BucketPairsFunctions {
  def dotPairs(rs: Column, minDot: Long): Column =
    ColumnShim.column(BucketDotPairsExpression(ColumnShim.expression(rs), minDot))
  def cosinePairs(rs: Column, minCos2Bp: Long): Column =
    ColumnShim.column(BucketCosinePairsExpression(ColumnShim.expression(rs), minCos2Bp))
}
