package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._

/**
 * Native codegen'd vector primitives for the ANN/similarity operators
 * (brief: "a native Catalyst Expression (with doGenCode) beats a Scala
 * UDF"). The declarative formulation — `transform`/`zip_with`/`aggregate`
 * higher-order functions — is INTERPRETED in Spark (each lambda invocation
 * walks an expression tree per element), which makes the dot product the
 * dominant cost of every ANN query. These expressions run the same math as
 * tight JVM loops over primitive arrays and stay inside whole-stage
 * codegen.
 *
 * Numeric fidelity contract: [[QuantizeExpression]] is bit-equal to
 * `transform(vec, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))`
 * (Spark's Round: HALF_UP on the shortest-decimal representation, NaN/Inf
 * passed through the long cast), and [[DotLongExpression]] to
 * `aggregate(zip_with(a, b, (x,y) -> x*y), 0L, (acc,v) -> acc+v)` —
 * including the null-on-length-mismatch behavior zip_with's null padding
 * produces. Pinned by `VectorExpressionsSpec` property tests.
 *
 * One documented divergence (r19 review): past int64 the HOF form under
 * ANSI mode THROWS (ARITHMETIC_OVERFLOW) while these loops wrap — per-
 * element overflow checks would double the hot-loop cost for a regime
 * quantized embeddings never reach (|q| ≈ 10³ ⇒ |dot| ≈ dim·10⁶), and
 * the one consumer that feeds larger magnitudes (KMeans' centroid sum
 * vectors) guards its norms loudly (KMeans.checkedNorms).
 */
case class QuantizeExpression(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"quantize1000 requires ARRAY<FLOAT|DOUBLE>, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType,
    child.dataType.asInstanceOf[ArrayType].containsNull)
  override def prettyName: String = "quantize1000"

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any =
    VectorCodegen.quantize1000(input.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.VectorCodegen.quantize1000($c, $isFloat)")

  override protected def withNewChildInternal(newChild: Expression): QuantizeExpression =
    copy(child = newChild)
}

case class DotLongExpression(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"dotl requires two ARRAY<BIGINT>, got ${l.simpleString}, ${r.simpleString}")
    }

  override def dataType: DataType = LongType
  // null when either input is null, lengths differ, or an element is null
  override def nullable: Boolean = true
  override def prettyName: String = "dotl"

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorCodegen.dotLong(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      |java.lang.Long ${ev.value}Boxed = graft.functions.VectorCodegen.dotLong($a, $b);
      |if (${ev.value}Boxed == null) {
      |  ${ev.isNull} = true;
      |} else {
      |  ${ev.value} = ${ev.value}Boxed.longValue();
      |}
      |""".stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotLongExpression =
    copy(left = newLeft, right = newRight)
}

/**
 * Word k-grams over a string array — native replacement for the
 * interpreted `transform(sequence(0, size-k), i -> concat_ws(' ', ...))`
 * formulation that dominated the map side of every shingle-based operator
 * (MinHash-LSH, n-gram Jaccard, winnowing fingerprint, repetition).
 * Short arrays (< k elements) yield an EMPTY array, matching the staged
 * `when(size >= k, ...)` guard; null elements are skipped by the
 * separator exactly like `concat_ws` (same UTF8String.concatWs call).
 */
case class WordGramsExpression(child: Expression, k: Int)
    extends UnaryExpression {

  require(k >= 1, s"wordGrams k must be >= 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"wordGrams requires ARRAY<STRING>, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_grams"

  override def nullSafeEval(input: Any): Any =
    VectorCodegen.wordGrams(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.VectorCodegen.wordGrams($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): WordGramsExpression =
    copy(child = newChild)
}

/** Product-quantization encode: argmin-distance code per subspace, the
  * whole codebook bundle folded in as ONE reference object. The
  * literal-fold formulation (mSub×kCodes struct/dot/slice
  * sub-expressions) outgrows JIT-able generated code at the q122 shape
  * and runs interpreter-bound — measured ~200 µs/row vs ~1 µs/row for
  * this loop. Semantics are pinned equal to the fold: for each
  * subspace m, code = argmin_c (Σcent² − 2·dot(x_m, cent)), ties →
  * smallest c; subspace m reads q[offset(m) ... offset(m)+subDim). */
case class PqEncodeExpression(child: Expression,
                              codebooks: Seq[Seq[Seq[Long]]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pq_encode requires ARRAY<BIGINT>, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  @transient private lazy val books: Array[Array[Array[Long]]] =
    codebooks.map(_.map(_.toArray).toArray).toArray

  override def nullSafeEval(input: Any): Any =
    VectorCodegen.pqEncode(input.asInstanceOf[ArrayData], books)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val booksRef = ctx.addReferenceObj("pqCodebooks", books, "long[][][]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.VectorCodegen.pqEncode($c, $booksRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncodeExpression =
    copy(child = newChild)
}

/** Static entry points shared by interpreted eval and generated code
  * (deliberately not a companion object — see [[SurtCodegen]]). */
object VectorCodegen {

  /** Tight-loop PQ encode (see [[PqEncodeExpression]]); ragged
    * codebooks address by each book's own subDim. */
  def pqEncode(q: ArrayData, books: Array[Array[Array[Long]]]): ArrayData = {
    val mSub = books.length
    val out = new Array[Int](mSub)
    var off = 0
    var m = 0
    while (m < mSub) {
      val book = books(m)
      val subDim = book(0).length
      require(off + subDim <= q.numElements(),
        s"pq_encode: vector of ${q.numElements()} elements too short " +
          s"for subspace $m at offset $off (subDim $subDim)")
      var best = Long.MaxValue
      var bestC = 0
      var c = 0
      while (c < book.length) {
        val cv = book(c)
        var cent2 = 0L
        var dot = 0L
        var j = 0
        while (j < subDim) {
          val v = cv(j)
          cent2 += v * v
          dot += q.getLong(off + j) * v
          j += 1
        }
        val dist = cent2 - 2L * dot
        if (dist < best) { best = dist; bestC = c } // ties keep smaller c
        c += 1
      }
      out(m) = bestC
      off += subDim
      m += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  private val GramSep = org.apache.spark.unsafe.types.UTF8String.fromString(" ")

  def wordGrams(arr: ArrayData, k: Int): ArrayData = {
    import org.apache.spark.unsafe.types.UTF8String
    val n = arr.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n - k + 1)
    var i = 0
    while (i <= n - k) {
      val parts = new Array[UTF8String](k)
      var j = 0
      while (j < k) {
        parts(j) = if (arr.isNullAt(i + j)) null else arr.getUTF8String(i + j)
        j += 1
      }
      out(i) = UTF8String.concatWs(GramSep, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Spark `CAST(round(d) AS BIGINT)` for DOUBLE: HALF_UP on the
    * shortest-decimal (BigDecimal.valueOf) representation; NaN → 0,
    * ±Inf → Long.Max/MinValue (Java double→long cast semantics). */
  def roundCastLong(d: Double): Long =
    if (java.lang.Double.isNaN(d)) 0L
    else if (java.lang.Double.isInfinite(d)) {
      if (d > 0) Long.MaxValue else Long.MinValue
    } else {
      java.math.BigDecimal.valueOf(d)
        .setScale(0, java.math.RoundingMode.HALF_UP)
        .doubleValue().toLong
    }

  def quantize1000(arr: ArrayData, isFloat: Boolean): ArrayData = {
    val n = arr.numElements()
    var hasNull = false
    var i = 0
    while (i < n && !hasNull) {
      if (arr.isNullAt(i)) hasNull = true
      i += 1
    }
    if (!hasNull) {
      val out = new Array[Long](n)
      i = 0
      while (i < n) {
        val d = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        out(i) = roundCastLong(d * 1000.0)
        i += 1
      }
      UnsafeArrayData.fromPrimitiveArray(out)
    } else {
      // slow path only for arrays with null elements (absent in practice)
      val out = new Array[Any](n)
      i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) {
          val d = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
          out(i) = java.lang.Long.valueOf(roundCastLong(d * 1000.0))
        }
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  def dotLong(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var s = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += a.getLong(i) * b.getLong(i)
      i += 1
    }
    java.lang.Long.valueOf(s)
  }
}

/** Column builders for the vector expressions. */
object VectorFunctions {
  def quantize1000(c: Column): Column =
    ColumnShim.column(QuantizeExpression(ColumnShim.expression(c)))
  def dotl(a: Column, b: Column): Column =
    ColumnShim.column(DotLongExpression(
      ColumnShim.expression(a), ColumnShim.expression(b)))
  def wordGrams(c: Column, k: Int): Column =
    ColumnShim.column(WordGramsExpression(ColumnShim.expression(c), k))
  def pqEncode(c: Column, codebooks: Seq[Seq[Seq[Long]]]): Column =
    ColumnShim.column(PqEncodeExpression(ColumnShim.expression(c), codebooks))
}
