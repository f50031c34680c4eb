package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{VectorCodegen, VectorFunctions}

/** Fidelity pin for the native vector expressions: bit-equal to the
  * interpreted higher-order-function formulations they replaced (which the
  * DuckDB oracle reproduces independently). Deterministic seed — failures
  * reproduce. */
class VectorExpressionsSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private def hofQuantize = (vec: org.apache.spark.sql.Column) =>
    transform(vec, x => round(x.cast("double") * 1000).cast("long"))
  private def hofDot = (a: org.apache.spark.sql.Column,
                        b: org.apache.spark.sql.Column) =>
    aggregate(zip_with(a, b, _ * _), lit(0L), _ + _)

  test("SQL surface: ws_split / hex_slice_long / hex_high_bits resolve natively") {
    // Java split("\\s+") parity: leading whitespace yields one empty
    // token, trailing whitespace yields none
    assert(spark.sql("SELECT ws_split('  a\tb  c ') AS t")
      .collect()(0).getSeq[String](0) == Seq("", "a", "b", "c"))
    assert(spark.sql("SELECT hex_slice_long('00ff', 2, 2) AS v")
      .collect()(0).getLong(0) == 255L)
    def md5Hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    assert(spark.sql("SELECT hex_slice_long(md5('x'), 0, 10) AS v")
      .collect()(0).getLong(0) ==
      java.lang.Long.parseLong(md5Hex("x").take(10), 16))
    // geometry must be literal — a column there is a planning-time error
    intercept[Exception] {
      spark.sql("SELECT hex_slice_long('00', CAST(rand()*2 AS INT), 1)").collect()
    }
    val mask = spark.sql("SELECT hex_high_bits(md5('x')) AS m")
      .collect()(0).getInt(0)
    val hex = md5Hex("x")
    val expected = (0 until 32).map { j =>
      if (Integer.parseInt(hex.charAt(j).toString, 16) >= 8) 1 << j else 0
    }.sum
    assert(mask == expected)
  }

  test("quantize1000 matches the round(x*1000) HOF on random floats") {
    val rnd = new scala.util.Random(7)
    val vecs = (0 until 200).map { _ =>
      Array.fill(16)((rnd.nextFloat() - 0.5f) * 4f)
    } :+ Array(0.0005f, -0.0005f, 0.0015f, -0.0015f, 0.5f, -0.5f, 1.5f,
      -1.5f, 0f, 1f) :+ Array.empty[Float]
    val df = vecs.toDF("v")
    val out = df.select(
      VectorFunctions.quantize1000(col("v")).as("native"),
      hofQuantize(col("v")).as("hof")).collect()
    out.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1))
    }
  }

  test("dotl matches the aggregate(zip_with) HOF incl. length mismatch") {
    val rnd = new scala.util.Random(11)
    val rows = (0 until 200).map { i =>
      val n = 1 + rnd.nextInt(24)
      val m = if (i % 17 == 0) n + 1 else n // sprinkle mismatched lengths
      (Array.fill(n)(rnd.nextLong() % 100000L),
        Array.fill(m)(rnd.nextLong() % 100000L))
    } :+ ((Array.empty[Long], Array.empty[Long]))
    val df = rows.toDF("a", "b")
    val out = df.select(
      VectorFunctions.dotl(col("a"), col("b")).as("native"),
      hofDot(col("a"), col("b")).as("hof")).collect()
    out.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1),
        s"null disagreement: ${r.isNullAt(0)} vs ${r.isNullAt(1)}")
      if (!r.isNullAt(0)) assert(r.getLong(0) == r.getLong(1))
    }
  }

  test("roundCastLong matches Spark round semantics on specials") {
    // NaN / ±Inf follow the double->long cast; halves round HALF_UP on
    // the shortest-decimal representation (BigDecimal.valueOf)
    assert(VectorCodegen.roundCastLong(Double.NaN) == 0L)
    assert(VectorCodegen.roundCastLong(Double.PositiveInfinity) == Long.MaxValue)
    assert(VectorCodegen.roundCastLong(Double.NegativeInfinity) == Long.MinValue)
    assert(VectorCodegen.roundCastLong(2.5) == 3L)
    assert(VectorCodegen.roundCastLong(-2.5) == -3L)
    assert(VectorCodegen.roundCastLong(0.49999999999999994) == 0L)
  }

  test("wordGrams matches the transform(sequence)/concat_ws HOF") {
    def hofGrams(wordsCol: org.apache.spark.sql.Column, k: Int) =
      when(size(wordsCol) >= k,
        transform(sequence(lit(0), size(wordsCol) - k), i =>
          concat_ws(" ", (0 until k).map(j =>
            element_at(wordsCol, i + j + 1)): _*)))
        .otherwise(array().cast("array<string>"))
    val rnd = new scala.util.Random(3)
    val rows = (0 until 100).map { _ =>
      Array.fill(rnd.nextInt(12))("w" + rnd.nextInt(5))
    } :+ Array.empty[String] :+ Array("solo")
    val df = rows.toDF("w")
    for (k <- Seq(1, 2, 3, 4)) {
      val out = df.select(
        VectorFunctions.wordGrams(col("w"), k).as("native"),
        hofGrams(col("w"), k).as("hof")).collect()
      out.foreach { r =>
        assert(r.getSeq[String](0) == r.getSeq[String](1), s"k=$k")
      }
    }
  }

  test("wsSplit is byte-exact to the reference Java split on adversarial lines") {
    val rnd = new scala.util.Random(13)
    val alphabet = "ab \t\r\f\u00e9\u2014"
    val lines = (0 until 300).map { _ =>
      (0 until rnd.nextInt(30)).map(_ =>
        alphabet(rnd.nextInt(alphabet.length))).mkString
    } ++ Seq("", " ", "\r", "a\r", "a b", " a  b\t c \r", "\t\t",
      "\u00e9 \u00fc\u2014x")
    // the reference behavior (CrawlLogLoader.java:44-60): strip ONE
    // trailing CR, then Java String.split("\\s+") - leading empty token
    // kept, trailing empties dropped
    def javaRef(l: String): Seq[String] = {
      val s = if (l.nonEmpty && l.last == '\r') l.dropRight(1) else l
      s.split("\\s+").toSeq match { case Seq() => Seq(""); case t => t }
    }
    val got = lines.toDF("line")
      .select(graft.functions.TextFunctions.wsSplit(col("line")).as("native"))
      .collect().map(_.getSeq[String](0))
    lines.zip(got).foreach { case (l, n) =>
      assert(n == javaRef(l), s"line=[${l.map(_.toInt).mkString(",")}]")
    }
  }

  test("wsSplitRows: explode drops short lines, keeps the exact wsSplit " +
      "token array; CrawlLog.fromLines parses the generator shape") {
    val lines = Seq(
      "a b c",                                        // < 12 → dropped
      (1 to 12).map("t" + _).mkString(" "),           // exactly 12 kept
      " lead " + (1 to 11).map("t" + _).mkString(" "),// leading empty counts
      "")                                             // [""] → dropped
    val out = lines.toDF("line")
      .select(explode(graft.functions.TextFunctions
        .wsSplitRows(col("line"), 12)).as("toks"))
      .collect().map(_.getSeq[String](0))
    assert(out.length == 2)
    assert(out(0) == (1 to 12).map("t" + _))
    assert(out(1) == "" +: "lead" +: (1 to 11).map("t" + _))
    // end-to-end parse semantics: '-' size → -1, digits pass, col-8
    // start+duration split, '-' col-8 → both null
    val logs = Seq(
      "2012-01-03T08:45:08Z 200 561 http://a/ P - text/html #1 20120103084508+120 sha1:X - -",
      "2012-01-03T08:45:09Z 404 - http://b/ P - text/html #2 - sha1:Y - -",
      "short line")
    val parsed = graft.model.CrawlLog.fromLines(logs.toDF("line"))
      .select("status", "size", "fetch_start", "fetch_duration")
      .collect()
    assert(parsed.length == 2)
    assert(parsed(0).getInt(0) == 200 && parsed(0).getLong(1) == 561L &&
      parsed(0).getString(2) == "20120103084508" &&
      parsed(0).getString(3) == "120")
    assert(parsed(1).getInt(0) == 404 && parsed(1).getLong(1) == -1L &&
      parsed(1).isNullAt(2) && parsed(1).isNullAt(3))
  }

  test("hexSliceLong matches conv(substring) incl. bad chars and short input") {
    val rnd = new scala.util.Random(17)
    val hexish = "0123456789abcdefABCDEFxy"
    val rows = (0 until 300).map { _ =>
      (0 until rnd.nextInt(24)).map(_ => hexish(rnd.nextInt(hexish.length))).mkString
    } ++ Seq("", "ffffffffff", "0000000000", "123456789a")
    val df = rows.toDF("s")
    val out = df.select(
      graft.functions.TextFunctions.hexSliceLong(col("s"), 2, 10).as("native"),
      // reference: conv() parses garbage leniently, so gate it on a
      // strict hex + length check the native expression applies itself
      when(substring(col("s"), 3, 10).rlike("^[0-9a-fA-F]{10}$"),
        expr("CAST(conv(substring(s, 3, 10), 16, 10) AS BIGINT)"))
        .as("ref")).collect()
    out.foreach { r =>
      val n = if (r.isNullAt(0)) null else r.getLong(0)
      val f = if (r.isNullAt(1)) null else r.getLong(1)
      assert(n == f, r.toString)
    }
  }

  test("hexHighBits matches the per-nibble substring votes on md5 output") {
    val rnd = new scala.util.Random(19)
    val words = (0 until 200).map(_ => "w" + rnd.nextInt(100000))
    val df = words.toDF("w").select(md5(col("w")).as("h"))
    val out = df.select(
      graft.functions.TextFunctions.hexHighBits(col("h")).as("mask"),
      array((0 until 32).map(j =>
        when(substring(col("h"), j + 1, 1) > "7", 1).otherwise(0)): _*)
        .as("ref")).collect()
    out.foreach { r =>
      val mask = r.getInt(0)
      val ref = r.getSeq[Int](1)
      (0 until 32).foreach { j =>
        assert(((mask >> j) & 1) == ref(j), s"bit $j")
      }
    }
    // short / non-hex input → NULL
    val bad = Seq("abc", "zz" * 16).toDF("h")
      .select(graft.functions.TextFunctions.hexHighBits(col("h"))).collect()
    assert(bad.forall(_.isNullAt(0)))
  }

  test("SQL dotl/quantize1000 resolve via GraftExtensions") {
    val r = spark.sql(
      "SELECT dotl(quantize1000(array(CAST(0.001 AS FLOAT), CAST(-0.002 AS FLOAT))), " +
        "array(2L, 3L)) AS d").collect()(0).getLong(0)
    assert(r == (1L * 2L + -2L * 3L))
  }
}
