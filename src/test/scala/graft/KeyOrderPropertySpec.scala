package graft

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.util.KeyOrder

/**
 * Property pin of THE key ordering (SURVEY §7 risk 4; VERDICT r19
 * "Next round" #4): every prune, merge, boundary and bisection decision
 * in the engine rests on [[KeyOrder]] agreeing with UTF-8 byte order —
 * which is what Spark's UTF8String, DuckDB VARCHAR, sort(1) and Hadoop
 * Text all compare. Until r20 this was pinned only by case checks; here
 * ScalaCheck drives WELL-FORMED strings dense in the danger zone
 * (surrogate-boundary BMP points U+D7FF/U+E000, supplementary-plane
 * pairs, prefix relationships) and asserts, for every generated pair:
 *
 *   sign(KeyOrder.compare) == sign(UTF8String byte compare)
 *                          == sign(brute-force unsigned UTF-8 bytes)
 *   and, on BMP-only strings, == sign(String.compareTo).
 *
 * Mutation witness: plain java.lang.String ordering DISAGREES with byte
 * order exactly on supplementary-vs-[U+E000,U+FFFF] pairs — asserted on
 * a concrete witness, so reverting KeyOrder to String.compareTo fails
 * this spec loudly (the reference's own Java-side binary searches had
 * that inconsistency; KeyOrder.scala header).
 */
class KeyOrderPropertySpec extends AnyFunSuite {

  // ---- generators -----------------------------------------------------

  /** Code points dense where orderings can disagree: ASCII, the CDX
    * alphabet, Latin-1, the BMP points flanking the surrogate range,
    * high BMP, and supplementary planes (emitted as surrogate pairs). */
  private val codePoint: Gen[Int] = Gen.frequency(
    4 -> Gen.chooseNum(0x20, 0x7E),                // ASCII (urlkeys)
    2 -> Gen.oneOf(',', ')', '/', ' ', '-', '~').map(_.toInt),
    1 -> Gen.chooseNum(0xA0, 0x2FF),               // Latin-1 / IPA
    2 -> Gen.oneOf(0xD7FF, 0xE000, 0xE001, 0xFFFD, 0xFFFF),
    1 -> Gen.chooseNum(0x4E00, 0x9FFF),            // CJK
    3 -> Gen.oneOf(0x10000, 0x10001, 0x1F600, 0x20000, 0x10FFFF),
    1 -> Gen.chooseNum(0x10000, 0x10FFFF))         // any supplementary

  private val wellFormed: Gen[String] =
    Gen.chooseNum(0, 8).flatMap(n => Gen.listOfN(n, codePoint))
      .map(_.flatMap(Character.toChars(_).toSeq).mkString)

  /** Pairs biased toward prefix relationships and near-misses — the
    * boundary shapes bisection and pruning actually probe. */
  private val pair: Gen[(String, String)] = for {
    a <- wellFormed
    mode <- Gen.chooseNum(0, 3)
    b <- mode match {
      case 0 => wellFormed                          // independent
      case 1 => Gen.const(a)                        // equal
      case 2 => codePoint.map(cp =>                 // a is a prefix of b
        a + new String(Character.toChars(cp)))
      case _ => codePoint.map(cp =>                 // differ in last cp
        (if (a.isEmpty) "" else a.substring(0, a.length - 1)) +
          new String(Character.toChars(cp)))
    }
  } yield (a, b)

  private def sample[A](g: Gen[A], seed: Long): A =
    Iterator.from(0)
      .map(i => g.apply(Gen.Parameters.default,
        org.scalacheck.rng.Seed(seed + i * 7919L)))
      .collectFirst { case Some(a) => a }.get

  // ---- independent references ----------------------------------------

  /** Brute force: unsigned lexicographic compare of the UTF-8 bytes. */
  private def utf8ByteCompare(a: String, b: String): Int = {
    val x = a.getBytes(UTF_8)
    val y = b.getBytes(UTF_8)
    val lim = math.min(x.length, y.length)
    var i = 0
    while (i < lim) {
      val d = (x(i) & 0xff) - (y(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    x.length - y.length
  }

  private def sign(i: Int): Int = Integer.signum(i)

  // ---- properties ------------------------------------------------------

  test("KeyOrder == UTF8String binary order == brute-force UTF-8 bytes " +
      "on 4000 generated pairs (surrogate-dense, prefix-biased)") {
    (0 until 4000).foreach { i =>
      val (a, b) = sample(pair, 0xC0FFEE + i.toLong)
      val ko = sign(KeyOrder.compare(a, b))
      val u8 = sign(UTF8String.fromString(a).compareTo(UTF8String.fromString(b)))
      val bf = sign(utf8ByteCompare(a, b))
      assert(ko == u8 && u8 == bf,
        s"divergence on ${a.map(c => "%04x".format(c.toInt)).mkString("+")} vs " +
          s"${b.map(c => "%04x".format(c.toInt)).mkString("+")}: ko=$ko u8=$u8 bf=$bf")
      // total-order sanity on the same pair
      assert(sign(KeyOrder.compare(b, a)) == -ko)
      assert((ko == 0) == (a == b))
    }
  }

  test("on BMP-only strings KeyOrder agrees with java.lang.String") {
    val bmpPoint = Gen.frequency(
      6 -> Gen.chooseNum(0x20, 0x7E),
      1 -> Gen.oneOf(0xD7FF, 0xE000, 0xFFFD, 0xFFFF),
      1 -> Gen.chooseNum(0xA0, 0x9FFF))
    val bmp = Gen.chooseNum(0, 8).flatMap(n => Gen.listOfN(n, bmpPoint))
      .map(_.map(_.toChar).mkString)
    (0 until 2000).foreach { i =>
      val a = sample(bmp, 0xBEEF + i.toLong * 2)
      val b = sample(bmp, 0xBEEF + i.toLong * 2 + 1)
      assert(sign(KeyOrder.compare(a, b)) == sign(a.compareTo(b)),
        s"BMP divergence on '$a' vs '$b'")
    }
  }

  test("MUTATION WITNESS: java.lang.String ordering disagrees with byte " +
      "order on supplementary vs U+E000 — the class KeyOrder exists for") {
    val supplementary = new String(Character.toChars(0x10000)) // D800 DC00
    val privateUse = "\uE000"
    // byte order: supplementary (F0 90 80 80) > U+E000 (EE 80 80)
    assert(utf8ByteCompare(supplementary, privateUse) > 0)
    assert(KeyOrder.compare(supplementary, privateUse) > 0)
    assert(UTF8String.fromString(supplementary)
      .compareTo(UTF8String.fromString(privateUse)) > 0)
    // but UTF-16 code units: D800 < E000 — String sorts them REVERSED
    assert(supplementary.compareTo(privateUse) < 0,
      "if this ever fails, the JDK changed String ordering — recheck all")
    // so a KeyOrder reverted to String.compareTo fails the main property
  }
}
