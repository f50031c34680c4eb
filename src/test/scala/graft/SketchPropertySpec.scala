package graft

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sketches

/** Property-based invariants of the HLL aggregator (deterministic
  * seeds, same pattern as [[FsAndGzRangePropertySpec]]): the buffer
  * algebra runs at the JVM level — reduce/merge/finish are plain
  * functions — so 100 samples cost no Spark jobs. */
class SketchPropertySpec extends AnyFunSuite {

  private def forAll[A](g: Gen[A], n: Int = 100)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      g.apply(Gen.Parameters.default, org.scalacheck.rng.Seed(i.toLong))
        .foreach(f)
    }

  private def hash(s: String): Long =
    graft.functions.Md5Codegen.md5Prefix48(UTF8String.fromString(s))

  private val agg = Sketches.hllGroupAgg(6)

  private def fold(vs: Seq[String]): Sketches.HllBuffer =
    vs.foldLeft(agg.zero)((b, v) => agg.reduce(b, hash(v)))

  test("hll merge == single fold under ANY split order (mergeability), " +
      "and duplicates are idempotent") {
    val gen = for {
      vs <- Gen.listOf(Gen.alphaNumStr.map(_.take(12)))
      cut <- Gen.chooseNum(0, vs.length)
    } yield (vs, cut)
    forAll(gen) { case (vs, cut) =>
      val whole = agg.finish(fold(vs))
      val (a, b) = vs.splitAt(cut)
      assert(agg.finish(agg.merge(fold(a), fold(b))) == whole)
      // right-to-left merge too (commutativity)
      assert(agg.finish(agg.merge(fold(b), fold(a))) == whole)
      // duplicating the stream moves nothing (a distinct sketch)
      assert(agg.finish(fold(vs ++ vs)) == whole)
    }
  }

  test("hll finish matches a brute-force register model and the " +
      "documented integer estimator") {
    forAll(Gen.listOf(Gen.alphaNumStr.map(_.take(10)))) { vs =>
      // model: registers computed independently of the aggregator
      val regs = new Array[Int](64)
      vs.foreach { v =>
        val h = hash(v)
        val bucket = (h >>> 42).toInt
        val suffix = h & ((1L << 42) - 1)
        val rank = 43 - (64 - java.lang.Long.numberOfLeadingZeros(suffix))
        if (rank > regs(bucket)) regs(bucket) = rank
      }
      val s = regs.map(mj => 1L << (43 - mj)).sum
      val filled = regs.count(_ > 0).toLong
      val est = 709L * ((64L * 64L * (1L << 43)) / s) / 1000L
      assert(agg.finish(fold(vs)) == ((filled, s, est)))
    }
  }
}
