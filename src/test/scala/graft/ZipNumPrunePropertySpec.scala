package graft

import java.nio.file.Files

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.zipnum.{ZipNumIndex, ZipNumReader, ZipNumWriter}

/** Property-based pin of the serving-path bound semantics, generalizing
  * the r18 strictly-below regression test in [[ZipNumRoundtripSpec]]
  * into an invariant: for ANY cluster shape — random same-key run
  * lengths, random lines-per-block (down to 1, so key runs straddle
  * block boundaries and tied firstKeys are routine) — and ANY
  * [start, end) drawn from the key population (block firstKeys
  * included, the exact tie class that lost data for 18 rounds),
  * `ZipNumReader.lines` must equal a brute-force filter of every line.
  * Deterministic seeds, same pattern as [[SketchPropertySpec]]; cluster
  * writes are the expensive part, so a handful of generated clusters
  * each serve many probes. */
class ZipNumPrunePropertySpec extends AnyFunSuite with SparkTestSession {

  private def sample[A](g: Gen[A], seed: Long): A =
    Iterator.from(0)
      .map(i => g.apply(Gen.Parameters.default,
        org.scalacheck.rng.Seed(seed + i * 7919L)))
      .collectFirst { case Some(a) => a }.get

  /** Random cluster: keys with shared prefixes (adjacent keys often agree
    * on a prefix, like SURTs), per-key run lengths 1..7, linesPerBlock
    * 1..5 → runs longer than a block are common, ties at block starts
    * guaranteed across seeds. Payload suffix makes every line unique so
    * content equality is multiset-exact. */
  private case class Shape(lines: Seq[String], linesPerBlock: Int, parts: Int)

  private val shapeGen: Gen[Shape] = for {
    nKeys <- Gen.chooseNum(3, 14)
    runs <- Gen.listOfN(nKeys, Gen.chooseNum(1, 7))
    lpb <- Gen.chooseNum(1, 5)
    parts <- Gen.chooseNum(1, 3)
    fam <- Gen.chooseNum(0, 2)
  } yield {
    val keys = (0 until nKeys).map(i => f"org,k${fam}%d)/p${i % 4}%d/$i%03d")
    val lines = keys.zip(runs).flatMap { case (k, r) =>
      // at most TWO timestamps per key run: duplicate (urlkey, ts) pairs
      // are the tie fuel — they make adjacent summary firstKeys EQUAL
      // whenever a run spans a block, which is the exact class the r18
      // strictly-below fix exists for (distinct timestamps never tie and
      // would let an off-by-one prune bound pass this spec — verified by
      // mutation: `lteq` in ClusterIndex.prune must fail here)
      (0 until r).map(j =>
        s"$k 2012010100000${j.min(1)} row-$k-$j")
    }.sorted
    Shape(lines, lpb, parts)
  }

  private def writeCluster(sh: Shape): String = {
    val d = Files.createTempDirectory(
      java.nio.file.Paths.get("/root/repo/target"), "zipnum-prop").toString
    import spark.implicits._
    val ds = spark.createDataset(sh.lines)(implicitly)
      .repartitionByRange(sh.parts, org.apache.spark.sql.functions.col("value"))
      .sortWithinPartitions("value")
    ZipNumWriter.write(ds, s"$d/cluster", linesPerBlock = sh.linesPerBlock,
      overwrite = true)
    s"$d/cluster"
  }

  private def brute(lines: Seq[String], start: Option[String],
                    end: Option[String]): Seq[String] =
    lines.filter(l =>
      start.forall(s => graft.util.KeyOrder.gteq(l, s)) &&
        end.forall(e => graft.util.KeyOrder.lt(l, e)))

  test("lines(start, end) == brute-force filter for random clusters and " +
      "random bounds (firstKey ties, mid-run starts, open ends)") {
    (0 until 6).foreach { seed =>
      val sh = sample(shapeGen, seed.toLong)
      val dir = writeCluster(sh)
      val idx = ZipNumIndex.load(dir, spark.sparkContext.hadoopConfiguration)
      // probe population: every block firstKey (the r18 tie class), bare
      // urlkeys, keys nudged past a run ("~" sorts after digits/space),
      // and the open bound
      val firstKeys = idx.blocks.map(_.firstKey)
      val bareKeys = sh.lines.map(_.takeWhile(_ != ' ')).distinct
      val population: Seq[Option[String]] =
        firstKeys.map(Some(_)) ++ bareKeys.map(Some(_)) ++
          bareKeys.map(k => Some(k + "~")) ++ Seq(None)
      val probeGen = for {
        s <- Gen.oneOf(population)
        e <- Gen.oneOf(population)
      } yield (s, e)
      (0 until 15).foreach { p =>
        val (s0, e0) = sample(probeGen, seed * 1000L + p)
        // keep [start, end) well-formed; an inverted pair is vacuous
        val ok = (s0, e0) match {
          case (Some(a), Some(b)) => graft.util.KeyOrder.lteq(a, b)
          case _ => true
        }
        if (ok) {
          val got = ZipNumReader.lines(spark, dir, s0, e0).collect()
            .toSeq.sorted(graft.util.KeyOrder)
          val want = brute(sh.lines, s0, e0)
          assert(got == want,
            s"seed=$seed lpb=${sh.linesPerBlock} parts=${sh.parts} " +
              s"start=$s0 end=$e0: got ${got.size} want ${want.size}")
        }
      }
    }
  }

  test("rangesRdd partitions tile the cluster exactly against random " +
      "boundaries (the merge path's aligned-read contract)") {
    (0 until 3).foreach { seed =>
      val sh = sample(shapeGen, 100L + seed)
      val dir = writeCluster(sh)
      val bareKeys = sh.lines.map(_.takeWhile(_ != ' ')).distinct
      val bGen = Gen.someOf(bareKeys).map(_.sorted(graft.util.KeyOrder))
      val bounds = sample(bGen, 200L + seed).toIndexedSeq
      val perPart = ZipNumReader.rangesRdd(spark, dir, bounds)
        .mapPartitionsWithIndex((i, it) => it.map((i, _)))
        .collect().toSeq
      // global content: tiling is exact, no loss, no duplication
      assert(perPart.map(_._2).sorted(graft.util.KeyOrder) == sh.lines,
        s"seed=$seed bounds=${bounds.size}: union of ranges != cluster")
      // per-partition ranges: partition i holds [bounds(i-1), bounds(i))
      perPart.foreach { case (i, l) =>
        if (i > 0) assert(graft.util.KeyOrder.gteq(l, bounds(i - 1)),
          s"seed=$seed line in partition $i below its lower bound")
        if (i < bounds.size) assert(graft.util.KeyOrder.lt(l, bounds(i)),
          s"seed=$seed line in partition $i at/above its upper bound")
      }
    }
  }
}
