package graft

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Row}
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/**
 * Property generalization of [[GateMutationSpec]]'s fixed hostile
 * fixtures (the ZipNumPrunePropertySpec model, applied to the join/cap
 * family): for RANDOM small datasets dense in the hostile classes —
 * NULL timestamps on either side, duplicate keys, duplicate and
 * exact-threshold timestamps — the operator must equal a brute-force
 * independent implementation on every generated case. The fixed-fixture
 * spec proves the known mutants die; this one proves the operators
 * match the spec on shapes nobody hand-picked.
 *
 * Timestamps draw from a SMALL grid (a handful of distinct values a few
 * gap-lengths apart) so collisions, exact-gap adjacency, and cross-user
 * interleavings are routine rather than astronomically rare.
 */
class JoinCapPropertySpec extends AnyFunSuite with SparkTestSession {

  import scala.jdk.CollectionConverters._

  private def df(schema: String, rows: Seq[Row]): DataFrame =
    spark.createDataFrame(rows.asJava,
      org.apache.spark.sql.types.StructType.fromDDL(schema))

  private def sample[A](g: Gen[A], seed: Long): A =
    Iterator.from(0)
      .map(i => g.apply(Gen.Parameters.default,
        org.scalacheck.rng.Seed(seed + i * 7919L)))
      .collectFirst { case Some(a) => a }.get

  private val Base = 1700000000000000L // epoch micros grid origin

  /** micros on a grid of 900 s steps: gap 1800 s = exactly 2 steps, so
    * exact-threshold adjacency is a 1-in-7 draw, and Some/None mixes in
    * NULL timestamps at ~1 in 6. */
  private val tsGen: Gen[Option[Long]] = Gen.frequency(
    5 -> Gen.chooseNum(0, 6).map(k => Some(Base + k * 900000000L)),
    1 -> Gen.const(None))

  private def toTs(us: Option[Long]): Timestamp =
    us.map(v => new Timestamp(v / 1000)).orNull

  // ------------------------------------------------------------------
  // as-of join
  // ------------------------------------------------------------------

  test("PROPERTY: as-of join equals brute force on 40 random fixtures " +
      "(null ts both sides, tie storms)") {
    (0 until 40).foreach { case_ =>
      val seed = 0xA50F + case_ * 101L
      val nLeft = sample(Gen.chooseNum(0, 8), seed)
      val nRight = sample(Gen.chooseNum(0, 8), seed + 1)
      val left = (0 until nLeft).map { i =>
        Row(sample(Gen.chooseNum(1L, 3L), seed + 10 + i),
          i.toLong, toTs(sample(tsGen, seed + 50 + i)))
      }
      val right = (0 until nRight).map { i =>
        Row(sample(Gen.chooseNum(1L, 3L), seed + 100 + i),
          toTs(sample(tsGen, seed + 150 + i)), 100L + i)
      }
      val l = df("user_id LONG, event_id LONG, ts TIMESTAMP", left)
      val r = df("user_id LONG, sts TIMESTAMP, signup_event LONG", right)
      val got = graft.operators.AsOfJoin.latestPrior(
          l, r, Seq("user_id"), "ts", "sts",
          payloadCols = Seq("signup_event"),
          rightTieCols = Seq("signup_event"))
        .collect().map(x => x.getLong(1) ->
          (if (x.isNullAt(3)) None else Some(x.getLong(3)))).toMap
      // independent spec over the raw rows
      val expect = left.map { lr =>
        val (u, eid, lts) = (lr.getLong(0), lr.getLong(1),
          Option(lr.getTimestamp(2)).map(_.getTime))
        val res = lts.flatMap { t =>
          val cands = right.filter { rr =>
            rr.getLong(0) == u && Option(rr.getTimestamp(1))
              .exists(_.getTime <= t)
          }
          if (cands.isEmpty) None
          else Some(cands.maxBy(rr =>
            (rr.getTimestamp(1).getTime, rr.getLong(2))).getLong(2))
        }
        eid -> res
      }.toMap
      assert(got == expect, s"case $case_: left=$left right=$right")
    }
  }

  // ------------------------------------------------------------------
  // sessionize
  // ------------------------------------------------------------------

  test("PROPERTY: sessionize equals brute force on 40 random fixtures " +
      "(exact-gap grid, duplicate ts, null ts)") {
    val gapSec = 1800L
    (0 until 40).foreach { case_ =>
      val seed = 0x5E55 + case_ * 131L
      val n = sample(Gen.chooseNum(0, 10), seed)
      val rows = (0 until n).map { i =>
        Row(sample(Gen.chooseNum(1L, 2L), seed + 10 + i),
          i.toLong, toTs(sample(tsGen, seed + 50 + i)))
      }
      val d = df("user_id LONG, event_id LONG, ts TIMESTAMP", rows)
      val got = graft.operators.Sessionize(
          d, "user_id", "ts", gapSeconds = gapSec, tieCol = "event_id")
        .collect().map(x => x.getLong(1) ->
          (if (x.isNullAt(x.fieldIndex("session_idx"))) None
           else Some(x.getLong(x.fieldIndex("session_idx"))))).toMap
      val expect = rows.groupBy(_.getLong(0)).flatMap { case (_, g) =>
        val nulls = g.filter(_.isNullAt(2))
          .map(x => x.getLong(1) -> (None: Option[Long]))
        val tsRows = g.filter(!_.isNullAt(2))
          .sortBy(x => (x.getTimestamp(2).getTime, x.getLong(1)))
        var idx = 0L
        var prev = Long.MinValue
        val numbered = tsRows.map { x =>
          val ms = x.getTimestamp(2).getTime
          if (prev == Long.MinValue || ms - prev > gapSec * 1000L) idx += 1
          prev = ms
          x.getLong(1) -> (Some(idx): Option[Long])
        }
        nulls ++ numbered
      }
      assert(got == expect, s"case $case_: rows=$rows")
    }
  }

  // ------------------------------------------------------------------
  // day cap
  // ------------------------------------------------------------------

  test("PROPERTY: day cap equals brute force on 30 random fixtures " +
      "(tied and identical rows at the cut, null timestamps)") {
    (0 until 30).foreach { case_ =>
      val seed = 0xDACA + case_ * 151L
      val n = sample(Gen.chooseNum(0, 12), seed)
      val dayLimit = sample(Gen.chooseNum(1, 3), seed + 1)
      // identical duplicates are routine: payload is a FUNCTION of the
      // (urlkey, ts, offset) triple, so tied rows are whole-row equal
      // and the kept multiset is deterministic under any tiebreak
      val rows = (0 until n).map { i =>
        val key = s"k)/${sample(Gen.chooseNum(0, 1), seed + 10 + i)}"
        val ts = sample(Gen.frequency(
          5 -> Gen.chooseNum(0, 3).map(h =>
            f"2012010${1 + h / 2}%s0${h % 2}%s0000"),
          1 -> Gen.const(null: String)), seed + 50 + i)
        val off = sample(Gen.chooseNum(0L, 2L), seed + 90 + i) * 10
        Row(key, ts, off, s"$key|$ts|$off")
      }
      val d = df("urlkey STRING, timestamp STRING, offset LONG, payload STRING",
        rows)
      val got = graft.operators.GlobalCdxCleanup.dayCap(dayLimit)(d)
        .collect()
        .map(x => (x.getString(0), Option(x.getString(1)), x.getLong(2)))
        .groupBy(r => (r._1, r._2.map(_.take(8))))
        .view.mapValues(_.sortBy(r => (r._2, r._3)).toSeq).toMap
      val expect = rows
        .map(x => (x.getString(0), Option(x.getString(1)), x.getLong(2)))
        .groupBy(r => (r._1, r._2.map(_.take(8))))
        .view.mapValues(_.sortBy(r => (r._2, r._3))
          .take(dayLimit + 1).toSeq).toMap
      assert(got == expect, s"case $case_: rows=$rows dayLimit=$dayLimit")
    }
  }
}
