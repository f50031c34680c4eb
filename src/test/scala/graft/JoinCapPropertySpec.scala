package graft

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.{col, countDistinct}
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
  // interval join
  // ------------------------------------------------------------------

  test("PROPERTY: interval join equals brute force on 30 random fixtures " +
      "(boundary-equal ts, null ts, reversed and multi-day intervals)") {
    (0 until 30).foreach { case_ =>
      val seed = 0x17E4 + case_ * 163L
      val nEv = sample(Gen.chooseNum(0, 8), seed)
      val nIv = sample(Gen.chooseNum(0, 5), seed + 1)
      // event times on the same grid the intervals use, so ts == ws and
      // ts == we collisions are routine; day multiples make multi-day
      // spans common
      val evRows = (0 until nEv).map { i =>
        Row(i.toLong, sample(Gen.chooseNum(0L, 1L), seed + 10 + i),
          toTs(sample(tsGen, seed + 50 + i)))
      }
      val ivRows = (0 until nIv).map { i =>
        val ws = Base + sample(Gen.chooseNum(0, 6), seed + 100 + i) * 900000000L
        // span -1..+3 grid steps: reversed (dropped), empty, intra-day,
        // and multi-day (900 s steps never cross a day here, so stretch
        // some ends by 2 days)
        val span = sample(Gen.chooseNum(-1, 3), seed + 140 + i) * 900000000L +
          sample(Gen.oneOf(0L, 2L * 86400000000L), seed + 180 + i)
        Row(100L + i, sample(Gen.chooseNum(0L, 1L), seed + 220 + i),
          toTs(Some(ws)), toTs(Some(ws + span)))
      }
      val ev = df("event_id LONG, k LONG, ts TIMESTAMP", evRows)
      val iv = df("win_id LONG, wk LONG, ws TIMESTAMP, we TIMESTAMP", ivRows)
      val got = graft.operators.IntervalJoin.byDay(
          ev, "k", "ts", iv, "wk", "ws", "we")
        .select("event_id", "win_id").collect()
        .map(x => (x.getLong(0), x.getLong(1))).toSet
      val expect = (for {
        e <- evRows
        t <- Option(e.getTimestamp(2)).map(_.getTime).toSeq
        w <- ivRows
        if e.getLong(1) == w.getLong(1) &&
          t >= w.getTimestamp(2).getTime && t < w.getTimestamp(3).getTime
      } yield (e.getLong(0), w.getLong(0))).toSet
      assert(got == expect, s"case $case_: ev=$evRows iv=$ivRows")
    }
  }

  // ------------------------------------------------------------------
  // revisit resolution
  // ------------------------------------------------------------------

  test("PROPERTY: revisit resolution equals the tuple-order brute force " +
      "on 30 random fixtures (null fields, every tie class)") {
    val REV = "warc/revisit"
    (0 until 30).foreach { case_ =>
      val seed = 0x4E51 + case_ * 173L
      val n = sample(Gen.chooseNum(0, 10), seed)
      val tsPool = Seq("20120101000000", "20120102000000", "20120103000000")
      val rows = (0 until n).map { i =>
        Row(s"k)/${sample(Gen.chooseNum(0, 1), seed + 10 + i)}",
          sample(Gen.oneOf(tsPool), seed + 40 + i),
          if (sample(Gen.chooseNum(0, 2), seed + 70 + i) == 0) REV
          else "text/html",
          "d0", // one digest: maximal within-group collision pressure
          sample(Gen.frequency(
            3 -> Gen.chooseNum(0, 2).map(k => s"f$k.gz"),
            1 -> Gen.const(null: String)), seed + 100 + i),
          sample(Gen.frequency(
            3 -> Gen.chooseNum(0L, 2L).map(java.lang.Long.valueOf),
            1 -> Gen.const(null: java.lang.Long)), seed + 140 + i))
      }
      val d = df("urlkey STRING, timestamp STRING, mimetype STRING, " +
        "digest STRING, filename STRING, offset LONG", rows)
      // rows are not uniquely keyed (ties are the point) — compare the
      // SORTED multiset of full output rows instead of a map
      def norm(x: Row, fIdx: Int, oIdx: Int) =
        (x.getString(0), x.getString(1), x.getString(2),
          Option(x.getString(4)),
          if (x.isNullAt(5)) None else Some(x.getLong(5)),
          Option(x.getString(fIdx)),
          if (x.isNullAt(oIdx)) None else Some(x.getLong(oIdx)))
      val out = graft.operators.RevisitResolve.resolve(d)
      val fI = out.schema.fieldIndex("resolved_filename")
      val oI = out.schema.fieldIndex("resolved_offset")
      val got = out.collect().map(norm(_, fI, oI)).sortBy(_.toString).toSeq
      val expect = rows.groupBy(x => (x.getString(0), x.getString(3)))
        .flatMap { case (_, g) =>
          val sorted = g.sortBy(x => (x.getString(1), x.getString(2) == REV,
            Option(x.getString(4)),
            if (x.isNullAt(5)) None else Some(x.getLong(5))))
          sorted.zipWithIndex.map { case (x, i) =>
            val prior = sorted.take(i + 1).filter(_.getString(2) != REV)
            val res = prior.lastOption
              .map(o => (Option(o.getString(4)),
                if (o.isNullAt(5)) None else Some(o.getLong(5))))
              .getOrElse((None, None))
            (x.getString(0), x.getString(1), x.getString(2),
              Option(x.getString(4)),
              if (x.isNullAt(5)) None else Some(x.getLong(5)),
              res._1, res._2)
          }
        }.toSeq.sortBy(_.toString)
      assert(got == expect, s"case $case_: rows=$rows")
    }
  }

  // ------------------------------------------------------------------
  // skew machinery — salting and distinct-spread must be result-invisible
  // ------------------------------------------------------------------

  test("PROPERTY: salted join equals the plain inner join on 30 random " +
      "fixtures (null keys, dim misses, hot keys)") {
    (0 until 30).foreach { case_ =>
      val seed = 0x5A17 + case_ * 191L
      val nBig = sample(Gen.chooseNum(0, 12), seed)
      // a hot key: most rows share key "h"; nulls and dim-missing keys mixed
      val keyGen = Gen.frequency(4 -> Gen.const("h"),
        2 -> Gen.oneOf("a", "b"), 1 -> Gen.const("zz-missing"),
        1 -> Gen.const(null: String))
      val big = (0 until nBig).map(i =>
        Row(sample(keyGen, seed + 10 + i), i.toLong))
      val dims = Seq(Row("h", 100L), Row("a", 200L), Row("b", 300L),
        Row(null: String, 999L)) // null dim key matches NOTHING
      val b = df("k STRING, v LONG", big)
      val d = df("dk STRING, w LONG", dims)
      def pairs(out: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
        out.select(col("v"), col("w")).collect()
          .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val salted = pairs(graft.operators.SkewAgg.saltedJoin(
        b, d, "k", "dk", buckets = 4))
      val plain = pairs(b.join(d, b("k") === d("dk"))) // the spec
      assert(salted == plain, s"case $case_: big=$big")
      assert(!salted.exists(_._2 == 999L), "null keys never match")
    }
  }

  test("PROPERTY: skew-spread distinct equals countDistinct on 30 " +
      "random fixtures (hot keys, null values)") {
    (0 until 30).foreach { case_ =>
      val seed = 0xD157 + case_ * 197L
      val n = sample(Gen.chooseNum(0, 15), seed)
      val rows = (0 until n).map { i =>
        Row(sample(Gen.oneOf("x", "y"), seed + 10 + i),
          sample(Gen.frequency(
            4 -> Gen.chooseNum(0L, 3L).map(java.lang.Long.valueOf),
            1 -> Gen.const(null: java.lang.Long)), seed + 40 + i))
      }
      val d = df("k STRING, v LONG", rows)
      val got = graft.operators.SkewAgg.distinctByKey(d, "k", "v")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val want = d.groupBy(col("k"))
        .agg(countDistinct(col("v")).as("n")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == want, s"case $case_: rows=$rows")
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
