package graft

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Gate-blindness sweep (r20, VERDICT r19 "Next round" #1): the r19
 * AsOfJoin NULL-timestamp leak survived 18 rounds because the q65
 * oracle SQL was a TRANSLATION of the Spark union-window formulation —
 * both engines shared the bug, so the gate stayed green. This spec
 * attacks that class for every gate family whose oracle was written by
 * translation (as-of, revisit, sessionize, interval join, day-cap, the
 * sorted-merge family):
 *
 *  1. an INDEPENDENT brute-force implementation (plain Scala loops over
 *     collected rows — no window/join machinery shared with the
 *     operator) recomputes the expected output on a HOSTILE fixture
 *     (NULL timestamps, '-'-parsed null fields, exact-threshold gaps,
 *     boundary-equal timestamps, duplicate keys at merge boundaries);
 *  2. the operator must equal the brute force; and
 *  3. the MUTANT formulation — the known bug class reintroduced inline
 *     — must DIFFER from the brute force on this fixture, proving the
 *     fixture kills the mutation (the ZipNumPrunePropertySpec model).
 *
 * The driver-side gates carry the same hostile classes since r20
 * (SparkEntry q65/q55/q62/q64/q04 fixtures), and q65/q55's oracle SQL
 * is now independently formulated (DuckDB native ASOF JOIN / LATERAL
 * newest-original); this spec is the in-repo mutation evidence.
 */
class GateMutationSpec extends AnyFunSuite with SparkTestSession {

  import scala.jdk.CollectionConverters._

  private def df(schema: String, rows: Row*): DataFrame =
    spark.createDataFrame(rows.asJava,
      org.apache.spark.sql.types.StructType.fromDDL(schema))

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // ------------------------------------------------------------------
  // 1. AsOfJoin — NULL right ts must resolve nothing; ties take the
  //    greatest tie column; NULL left ts resolves NULL.
  // ------------------------------------------------------------------

  private val asofLeft = df("user_id LONG, event_id LONG, ts TIMESTAMP",
    Row(1L, 10L, ts("2024-01-01 10:00:00")),
    Row(1L, 11L, ts("2024-01-01 12:00:00")),
    Row(1L, 12L, null), // NULL left ts -> NULL payload
    Row(2L, 20L, ts("2024-01-01 09:00:00")), // user 2: only a NULL-ts signup
    Row(3L, 30L, ts("2024-01-01 09:00:00"))) // user 3: signup tie at 08:00

  private val asofRight = df("user_id LONG, sts TIMESTAMP, signup_event LONG",
    Row(1L, ts("2024-01-01 09:30:00"), 101L),
    Row(1L, ts("2024-01-01 11:00:00"), 102L),
    Row(1L, null, 999L), // the r19 leak class: must match NOTHING
    Row(2L, null, 888L),
    Row(3L, ts("2024-01-01 08:00:00"), 301L), // tie: max signup_event wins
    Row(3L, ts("2024-01-01 08:00:00"), 302L))

  /** Independent spec: latest right with sts <= ts; ties by max tie col. */
  private def asofBrute(): Map[Long, Option[Long]] = {
    val left = asofLeft.collect().map(r =>
      (r.getLong(0), r.getLong(1), Option(r.getTimestamp(2))))
    val right = asofRight.collect().map(r =>
      (r.getLong(0), Option(r.getTimestamp(1)), r.getLong(2)))
    left.map { case (u, eid, lts) =>
      val resolved = lts.flatMap { t =>
        val cands = right.filter { case (ru, rts, _) =>
          ru == u && rts.exists(!_.after(t)) // rts defined and <= t
        }
        if (cands.isEmpty) None
        else Some(cands.maxBy { case (_, rts, sev) => (rts.get.getTime, sev) }._3)
      }
      eid -> resolved
    }.toMap
  }

  private def asofResult(d: DataFrame): Map[Long, Option[Long]] =
    d.collect().map(r => r.getLong(1) ->
      (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap

  test("as-of join equals the independent brute force on the hostile " +
      "fixture (NULL ts both sides, duplicate-sts ties)") {
    val got = asofResult(graft.operators.AsOfJoin.latestPrior(
      asofLeft, asofRight, Seq("user_id"), "ts", "sts",
      payloadCols = Seq("signup_event"), rightTieCols = Seq("signup_event"))
      .select(col("user_id"), col("event_id"), col("asof_signup_event")))
    assert(got == asofBrute())
    // the hostile classes actually bind:
    assert(got(12L).isEmpty, "NULL left ts resolves NULL")
    assert(got(20L).isEmpty, "a user whose only signup has NULL sts resolves NULL")
    assert(got(30L).contains(302L), "sts tie resolves to max signup_event")
  }

  test("MUTANT KILL: the r19 union-window WITHOUT the NULL-sts filter " +
      "differs on this fixture (the leak the translated oracle hid)") {
    // the pre-fix formulation, inline: right rows ride unfiltered, so a
    // NULL sts sorts first and becomes "earliest prior" for its user
    val l = asofLeft.select(col("user_id"), col("event_id"),
      col("ts").as("__ts"), lit(1).as("__side"),
      lit(null).cast("long").as("__t"), lit(null).cast("long").as("__p"))
    val r = asofRight.select(col("user_id"), lit(null).cast("long").as("event_id"),
      col("sts").as("__ts"), lit(0).as("__side"),
      col("signup_event").as("__t"), col("signup_event").as("__p"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("__ts"), col("__side"), col("__t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val mutant = asofResult(l.unionByName(r)
      .withColumn("__asof", last(col("__p"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(col("user_id"), col("event_id"), col("__asof")))
    assert(mutant != asofBrute(), "hostile fixture must kill the mutant")
    // and the kill is exactly the leak class:
    assert(mutant(20L).contains(888L),
      "mutant resolves user 2's purchase to the NULL-ts signup")
  }

  // ------------------------------------------------------------------
  // 2. RevisitResolve — the newest original ROW wins whole (a '-'-parsed
  //    NULL field rides through); full tuple order incl. original-
  //    original timestamp ties, which the driver-gate fixture excludes.
  // ------------------------------------------------------------------

  private val REV = "warc/revisit"
  private val revCdx = df(
    "urlkey STRING, timestamp STRING, mimetype STRING, digest STRING, " +
      "filename STRING, offset LONG",
    // one (urlkey, digest) group exercising every tie class:
    Row("k)/a", "20120101000000", "text/html", "d1", "f1.warc.gz", 100L),
    Row("k)/a", "20120102000000", "text/html", "d1", null, 200L), // null file
    Row("k)/a", "20120103000000", "text/html", "d1", "f3.warc.gz", null), // null off
    // original-original tie at one ts: (filename, offset) breaks it,
    // nulls-first, last (= greatest) wins
    Row("k)/a", "20120104000000", "text/html", "d1", "fa.warc.gz", 400L),
    Row("k)/a", "20120104000000", "text/html", "d1", "fb.warc.gz", 410L),
    // original-revisit tie: original orders first, tied revisit sees it
    Row("k)/a", "20120105000000", "text/html", "d1", "f5.warc.gz", 500L),
    Row("k)/a", "20120105000000", REV, "d1", "r5.warc.gz", 510L),
    Row("k)/a", "20120106000000", REV, "d1", "r6.warc.gz", 600L),
    // dangling revisit: no original at or before it
    Row("k)/b", "20120101000000", REV, "d9", "r0.warc.gz", 10L),
    Row("k)/b", "20120102000000", "text/html", "d9", "g1.warc.gz", 20L))

  // rows are uniquely keyed by (urlkey, ts, mimetype, own filename) —
  // the fa/fb tie pair shares everything else
  private type RevKey = (String, String, String, Option[String])

  /** Independent spec: exact tuple sort (ts, isRevisit, filename, offset)
    * with nulls smallest; each row takes the last original at or before
    * itself in that order — the whole row. */
  private def revisitBrute(): Map[RevKey, (Option[String], Option[Long])] = {
    val rows = revCdx.collect().map(r => (r.getString(0), r.getString(1),
      r.getString(2), r.getString(3), Option(r.getString(4)),
      if (r.isNullAt(5)) None else Some(r.getLong(5))))
    rows.groupBy(r => (r._1, r._4)).flatMap { case (_, group) =>
      val sorted = group.sortBy(r => (r._2, r._3 == REV, r._5, r._6))
      sorted.zipWithIndex.map { case (row, i) =>
        val prior = sorted.take(i + 1).filter(_._3 != REV)
        val res = prior.lastOption.map(o => (o._5, o._6))
          .getOrElse((None, None): (Option[String], Option[Long]))
        (row._1, row._2, row._3, row._5) -> res
      }
    }
  }

  private def revisitResult(d: DataFrame): Map[RevKey, (Option[String], Option[Long])] =
    d.collect().map { r =>
      (r.getString(r.fieldIndex("urlkey")), r.getString(r.fieldIndex("timestamp")),
        r.getString(r.fieldIndex("mimetype")),
        Option(r.getString(r.fieldIndex("filename")))) ->
        ((Option(r.getString(r.fieldIndex("resolved_filename"))),
          if (r.isNullAt(r.fieldIndex("resolved_offset"))) None
          else Some(r.getLong(r.fieldIndex("resolved_offset")))))
    }.toMap

  test("revisit resolution equals the tuple-order brute force " +
      "(null fields, original-original and original-revisit ties)") {
    val got = revisitResult(graft.operators.RevisitResolve.resolve(revCdx))
    assert(got == revisitBrute())
    // the classes bind:
    assert(got(("k)/a", "20120102000000", "text/html", None)) ==
      (None, Some(200L)),
      "null filename rides through whole (self-resolve)")
    assert(got(("k)/a", "20120105000000", REV, Some("r5.warc.gz"))) ==
      (Some("f5.warc.gz"), Some(500L)),
      "tied revisit resolves to the equal-ts original")
    assert(got(("k)/a", "20120104000000", "text/html", Some("fa.warc.gz"))) ==
      (Some("fa.warc.gz"), Some(400L)),
      "the earlier-sorting tied original sees only itself")
    assert(got(("k)/a", "20120104000000", "text/html", Some("fb.warc.gz"))) ==
      (Some("fb.warc.gz"), Some(410L)),
      "the later-sorting tied original takes itself (the greatest)")
    assert(got(("k)/b", "20120101000000", REV, Some("r0.warc.gz"))) ==
      (None, None),
      "dangling revisit resolves NULL")
  }

  test("MUTANT KILL: independent per-column last(IGNORE NULLS) tears " +
      "the pointer on the null-field fixture (the r19 bug)") {
    val isOriginal = col("mimetype") =!= REV
    val w = Window.partitionBy(col("urlkey"), col("digest"))
      .orderBy(col("timestamp"), col("mimetype") === REV,
        col("filename"), col("offset"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val mutant = revisitResult(revCdx
      .withColumn("resolved_filename",
        last(when(isOriginal, col("filename")), ignoreNulls = true).over(w))
      .withColumn("resolved_offset",
        last(when(isOriginal, col("offset")), ignoreNulls = true).over(w)))
    val brute = revisitBrute()
    assert(mutant != brute, "hostile fixture must kill the mutant")
    // the kill is the torn-pointer class: at the null-offset original,
    // the mutant pairs ITS filename with the PREVIOUS original's offset
    assert(mutant(("k)/a", "20120103000000", "text/html", Some("f3.warc.gz"))) ==
      (Some("f3.warc.gz"), Some(200L)), "torn pointer: f3's file, f2's offset")
    assert(brute(("k)/a", "20120103000000", "text/html", Some("f3.warc.gz"))) ==
      (Some("f3.warc.gz"), None), "spec: the newest original row, whole")
  }

  // ------------------------------------------------------------------
  // 3. Sessionize — exact-threshold gap stays in-session (> not >=);
  //    NULL ts rows take session NULL without shifting the numbering.
  // ------------------------------------------------------------------

  private val sessEvents = df("user_id LONG, event_id LONG, ts TIMESTAMP",
    Row(1L, 1L, ts("2024-03-01 00:00:00")),
    Row(1L, 2L, ts("2024-03-01 00:30:00")), // exactly 1800 s -> SAME session
    Row(1L, 3L, ts("2024-03-01 01:00:01")), // 1801 s -> NEW session
    Row(1L, 4L, ts("2024-03-01 01:00:01")), // duplicate ts, tie by event_id
    Row(1L, 5L, null), // no session, numbering unshifted
    Row(2L, 6L, null), // a key with ONLY null rows
    Row(3L, 7L, ts("2024-03-01 05:00:00")))

  /** Independent spec: per key, sessions are maximal runs over the
    * timestamped rows sorted by (us, tie) where consecutive gaps are
    * <= gap; null-ts rows get None. */
  private def sessBrute(gapSec: Long): Map[Long, Option[Long]] = {
    val rows = sessEvents.collect().map(r =>
      (r.getLong(0), r.getLong(1), Option(r.getTimestamp(2)).map(_.getTime)))
    rows.groupBy(_._1).flatMap { case (_, group) =>
      val nulls = group.filter(_._3.isEmpty).map(r => r._2 -> (None: Option[Long]))
      val tsRows = group.filter(_._3.isDefined).sortBy(r => (r._3.get, r._2))
      var idx = 0L
      var prev = Long.MinValue
      val numbered = tsRows.map { case (_, eid, Some(ms)) =>
        if (prev == Long.MinValue || ms - prev > gapSec * 1000L) idx += 1
        prev = ms
        eid -> (Some(idx): Option[Long])
      case _ => sys.error("unreachable")
      }
      nulls ++ numbered
    }
  }

  private def sessResult(d: DataFrame): Map[Long, Option[Long]] =
    d.collect().map(r => r.getLong(r.fieldIndex("event_id")) ->
      (if (r.isNullAt(r.fieldIndex("session_idx"))) None
       else Some(r.getLong(r.fieldIndex("session_idx"))))).toMap

  test("sessionize equals the independent brute force (exact-gap " +
      "boundary, duplicate ts, NULL ts)") {
    val got = sessResult(graft.operators.Sessionize(
      sessEvents, "user_id", "ts", gapSeconds = 1800, tieCol = "event_id"))
    assert(got == sessBrute(1800))
    assert(got(1L) == got(2L), "exact 1800 s gap stays in-session")
    assert(got(2L) != got(3L), "1801 s gap opens a session")
    assert(got(3L) == got(4L), "duplicate-ts rows share the session")
    assert(got(5L).isEmpty && got(6L).isEmpty, "null ts -> session NULL")
    assert(got(3L).contains(2L), "numbering unshifted by the null row")
  }

  test("MUTANT KILL: >= gap comparison and null-shifted numbering both " +
      "differ on this fixture") {
    val brute = sessBrute(1800)
    // mutant A: >= threshold splits the exact-boundary pair
    val us = unix_micros(col("ts"))
    val order = Window.partitionBy(col("user_id")).orderBy(us, col("event_id"))
    val cum = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prev = lag(us, 1).over(order)
    val mutantA = sessResult(sessEvents
      .withColumn("__ns", when(us.isNull, 0)
        .when(prev.isNull || (us - prev) >= 1800L * 1000000L, 1).otherwise(0))
      .withColumn("session_idx", when(us.isNull, lit(null).cast("long"))
        .otherwise(sum(col("__ns")).over(cum).cast("long"))))
    assert(mutantA != brute, ">= mutant must be killed")
    assert(mutantA(1L) != mutantA(2L), "the kill is the boundary pair")
    // mutant B: the naive pre-r20 shape — null rows open sessions and
    // consume indices (nulls-first), shifting every real session
    val mutantB = sessResult(sessEvents
      .withColumn("__ns",
        when(prev.isNull || (us - prev) > 1800L * 1000000L, 1).otherwise(0))
      .withColumn("session_idx", sum(col("__ns")).over(cum).cast("long")))
    assert(mutantB != brute, "null-shift mutant must be killed")
    assert(mutantB(1L).contains(2L), "user 1's first real session shifted to 2")
  }

  // ------------------------------------------------------------------
  // 4. IntervalJoin — [start, end): at-start joins, at-end does not;
  //    NULL ts and reversed intervals match nothing.
  // ------------------------------------------------------------------

  private val ivRows = df("event_id LONG, k LONG, ts TIMESTAMP",
    Row(1L, 0L, ts("2024-01-01 00:00:00")), // == ws -> joins
    Row(2L, 0L, ts("2024-01-01 06:00:00")), // == we -> does NOT
    Row(3L, 0L, ts("2024-01-01 03:00:00")),
    Row(4L, 0L, null),
    Row(5L, 1L, ts("2024-01-02 12:00:00"))) // covered by the 3-day interval

  private val ivIntervals = df("win_id LONG, wk LONG, ws TIMESTAMP, we TIMESTAMP",
    Row(10L, 0L, ts("2024-01-01 00:00:00"), ts("2024-01-01 06:00:00")),
    Row(11L, 1L, ts("2024-01-01 12:00:00"), ts("2024-01-03 12:00:00")), // multi-day
    Row(12L, 0L, ts("2024-01-05 00:00:00"), ts("2024-01-04 00:00:00"))) // reversed

  private def ivBrute(): Set[(Long, Long)] = {
    val rows = ivRows.collect().map(r => (r.getLong(0), r.getLong(1),
      Option(r.getTimestamp(2))))
    val ivs = ivIntervals.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getTimestamp(2), r.getTimestamp(3)))
    (for {
      (eid, k, Some(t)) <- rows
      (wid, wk, ws, we) <- ivs
      if k == wk && !t.before(ws) && t.before(we)
    } yield (eid, wid)).toSet
  }

  private def ivPairs(d: DataFrame): Set[(Long, Long)] =
    d.select(col("event_id"), col("win_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("interval join equals the brute force (boundary-equal ts, NULL " +
      "ts, reversed interval, multi-day span)") {
    val got = ivPairs(graft.operators.IntervalJoin.byDay(
      ivRows, "k", "ts", ivIntervals, "wk", "ws", "we"))
    assert(got == ivBrute())
    assert(got.contains((1L, 10L)), "at-start event joins")
    assert(!got.exists(_._1 == 2L), "at-end event does not")
    assert(got.contains((5L, 11L)), "multi-day interval covers its middle day")
  }

  test("MUTANT KILL: inclusive end (<= we) differs on the boundary row") {
    val valid = ivIntervals.where(col("we") >= col("ws"))
    val expanded = valid.withColumn("__iday",
      explode(sequence(to_date(col("ws")), to_date(col("we")))))
    val r = ivRows.withColumn("__rday", to_date(col("ts")))
    val mutant = ivPairs(r.join(expanded,
      r("k") === expanded("wk") && col("__rday") === col("__iday") &&
        r("ts") >= expanded("ws") && r("ts") <= expanded("we")))
    assert(mutant != ivBrute(), "<= mutant must be killed")
    assert(mutant.contains((2L, 10L)), "the kill is the at-end row")
  }

  // ------------------------------------------------------------------
  // 5. Day-cap — dayLimit N ADMITS N+1 (the reference off-by-one,
  //    matched bug-for-bug); ties at the cap boundary stay exact.
  // ------------------------------------------------------------------

  private val capCdx: DataFrame = {
    // one urlkey, one day, 6 captures — THREE byte-identical duplicates
    // straddling the admit cut (dayLimit=2 admits 3: the cut falls
    // INSIDE the tie, the class where rank and row_number diverge)
    df("urlkey STRING, timestamp STRING, offset LONG, payload STRING",
      Row("k)/x", "20120101010000", 10L, "a"),
      Row("k)/x", "20120101020000", 20L, "b"),
      Row("k)/x", "20120101020000", 20L, "b"), // identical dups ACROSS
      Row("k)/x", "20120101020000", 20L, "b"), // the cut
      Row("k)/x", "20120101030000", 30L, "c"),
      Row("k)/x", "20120101040000", 40L, "d"),
      Row("k)/y", "20120101010000", 1L, "z")) // under-cap group rides whole
  }

  private def capBrute(dayLimit: Int): Map[(String, String), Seq[(String, Long)]] = {
    val admit = dayLimit + 1
    capCdx.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .groupBy(r => (r._1, r._2.take(8)))
      .map { case (k, g) =>
        k -> g.sortBy(r => (r._2, r._3)).take(admit).map(r => (r._2, r._3)).toSeq
      }
  }

  private def capResult(d: DataFrame): Map[(String, String), Seq[(String, Long)]] =
    d.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .groupBy(r => (r._1, r._2.take(8)))
      .map { case (k, g) => k -> g.sortBy(r => (r._2, r._3)).map(r => (r._2, r._3)).toSeq }

  test("day cap equals the brute force with boundary ties " +
      "(dayLimit 2 admits 3; identical dups keep the output exact)") {
    val got = capResult(graft.operators.GlobalCdxCleanup.dayCap(2)(capCdx))
    assert(got == capBrute(2))
    assert(got(("k)/x", "20120101")).size == 3, "admit = dayLimit + 1")
    assert(got(("k)/y", "20120101")).size == 1, "under-cap group whole")
  }

  test("MUTANT KILL: admit = dayLimit (off-by-one 'fixed') and " +
      "rank-style admit-all-ties both differ") {
    val brute = capBrute(2)
    // mutant A: admit dayLimit rows, not dayLimit+1
    val w = Window.partitionBy(col("urlkey"), substring(col("timestamp"), 1, 8))
      .orderBy(col("timestamp"), col("offset"))
    val mutantA = capResult(capCdx
      .withColumn("__rn", row_number().over(w)).where(col("__rn") <= 2)
      .drop("__rn"))
    assert(mutantA != brute, "admit-N mutant must be killed")
    assert(mutantA(("k)/x", "20120101")).size == 2)
    // mutant B: rank() admits every row tied at the boundary
    val mutantB = capResult(capCdx
      .withColumn("__rn", rank().over(w)).where(col("__rn") <= 3)
      .drop("__rn"))
    assert(mutantB != brute, "rank mutant must be killed")
    assert(mutantB(("k)/x", "20120101")).size == 4,
      "rank admits ALL rows tied at the cut (4), row_number exactly 3")
  }

  // ------------------------------------------------------------------
  // 6. Sorted merge — duplicate keys at input boundaries survive as a
  //    multiset; the merged stream stays sorted.
  // ------------------------------------------------------------------

  test("k-way merge preserves the duplicate multiset across boundary " +
      "ties; a dedup-on-equal-heads mutant is killed") {
    import graft.operators.SortedMerge
    // three sorted inputs whose boundaries collide on duplicate keys
    val a = Seq("a 1", "c 1", "c 2", "e 1")
    val b = Seq("b 1", "c 1", "e 1") // "c 1" duplicated ACROSS inputs
    val c = Seq("c 2", "d 1")       // "c 2" duplicated across inputs
    implicit val ord: Ordering[String] = graft.util.KeyOrder
    val merged = SortedMerge.mergeIterators(
      Seq(a.iterator, b.iterator, c.iterator)).toSeq
    // independent spec: multiset union, sorted
    val brute = (a ++ b ++ c).sorted
    assert(merged == brute)
    // mutant: skip an element equal to the last emitted (dedup-on-merge)
    val mutant = merged.foldLeft(Vector.empty[String]) { (acc, x) =>
      if (acc.lastOption.contains(x)) acc else acc :+ x
    }
    assert(mutant != brute, "duplicate-at-boundary fixture kills the mutant")
    assert(mutant.size == brute.size - 3,
      "exactly the three cross-input dups (c 1, c 2, e 1)")
  }
}
