package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{AsOfJoin, IntervalJoin, Sessionize}

/** Property pins for the batch event-log operators: each compared against
  * a brute-force in-memory reference on deterministic random data, with
  * the edge shapes the round-5 review flagged (NULL payload fields,
  * same-timestamp ties, malformed intervals) deliberately present. */
class BatchOpsPropertySpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  test("asof join matches brute force, incl. NULL payload fields and ties") {
    val rnd = new scala.util.Random(42)
    // small ts range forces plenty of left/right and right/right ties
    val lefts = (1 to 150).map(i => (rnd.nextInt(5), rnd.nextInt(60), i))
    val rights = (1 to 90).map(j => (rnd.nextInt(5), rnd.nextInt(60), j,
      if (rnd.nextInt(4) == 0) null else s"p$j"))
    val got = AsOfJoin.latestPrior(
      lefts.toDF("k", "ts", "id"), rights.toDF("k", "sts", "tie", "payload"),
      keyCols = Seq("k"), leftTs = "ts", rightTs = "sts",
      payloadCols = Seq("payload"), rightTieCols = Seq("tie"))
      .select(col("id"), col("asof_payload"))
      .collect().map(r => r.getInt(0) ->
        (if (r.isNullAt(1)) None else Some(r.getString(1)))).toMap
    lefts.foreach { case (k, ts, id) =>
      val prior = rights.filter(r => r._1 == k && r._2 <= ts)
      val want = prior.sortBy(r => (r._2, r._3)).lastOption
        .map(r => Option(r._4))
      // no prior right row → NULL payload; a latest right row whose
      // payload is NULL must yield NULL, never an older non-null value
      val wantFlat = want match {
        case None => None
        case Some(None) => None
        case Some(Some(v)) => Some(v)
      }
      assert(got(id) == wantFlat, s"left id=$id k=$k ts=$ts")
    }
  }

  test("substringDedup matches brute force on random repetitive corpora") {
    import graft.operators.llm.TextAnalysis
    val rnd = new scala.util.Random(13)
    val k = 3
    // tiny vocabulary forces heavy cross- and within-doc gram collisions
    def doc(): String =
      (1 to (rnd.nextInt(12) + 1)).map(_ => s"w${rnd.nextInt(4)}")
        .mkString(" ")
    val docs = (1L to 40L).map(i => (i, doc()))
    val got = TextAnalysis.substringDedup(
      docs.toDF("doc_id", "text"), "doc_id", "text", k)
      .select(col("doc_id"), col("n_kept"), col("n_dropped"),
        col("clean_text"))
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getString(3)))).toMap
    // brute-force model of the coverage rule: global first occurrence of
    // each k-gram in (doc, pos) order survives; every other occurrence
    // covers positions [pos, pos+k-1] of its own doc
    val firsts = scala.collection.mutable.HashMap.empty[Seq[String], (Long, Int)]
    val words = docs.map { case (id, t) => id -> t.split(" ", -1).toSeq }.toMap
    for ((id, _) <- docs; ws = words(id); p <- 1 to ws.length - k + 1) {
      val g = ws.slice(p - 1, p - 1 + k)
      if (!firsts.contains(g)) firsts(g) = (id, p)
    }
    for ((id, _) <- docs) {
      val ws = words(id)
      val covered = scala.collection.mutable.BitSet.empty
      for (p <- 1 to ws.length - k + 1) {
        val g = ws.slice(p - 1, p - 1 + k)
        if (firsts(g) != ((id, p))) covered ++= (p until p + k)
      }
      val kept = (1 to ws.length).filterNot(covered)
      val want = (kept.size, covered.size, kept.map(i => ws(i - 1)).mkString(" "))
      assert(got(id) == want, s"doc $id: '${words(id).mkString(" ")}'")
    }
  }

  test("sessionize matches brute force on colliding timestamps") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 200).map(i =>
      (rnd.nextInt(4), new Timestamp(rnd.nextInt(500) * 1000L), i))
    val gap = 20L
    val got = Sessionize(rows.toDF("k", "ts", "id"), "k", "ts",
      gapSeconds = gap, tieCol = "id")
      .select(col("id"), col("session_idx"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    rows.groupBy(_._1).foreach { case (_, grp) =>
      var prevUs = Long.MinValue
      var idx = 0L
      grp.sortBy(r => (r._2.getTime, r._3)).foreach { case (_, ts, id) =>
        val us = ts.getTime * 1000L
        if (prevUs == Long.MinValue || us - prevUs > gap * 1000000L) idx += 1
        prevUs = us
        assert(got(id) == idx, s"row id=$id")
      }
    }
  }

  test("interval join matches brute force; malformed intervals drop cheaply") {
    val rnd = new scala.util.Random(13)
    val day = 86400000L
    def ts(ms: Long) = new Timestamp(ms)
    val rows = (1 to 200).map(i =>
      (rnd.nextInt(4), ts(rnd.nextInt(8) * day + rnd.nextInt(86400) * 1000L), i))
    val intervals = (1 to 40).map { j =>
      val s = rnd.nextInt(7) * day + rnd.nextInt(86400) * 1000L
      val span = rnd.nextInt(3) * day + rnd.nextInt(86400) * 1000L
      // every 8th interval is malformed (end < start): must contribute
      // nothing and must not inflate the join
      if (j % 8 == 0) (rnd.nextInt(4), ts(s + span), ts(s), j)
      else (rnd.nextInt(4), ts(s), ts(s + span), j)
    }
    val got = IntervalJoin.byDay(
      rows.toDF("k", "ts", "rid"),
      rowKey = "k", tsCol = "ts",
      intervals.toDF("ik", "start", "end", "iid"),
      intKey = "ik", startCol = "start", endCol = "end")
      .select(col("rid"), col("iid"))
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    val want = (for {
      (k, t, rid) <- rows
      (ik, s, e, iid) <- intervals
      if ik == k && s.getTime <= t.getTime && t.getTime < e.getTime
    } yield (rid, iid)).toSet
    assert(got == want)
  }
}
