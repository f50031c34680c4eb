package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.model.CdxRecord
import graft.operators.GlobalCdxCleanup

class DayCapSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  private def rec(key: String, ts: String, off: Long): CdxRecord =
    CdxRecord(key, ts, s"http://$key/", "text/html", Some(200), "DIGESTLONG",
      None, None, Some(1L), Some(off), "f.warc.gz")

  test("two-phase day cap keeps exactly the N+1 smallest per (key, day)") {
    // hot key: 40 same-day captures scattered across 8 partitions,
    // plus a second day and a second key
    val rows =
      (0 until 40).map(i => rec("org,hot)/", f"2012010108$i%02d00", 100 - i)) ++
      (0 until 5).map(i => rec("org,hot)/", f"2012010208$i%02d00", i)) ++
      (0 until 3).map(i => rec("org,cold)/", f"2012010109$i%02d00", i))
    val df = spark.createDataset(
      scala.util.Random.shuffle(rows)).repartition(8).toDF()
    val capped = GlobalCdxCleanup.dayCap(dayLimit = 3)(df)
      .as[CdxRecord].collect().toSet
    // expected: per (key, day) the dayLimit+1 = 4 smallest by
    // (timestamp, offset) — the reference admits one extra row
    val expected = rows.groupBy(r => (r.urlkey, r.timestamp.take(8)))
      .values.flatMap(_.sortBy(r => (r.timestamp, r.offset.get)).take(4))
      .toSet
    assert(capped == expected)
  }

  test("cap of 0 disables; cap larger than groups keeps everything") {
    val rows = (0 until 4).map(i => rec("org,a)/", f"201201010$i%03d0", i))
    val df = spark.createDataset(rows).repartition(2).toDF()
    assert(GlobalCdxCleanup.dayCap(0)(df).count() == 4)
    assert(GlobalCdxCleanup.dayCap(100)(df).count() == 4)
  }
}
