package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.BatchedExternalSink

/** K9/K10 concept (CDXImporter semantics): fixed-size batches, bounded
  * async in-flight window, failure propagation, CQL statement rendering. */
class BatchedSinkSpec extends AnyFunSuite with SparkTestSession {

  test("batched async sink: batch size, bounded window, every row lands") {
    import spark.implicits._
    val ds = spark.range(0, 2537).map(_.toString)
    BatchedExternalSink.write(ds, batchSize = 100, maxInFlight = 4) { () =>
      SinkProbe.opened.incrementAndGet()
      BatchedExternalSink.BatchWriter[String](batch => {
        SinkProbe.maxBatch.accumulateAndGet(batch.size, math.max _)
        val now = SinkProbe.inFlight.incrementAndGet()
        SinkProbe.maxInFlight.accumulateAndGet(now, math.max _)
        Thread.sleep(2) // widen the concurrency window
        batch.foreach(SinkProbe.rows.add)
        SinkProbe.inFlight.decrementAndGet()
      }, onClose = () => SinkProbe.closed.incrementAndGet())
    }
    assert(SinkProbe.rows.size == 2537)
    assert(SinkProbe.maxBatch.get() <= 100)
    assert(SinkProbe.maxInFlight.get() <= 4 * 32) // per-task window × tasks
    // one close per opened per-task connection, success path
    assert(SinkProbe.closed.get() == SinkProbe.opened.get())
  }

  test("a failing batch fails the job (not silently lost in the pool)") {
    import spark.implicits._
    val ds = spark.range(0, 500).map(_.toString)
    val closesBefore = SinkProbe.failClosed.get()
    val boom = intercept[org.apache.spark.SparkException] {
      BatchedExternalSink.write(ds, batchSize = 100, maxInFlight = 2) { () =>
        BatchedExternalSink.BatchWriter[String](
          _ => throw new IllegalStateException("store down"),
          onClose = () => SinkProbe.failClosed.incrementAndGet())
      }
    }
    def mentions(t: Throwable): Boolean =
      t != null && (Option(t.getMessage).exists(_.contains("store down")) ||
        mentions(t.getCause))
    assert(mentions(boom))
    // the connection is released on the FAILURE path too
    assert(SinkProbe.failClosed.get() > closesBefore)
  }

  test("K9 statement rendering: CQL insert per CDX row, quotes escaped") {
    val cdx = spark.createDataFrame(Seq(
      ("org,e)/a", "20120103084508", "http://e.org/a?x='1'", "text/html",
        Some(200), "SHA", null.asInstanceOf[String], Some(55L), "f.warc.gz"),
      ("org,e)/b", "20120103084509", "http://e.org/b", "text/html",
        Option.empty[Int], "SHB", "http://r.org/", Option.empty[Long],
        "g.warc.gz")))
      .toDF("urlkey", "timestamp", "original_url", "mimetype", "statuscode",
        "digest", "redirect_url", "offset", "filename")
    val stmts = BatchedExternalSink.cdxInsertStatements(cdx).collect().sorted
    assert(stmts(0).startsWith(
      "INSERT INTO cdxspace.cdx(surt,datetime,originalurl,mimetype," +
        "statuscode,digest,redirecturl,offset,filename) VALUES ('org,e)/a'"))
    assert(stmts(0).contains("'http://e.org/a?x=''1'''")) // CQL '' doubling
    assert(stmts(0).contains(",200,") && stmts(0).endsWith("'f.warc.gz')"))
    assert(stmts(1).contains(",null,")) // absent status renders null
  }
}

/** JVM-shared probe for the local-mode batched-sink test. */
object SinkProbe {
  val rows: java.util.Set[String] =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  val inFlight = new java.util.concurrent.atomic.AtomicInteger(0)
  val maxInFlight = new java.util.concurrent.atomic.AtomicInteger(0)
  val maxBatch = new java.util.concurrent.atomic.AtomicInteger(0)
  val opened = new java.util.concurrent.atomic.AtomicInteger(0)
  val closed = new java.util.concurrent.atomic.AtomicInteger(0)
  val failClosed = new java.util.concurrent.atomic.AtomicInteger(0)
}
