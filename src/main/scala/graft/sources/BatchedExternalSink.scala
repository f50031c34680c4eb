package graft.sources

import java.util.concurrent.{ExecutorService, Executors, Future => JFuture}

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/**
 * Batched external-system sink (SURVEY §2 K9/K10 concept;
 * /root/reference/src/main/java/org/archive/cassandra/CDXImporter.java:39-49):
 * rows stream to an external store in fixed-size batches with a bounded
 * window of asynchronous in-flight writes — the reference ships 10,000-row
 * batches with at most 8 futures outstanding. The store client itself is
 * pluggable (`writerFactory` runs once per task, the place to open a
 * connection); the actual Cassandra/HBase driver is an external dependency
 * this build intentionally omits.
 *
 * CONTRACT: the returned `writeBatch` is invoked CONCURRENTLY from up to
 * `maxInFlight` pool threads of the same task — it must be thread-safe
 * (async-submission clients like Cassandra's are; a raw single-connection
 * OutputStream is not — synchronize it or set maxInFlight = 1).
 *
 * Scale shape: pure `foreachPartition` — no shuffle, no driver data path;
 * backpressure is per-task (a slow store throttles each task at
 * `maxInFlight` batches). A failed batch fails the task (Spark retries),
 * matching the reference's fail-on-future-error loop.
 */
object BatchedExternalSink {

  /** Per-task store client: `writeBatch` sends one batch; `close` releases
    * the connection and runs on BOTH success and failure paths. */
  trait BatchWriter[T] extends AutoCloseable {
    def writeBatch(batch: Seq[T]): Unit
    override def close(): Unit = ()
  }

  object BatchWriter {
    /** Function-style writer for clients with nothing to release. */
    def apply[T](f: Seq[T] => Unit,
                 onClose: () => Unit = () => ()): BatchWriter[T] =
      new BatchWriter[T] {
        override def writeBatch(batch: Seq[T]): Unit = f(batch)
        override def close(): Unit = onClose()
      }
  }

  def write[T](ds: Dataset[T], batchSize: Int = 10000, maxInFlight: Int = 8)
              (writerFactory: () => BatchWriter[T]): Unit = {
    require(batchSize > 0 && maxInFlight > 0, "batchSize/maxInFlight must be positive")
    ds.foreachPartition { (it: Iterator[T]) =>
      val writer = writerFactory()
      val pool: ExecutorService = Executors.newFixedThreadPool(maxInFlight)
      val inFlight = mutable.Queue.empty[JFuture[_]]
      try {
        it.grouped(batchSize).foreach { batch =>
          // bounded window: wait for the OLDEST future once full — the
          // reference's in-order future drain (CDXImporter.java:46-49)
          if (inFlight.size >= maxInFlight) inFlight.dequeue().get()
          inFlight += pool.submit(new Runnable {
            override def run(): Unit = writer.writeBatch(batch)
          })
        }
        inFlight.foreach(_.get()) // propagate any batch failure → task fail
      } finally {
        pool.shutdownNow()
        // drain before close: shutdownNow only INTERRUPTS — a still-running
        // writeBatch racing writer.close() on the same connection could
        // corrupt the in-flight call; bounded wait, then close regardless
        try pool.awaitTermination(30, java.util.concurrent.TimeUnit.SECONDS)
        catch { case _: InterruptedException => Thread.currentThread().interrupt() }
        // release the per-task connection on every exit path; a close
        // failure must not mask an in-flight write failure
        try writer.close() catch { case _: Exception => () }
      }
    }
  }

  /**
   * K9's statement rendering (CDXImporter.java:31-33): one CQL INSERT per
   * CDX row, keyed (surt, datetime). Kept as a projection so the batched
   * writer stays store-agnostic; single quotes are doubled per CQL.
   */
  def cdxInsertStatements(cdx: DataFrame): Dataset[String] = {
    val spark = cdx.sparkSession
    import spark.implicits._
    def q(c: String): org.apache.spark.sql.Column =
      concat(lit("'"), regexp_replace(coalesce(col(c).cast("string"), lit("")),
        "'", "''"), lit("'"))
    cdx.select(concat(
      lit("INSERT INTO cdxspace.cdx(surt,datetime,originalurl,mimetype," +
        "statuscode,digest,redirecturl,offset,filename) VALUES ("),
      q("urlkey"), lit(","), q("timestamp"), lit(","), q("original_url"),
      lit(","), q("mimetype"), lit(","),
      coalesce(col("statuscode").cast("string"), lit("null")), lit(","),
      q("digest"), lit(","), q("redirect_url"), lit(","),
      coalesce(col("offset").cast("string"), lit("null")), lit(","),
      q("filename"), lit(")")).as("stmt")).as[String]
  }
}
