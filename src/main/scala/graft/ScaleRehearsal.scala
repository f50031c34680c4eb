package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Scale rehearsal for the flagship LSH→CC dedup chain (SCALE.md "three
 * measured decades"): replicate the sf0.1 near-dup corpus N times with
 * disjoint ids — duplication compounds ACROSS copies, the worst case for
 * candidate generation — run MinHash-LSH → connected components →
 * keep-min, and report wall time, SparkListener-measured shuffle volume,
 * and the capped-bucket skip-list size.
 *
 * Usage: runMain graft.ScaleRehearsal [copies] [maxBucket] [sfDir]
 * (copies=1 ≈ 5.7k docs, 10 ≈ 57k, 100 ≈ 570k.)
 */
object ScaleRehearsal {
  def main(args: Array[String]): Unit = {
    val copies = args.headOption.flatMap(_.toIntOption).getOrElse(100)
    val maxBucket = args.lift(1).flatMap(_.toIntOption).getOrElse(400)
    val sfDir = args.lift(2).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val read = new AtomicLong; val write = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) {
          read.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          write.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        }
      }
    })

    // the q69 corpus rule (base + appended-text variants), replicated
    // with disjoint id spaces; every copy of a doc is a near-dup of every
    // other copy, so the near-dup graph grows superlinearly in `copies`
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    val variants = docs.where(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat(col("text"), lit(" graft extra appended")).as("text"))
    val corpus = docs.unionByName(variants)
      .select(explode(sequence(lit(0L), lit(copies - 1L))).as("__c"),
        col("doc_id"), col("text"))
      .select((col("doc_id") + col("__c") * 10000000L).as("doc_id"),
        col("text"))
      .repartition(cpus.toInt) // testdata is one row group (SCALE.md caveat)

    import graft.operators.llm.{ConnectedComponents, MinHashLsh}
    val t0 = System.nanoTime()
    val sh = graft.operators.llm.Shingles
      .explodeShingles(corpus, "doc_id", "text", 3)
    val bands = MinHashLsh.bands(
      MinHashLsh.signature(sh, "doc_id", 6), "doc_id", 6, 2).persist()
    val (pairs, dropped) =
      MinHashLsh.candidatePairsCapped(bands, "doc_id", maxBucket)
    val nDropped = dropped.agg(count(lit(1)), coalesce(sum(col("n_ids")),
      lit(0L))).collect()(0)
    // CC under fixed partitioning, as q69 runs it: AQE's per-iteration
    // coalescing would break the edge-cache/label co-partitioning the
    // iteration count amortizes
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val cc = ConnectedComponents(pairs, "doc_a", "doc_b")
    val stats = cc.agg(count(lit(1)).as("nodes"),
      countDistinct(col("component")).as("components")).collect()(0)
    val keep = corpus.select(col("doc_id"))
      .join(cc.where(col("node") =!= col("component"))
        .select(col("node").as("doc_id")), Seq("doc_id"), "left_anti")
      .count()
    val wall = (System.nanoTime() - t0) / 1e9
    bands.unpersist(blocking = false)

    def mib(v: Long): String = f"${v / 1048576.0}%.1f"
    println(f"[rehearsal] copies=$copies docs=${corpus.count()} " +
      f"nodes=${stats.getLong(0)} components=${stats.getLong(1)} " +
      f"kept=$keep droppedBuckets=${nDropped.getLong(0)} " +
      f"droppedIds=${nDropped.getLong(1)} wall=$wall%.1f s " +
      s"shuffleRead=${mib(read.get)} MiB shuffleWrite=${mib(write.get)} MiB")
    spark.stop()
  }
}
