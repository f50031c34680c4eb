package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-JVM ABAB probe for the r21 media fan-out decision: times the
  * single-task (unfanned) and fanned id feeds of a media gate
  * ALTERNATELY in one session (the only comparison this host's 2-3x
  * cross-JVM phase swings cannot corrupt). Not part of the library
  * surface; see OPTIMIZATION_r21.md. */
object AbMedia {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.shuffle.compress", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import graft.operators.llm.{JpegCodec, Mp4Codec, MultimodalOps}

    def ids(fan: Boolean): org.apache.spark.sql.Dataset[Long] = {
      val base = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id").cast("long"))
      (if (fan) base.repartition(32) else base).as[Long]
    }
    // q119's body verbatim (the mid-weight video gate)
    def q119(fan: Boolean): DataFrame = {
      val media = ids(fan).map { id =>
        val nf = 2 + (id % 5).toInt
        val nComp = if (id % 2 == 0) 3 else 1
        val cb = 128 + 4 * (id % 7).toInt
        val cr = 128 + 6 * (id % 5).toInt
        val rst = if (id % 4 <= 1) 1 else 0
        val frames = (0 until nf).map { fi =>
          if (fi % 2 == 1) Array.fill[Byte](16)((fi + id).toByte)
          else {
            val yv = 16 + 8 * ((id + 5 * fi) % 24).toInt
            JpegCodec.encodeJpeg(8, 8, nComp, 1, JpegCodec.flatQuant,
              JpegCodec.flatQuant, rst, (_, _) => (yv, cb, cr))
          }
        }
        val payload = Mp4Codec.encodeMp4Mjpeg(8, 8, 10, frames,
          samplesPerChunk = 1 + (id % 3).toInt,
          syncEvery = if (id % 2 == 0) 2 else 0,
          forceCo64 = id % 3 == 0)
        MultimodalOps.MediaRecord(id, payload, "mp4", 8, 8)
      }
      MultimodalOps.frameSample(media, frameSize = 64, stride = 2)
        .select(col("doc_id"), col("frame_idx"), col("frame_bytes"),
          col("frame_hash"))
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // warm both shapes, then ABAB x reps, report min + all samples
    noop(q119(fan = false)); noop(q119(fan = true))
    val reps = sys.env.get("AB_REPS").flatMap(_.toIntOption).getOrElse(5)
    val a = Array.fill(reps)(0.0); val b = Array.fill(reps)(0.0)
    for (i <- 0 until reps) {
      var t0 = System.nanoTime(); noop(q119(fan = false))
      a(i) = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime(); noop(q119(fan = true))
      b(i) = (System.nanoTime() - t0) / 1e9
    }
    def fmt(x: Array[Double]) =
      f"min ${x.min}%.3f  samples ${x.map(v => f"$v%.3f").mkString(" ")}"
    println(s"[ab] q119 UNFANNED ${fmt(a)}")
    println(s"[ab] q119 FANNED   ${fmt(b)}")
    spark.stop()
  }
}
