package graft.tools

import org.apache.spark.sql.SparkSession

/** One-JVM ABAB probe over REAL gate queries whose shape is toggled by
  * a diagnostic system property (currently `graft.media.nofan` — the
  * mediaIds fan-out): times property-ON (A) and property-OFF (B)
  * builds of the same query alternately in one session. See AbMedia
  * for why cross-JVM pairings are uninterpretable on this host.
  *
  *   sbt "runMain graft.tools.AbQuery q106_media_decode"
  */
object AbQuery {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: AbQuery <query> [query...]")
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
    def noop(name: String): Unit =
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    val reps = sys.env.get("AB_REPS").flatMap(_.toIntOption).getOrElse(5)
    args.foreach { name =>
      def run(nofan: Boolean): Double = {
        // both toggles: graft.media.nofan gates the media-id feed,
        // graft.fan.nofan gates fanOut itself (r22) — so any fanned
        // query probes through the real registry
        if (nofan) {
          sys.props("graft.media.nofan") = "1"
          sys.props("graft.fan.nofan") = "1"
        } else {
          sys.props.remove("graft.media.nofan")
          sys.props.remove("graft.fan.nofan")
        }
        val t0 = System.nanoTime(); noop(name)
        (System.nanoTime() - t0) / 1e9
      }
      run(nofan = true); run(nofan = false) // warm both shapes
      val a = Array.fill(reps)(0.0); val b = Array.fill(reps)(0.0)
      for (i <- 0 until reps) {
        a(i) = run(nofan = true); b(i) = run(nofan = false)
      }
      def fmt(x: Array[Double]) =
        f"min ${x.min}%.3f  samples ${x.map(v => f"$v%.3f").mkString(" ")}"
      println(s"[ab] $name NOFAN  ${fmt(a)}")
      println(s"[ab] $name FANNED ${fmt(b)}")
    }
    spark.stop()
  }
}
