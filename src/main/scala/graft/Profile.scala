package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: per-rep wall times for individual queries under the same
  * session config Bench uses — the measure-don't-guess loop for perf
  * work. Usage: runMain graft.Profile [sfDir] [query...] */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.tail.toSeq
      else Seq("q52_neardup_components", "q54_ann_hyperplane",
        "q53_hash_split", "q43_ann_ivf_assign", "q21_minhash_lsh")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.get("GRAFT_PROFILE_REPS").flatMap(_.toIntOption).getOrElse(3)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def materialize(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    try materialize("q01_agg") catch { case _: Throwable => () }
    names.foreach { n =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        materialize(n)
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[profile] $n%-28s ${times.map(t => f"$t%.3f").mkString(" ")}")
    }
    spark.stop()
  }
}
