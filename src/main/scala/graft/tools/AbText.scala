package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-JVM ABAB probe (r21): does fanning the single-row-group
  * documents scan out BEFORE the per-row text work pay for the
  * CPU-heavy text gates the way it does for the media gates?
  * Variants are the gates' bodies verbatim with only the id/text feed
  * toggled. See AbMedia for the protocol rationale. */
object AbText {
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

    def docs(fan: Boolean): DataFrame = {
      val base = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id"), col("text"))
      if (fan) base.repartition(32) else base
    }
    val merges: Seq[(String, String)] = Seq(
      "t" -> "h", "th" -> "e", "i" -> "n", "a" -> "n", "an" -> "d",
      "e" -> "r", "o" -> "n", "r" -> "e", "o" -> "u", "s" -> "t",
      "e" -> "d", "in" -> "g")
    def q95(fan: Boolean): DataFrame =
      graft.operators.llm.CorpusModels.bpeApply(
        docs(fan), "doc_id", "text", merges)
    def q88(fan: Boolean): DataFrame =
      graft.operators.llm.TextAnalysis.bigramFluency(
        docs(fan), "doc_id", "text")
    def q90(fan: Boolean): DataFrame =
      graft.operators.llm.TextAnalysis.substringDedup(
        docs(fan), "doc_id", "text", k = 15)
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val reps = sys.env.get("AB_REPS").flatMap(_.toIntOption).getOrElse(5)
    def q84(fan: Boolean): DataFrame =
      graft.operators.llm.TextAnalysis.dupGramFraction(
        docs(fan), "doc_id", "text", k = 8)
    val all = Map[String, Boolean => DataFrame]("q95_bpe_apply" -> q95,
      "q88_bigram_fluency" -> q88, "q90_substring_dedup" -> q90,
      "q84_dup_fraction" -> q84)
    val chosen = if (args.nonEmpty) args.toSeq else all.keys.toSeq.sorted
    for (name <- chosen; f = all(name)) {
      noop(f(false)); noop(f(true))
      val a = Array.fill(reps)(0.0); val b = Array.fill(reps)(0.0)
      for (i <- 0 until reps) {
        var t0 = System.nanoTime(); noop(f(false))
        a(i) = (System.nanoTime() - t0) / 1e9
        t0 = System.nanoTime(); noop(f(true))
        b(i) = (System.nanoTime() - t0) / 1e9
      }
      def fmt(x: Array[Double]) =
        f"min ${x.min}%.3f  samples ${x.map(v => f"$v%.3f").mkString(" ")}"
      println(s"[ab] $name UNFANNED ${fmt(a)}")
      println(s"[ab] $name FANNED   ${fmt(b)}")
    }
    spark.stop()
  }
}
