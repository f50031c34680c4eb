package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-JVM ABAB probe for the q108 gram-derivation rewrite (r22): the
  * old interpreted HOF chain (transform/sequence/element_at bigrams +
  * filter() unigrams) vs the native wordGrams + array_remove form, on
  * the exact dsirSelect profile stage (explode → hash48 → pmod →
  * groupBy(doc, tgt, bucket) count). Also asserts the two gram arrays
  * are IDENTICAL row-for-row before timing — a probe that measures two
  * different computations is worse than no probe.
  *
  *   sbt "runMain graft.tools.AbGram"
  */
object AbGram {
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

    val w = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").cast("long").as("__doc"),
        (col("lang") === "en").as("__tgt"),
        split(col("text"), " ", -1).as("__w"))
      .repartition(32, col("__doc"))

    val hofGrams = expr(
      "concat(filter(__w, x -> x <> ''), " +
        "CASE WHEN size(__w) < 2 THEN array() ELSE " +
        "transform(sequence(1, size(__w) - 1), " +
        "i -> concat(element_at(__w, i), ' ', element_at(__w, i + 1))) " +
        "END)")
    val nativeGrams = concat(array_remove(col("__w"), ""),
      graft.functions.VectorFunctions.wordGrams(col("__w"), 2))

    // equivalence gate first: zero rows where the two arrays differ
    val diff = w.select(hofGrams.as("a"), nativeGrams.as("b"))
      .where(not(col("a") <=> col("b"))).count()
    require(diff == 0, s"gram formulations differ on $diff rows")
    println(s"[abgram] equivalence: 0 differing rows")

    def stage(g: org.apache.spark.sql.Column) =
      w.select(col("__doc"), col("__tgt"), explode(g).as("__g"))
        .select(col("__doc"), col("__tgt"),
          pmod(graft.operators.Sketches.hash48Col(col("__g")),
            lit(1024L)).as("__b"))
        .groupBy(col("__doc"), col("__tgt"), col("__b"))
        .agg(count(lit(1)).as("__c"))

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def run(native: Boolean): Double = {
      val t0 = System.nanoTime()
      noop(stage(if (native) nativeGrams else hofGrams))
      (System.nanoTime() - t0) / 1e9
    }
    run(native = false); run(native = true) // warm both shapes
    val reps = sys.env.get("AB_REPS").flatMap(_.toIntOption).getOrElse(5)
    val a = Array.fill(reps)(0.0); val b = Array.fill(reps)(0.0)
    for (i <- 0 until reps) {
      a(i) = run(native = false); b(i) = run(native = true)
    }
    def fmt(x: Array[Double]) =
      f"min ${x.min}%.3f  samples ${x.map(v => f"$v%.3f").mkString(" ")}"
    println(s"[abgram] HOF    ${fmt(a)}")
    println(s"[abgram] NATIVE ${fmt(b)}")
    spark.stop()
  }
}
