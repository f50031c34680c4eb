package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch diagnostic main — NOT part of the library surface; used to
  * decompose per-query bench time into plan components. Deleted or
  * inert between perf investigations. */
object Diag {
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

    def tbl(n: String) = spark.read.parquet(s"$sfDir/$n.parquet")
    def cents(c: org.apache.spark.sql.Column) = (c * 100).cast("long")

    val jobCount = new java.util.concurrent.atomic.AtomicInteger
    val stageCount = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobCount.incrementAndGet(); stageCount.addAndGet(j.stageInfos.size)
        }
      })

    def time(name: String)(f: => Unit): Unit = {
      // min of 3 after one warmup
      f
      val j0 = jobCount.get; val s0 = stageCount.get
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      Thread.sleep(50) // listener events are async
      val jobs = (jobCount.get - j0) / 3.0
      val stages = (stageCount.get - s0) / 3.0
      println(f"[diag] $name%-28s ${ts.min}%.3f s  jobs=$jobs%.1f stages=$stages%.1f")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // warmup session
    noop(tbl("lineitem").agg(count(lit(1))))

    val vals = tbl("lineitem")
      .select(cents(col("l_extendedprice")).as("price_cents"))
      .where(col("price_cents").isNotNull)
      .select(col("price_cents").cast("long").as("v"))

    time("scan+count") { noop(tbl("lineitem").agg(count(lit(1)))) }
    time("scan+cents+noop") { noop(vals) }
    time("scan+cents+hash48") {
      noop(vals.select(graft.operators.Sketches.hash48Col(col("v")).as("hv"), col("v")))
    }
    time("cents+md5 only") {
      noop(vals.select(md5(col("v").cast("string")).as("hv"), col("v")))
    }
    time("cents+md5+substr") {
      noop(vals.select(substring(md5(col("v").cast("string")), 1, 12).as("hv"), col("v")))
    }
    time("cents+conv only") {
      noop(vals.select(conv(lpad(hex(col("v")), 12, "0"), 16, 10).cast("long").as("hv"), col("v")))
    }
    time("cents+xxhash64") {
      noop(vals.select(xxhash64(col("v")).as("hv"), col("v")))
    }
    time("cents+cast-string") {
      noop(vals.select(col("v").cast("string").as("hv"), col("v")))
    }
    time("q74 full") {
      noop(graft.operators.Sketches.kmvQuantiles(
        tbl("lineitem").select(cents(col("l_extendedprice")).as("price_cents")),
        "price_cents", k = 512, preAggregate = false))
    }
    time("q85 full") {
      val docs = tbl("documents")
      noop(graft.operators.llm.TextAnalysis.dsirScore(
        docs, "doc_id", "text",
        docs.where(col("lang") === "en"), "text"))
    }
    time("q88 full") {
      noop(graft.operators.llm.TextAnalysis.bigramFluency(
        tbl("documents"), "doc_id", "text"))
    }
    time("q91 full") {
      noop(graft.operators.llm.CorpusModels.nbQualityScore(
        tbl("documents").withColumn("label",
          expr("CAST(substring(source, 4, 8) AS INT) % 2 = 0")),
        "doc_id", "text", "label"))
    }
    time("q88 explode only") {
      noop(graft.operators.llm.Shingles.explodeShingles(
        tbl("documents"), "doc_id", "text", 2)
        .select(col("doc_id"), xxhash64(col("shingle")).as("__gh"),
          xxhash64(substring_index(col("shingle"), " ", 1)).as("__wh")))
    }
    def q(name: String): Unit =
      time(name) { noop(graft.SparkEntry.queries(name)(spark, sfDir)) }
    Seq("q43_ann_ivf_assign", "q94_collocation", "q81_semdedup",
      "q86_curation_pipeline", "q90_substring_dedup", "q72_decontaminate",
      "q84_dup_fraction", "q82_heavy_hitters", "q83_gopher_quality",
      "q69_dedup_keep", "q21_minhash_lsh", "q52_neardup_components",
      "q70_cosine_neardup", "q95_bpe_apply", "q60_tfidf",
      "q77_chunk_dedup", "q36_embed_neardup", "q109_kmv_setops",
      "q108_dsir_select").foreach(q)
    time("q114_bm25") {
      noop(graft.SparkEntry.queries("q114_bm25")(spark, sfDir))
    }
    time("q114 builder only") {
      graft.SparkEntry.queries("q114_bm25")(spark, sfDir)
    }
    locally {
      val built = graft.SparkEntry.queries("q114_bm25")(spark, sfDir)
      time("q114 noop of built") { noop(built) }
    }
    locally {
      import spark.implicits._
      val docs = tbl("documents")
      val tf = docs.select(col("doc_id").cast("long").as("__doc"),
          explode(split(col("text"), " ", -1)).as("__t"))
        .where(col("__t") =!= "")
        .groupBy(col("__doc"), col("__t")).agg(count(lit(1)).as("__tf"))
        .localCheckpoint(eager = false)
      time("q114 qPairs collect") {
        docs.where(col("doc_id") % 97 === 0)
          .select(col("doc_id").cast("long").as("__q"),
            explode(slice(split(col("text"), " ", -1), 1, 5)).as("__t"))
          .where(col("__t") =!= "").distinct()
          .as[(Long, String)].collect()
      }
      val terms = docs.where(col("doc_id") % 97 === 0)
        .select(explode(slice(split(col("text"), " ", -1), 1, 5)).as("__t"))
        .where(col("__t") =!= "").distinct().as[String].collect().toSeq
      time("q114 dft collect (tf mat)") {
        tf.where(col("__t").isin(terms: _*))
          .groupBy(col("__t")).agg(count(lit(1)).as("c")).collect()
      }
      time("q114 totals collect") {
        tf.groupBy(col("__doc")).agg(sum(col("__tf")).as("__dl"))
          .agg(count(lit(1)), sum(col("__dl"))).collect()
      }
      time("q114 slice+join+agg") {
        val dl = tf.groupBy(col("__doc")).agg(sum(col("__tf")).as("__dl"))
        val qt = Seq((1L, "the"), (2L, "a")).toDF("__q", "__t")
        noop(tf.where(col("__t").isin(terms: _*))
          .join(broadcast(qt), "__t")
          .join(dl, "__doc")
          .groupBy(col("__q"), col("__doc"))
          .agg(sum(col("__tf")).as("score"), count(lit(1)).as("n_terms")))
      }
    }
    locally {
      val docs = tbl("documents")
      val tf = docs.select(col("doc_id").cast("long").as("__doc"),
          explode(split(col("text"), " ", -1)).as("__t"))
        .where(col("__t") =!= "")
        .groupBy(col("__doc"), col("__t")).agg(count(lit(1)).as("__tf"))
      time("q114 tf only") { noop(tf) }
      val qterms = docs.where(col("doc_id") % 97 === 0)
        .select(col("doc_id").cast("long").as("__q"),
          explode(slice(split(col("text"), " ", -1), 1, 5)).as("__t"))
        .where(col("__t") =!= "").distinct()
      time("q114 hits only") { noop(tf.join(broadcast(qterms), "__t")) }
    }
    println("[diag] ---- q21 decomposition ----")
    locally {
      import graft.operators.llm.MinHashLsh
      val docs = tbl("documents").select(col("doc_id"), col("text"))
        .repartition(32)
      val sh = graft.operators.llm.Shingles
        .explodeShingles(docs, "doc_id", "text", 3)
      time("q21 shingles only") { noop(sh) }
      time("q21 + hashPool") {
        noop(sh.select(col("doc_id"),
          MinHashLsh.hashPool(col("shingle"), 20).as("__pool")))
      }
      time("q21 + signature agg") {
        noop(MinHashLsh.signature(sh, "doc_id", 20))
      }
      time("q21 + bands") {
        noop(MinHashLsh.bands(
          MinHashLsh.signature(sh, "doc_id", 20), "doc_id", 20, 5))
      }
      time("q21 full") {
        noop(graft.SparkEntry.queries("q21_minhash_lsh")(spark, sfDir))
      }
      time("q17 full") {
        noop(graft.SparkEntry.queries("q17_crawl_log")(spark, sfDir))
      }
      val e = tbl("events")
      val line = concat_ws(" ",
        date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss'Z'"),
        when(col("event_type") === "error", "503").otherwise(lit("200")),
        when(col("event_type") === "signup", lit("-"))
          .otherwise(round(col("value") * 100).cast("long").cast("string")),
        concat(lit("http://example.com/u/"), col("user_id"), lit("/e/"),
          col("event_id")),
        lit("LLP"), lit("-"), lit("text/html"),
        concat(lit("#"), (col("user_id") % 10)),
        when(col("event_type") === "error", lit("-"))
          .otherwise(concat(date_format(col("ts"), "yyyyMMddHHmmss"),
            lit("+"), round(col("value")).cast("long"))),
        lit("sha1:ABC"), lit("-"), lit("-"))
      val narrow = e.select(col("ts"), col("event_type"), col("value"),
        col("user_id"), col("event_id"))
      time("q17 render only") { noop(narrow.select(line.as("line"))) }
      time("q17 render+repart") {
        noop(narrow.repartition(32).select(line.as("line")))
      }
      time("q17 parse only") {
        val rendered = narrow.repartition(32).select(line.as("line"))
        noop(graft.model.CrawlLog.fromLines(rendered)
          .select(col("uri"), col("status"), col("size"),
            col("fetch_start"), col("fetch_duration")))
      }
    }
    println("[diag] ---- q81 decomposition ----")
    time("q81 lloyd only") {
      noop(graft.operators.llm.KMeans.lloyd(
        tbl("embeddings"), "vec_id", "embedding",
        seedPred = col("vec_id") < 8, iters = 3, localBelow = 100000L))
    }
    time("q81 lloyd+join+pairs") {
      val emb = tbl("embeddings")
      val clusters = graft.operators.llm.KMeans.lloyd(
        emb, "vec_id", "embedding", seedPred = col("vec_id") < 8, iters = 3,
        localBelow = 100000L)
      noop(graft.operators.llm.AnnOps.withinBucketCosinePairs(
        emb.join(clusters, "vec_id"), "vec_id", "embedding", "cluster",
        minCos2Bp = 500L))
    }
    spark.stop()
  }
}
