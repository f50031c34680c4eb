package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.llm.{CorpusModels, TextAnalysis}

class CorpusModelsSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  // ---------------------------------------------------------------- q90
  test("substringDedup: later occurrence of a k-word span is removed, first survives") {
    // doc 1 owns the span; doc 2 repeats it verbatim inside fresh text.
    val span = (1 to 5).map(i => s"s$i").mkString(" ")
    val df = Seq(
      (1L, s"alpha $span omega"),
      (2L, s"pre1 pre2 $span post1 post2")).toDF("doc_id", "text")
    val got = TextAnalysis.substringDedup(df, "doc_id", "text", k = 5)
      .select("doc_id", "n_kept", "n_dropped", "clean_text")
      .as[(Long, Int, Int, String)].collect()
      .map { case (d, k2, dr, t) => d -> ((k2, dr, t)) }.toMap
    assert(got(1L) == ((7, 0, s"alpha $span omega")))
    assert(got(2L) == ((4, 5, "pre1 pre2 post1 post2")))
  }

  test("substringDedup: overlapping duplicated grams drop a long span once") {
    // doc 2 duplicates an 8-word span; with k=5 its four 5-grams overlap —
    // covered positions union to exactly the 8 duplicated words.
    val span = (1 to 8).map(i => s"w$i").mkString(" ")
    val df = Seq(
      (1L, span),
      (2L, s"x1 x2 $span")).toDF("doc_id", "text")
    val got = TextAnalysis.substringDedup(df, "doc_id", "text", k = 5)
      .select("doc_id", "n_dropped", "clean_text")
      .as[(Long, Int, String)].collect()
      .map { case (d, dr, t) => d -> ((dr, t)) }.toMap
    assert(got(1L) == ((0, span)))
    assert(got(2L) == ((8, "x1 x2")))
  }

  test("substringDedup: within-document repetition keeps only the first copy") {
    val df = Seq(
      (1L, "r1 r2 r3 r4 mid r1 r2 r3 r4")).toDF("doc_id", "text")
    val got = TextAnalysis.substringDedup(df, "doc_id", "text", k = 4)
      .select("n_kept", "n_dropped", "clean_text")
      .as[(Int, Int, String)].collect().head
    assert(got == ((5, 4, "r1 r2 r3 r4 mid")))
  }

  test("substringDedup: periodic self-overlap collapses below k (documented)") {
    // "x x x x x x" k=5: the pos-2 gram duplicates pos-1 and its span
    // eats back into the first occurrence — survivor is ONE word, not a
    // verbatim first copy. Pinned as the coverage rule's documented
    // intra-document semantics (cross-document first copies are safe).
    val df = Seq((1L, "x x x x x x")).toDF("doc_id", "text")
    val got = TextAnalysis.substringDedup(df, "doc_id", "text", k = 5)
      .select("n_kept", "clean_text").as[(Int, String)].collect().head
    assert(got == ((1, "x")))
  }

  test("substringDedup: docs shorter than k pass through untouched") {
    val df = Seq((1L, "a b c"), (2L, "a b c")).toDF("doc_id", "text")
    val got = TextAnalysis.substringDedup(df, "doc_id", "text", k = 5)
      .select("doc_id", "n_dropped", "clean_text")
      .as[(Long, Int, String)].collect()
      .map { case (d, dr, t) => d -> ((dr, t)) }.toMap
    assert(got == Map(1L -> ((0, "a b c")), 2L -> ((0, "a b c"))))
  }

  // ---------------------------------------------------------------- q91
  test("nbQualityScore: tokens exclusive to a class pull scores to its pole") {
    val df = Seq(
      (1L, true, "good good good"),
      (2L, true, "good nice"),
      (3L, false, "bad bad awful"),
      (4L, false, "bad awful")).toDF("doc_id", "label", "text")
    val got = CorpusModels.nbQualityScore(df, "doc_id", "text", "label")
      .select("doc_id", "n_tokens", "score_bp", "pred")
      .as[(Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // 'good': 4 pos of 4 → (10000*5)/6 = 8333; 'nice': (10000*2)/3 = 6666
    assert(got(1L) == ((3L, 8333L, true)))
    assert(got(2L) == ((2L, (8333L + 6666L) / 2, true)))
    // 'bad': 0 pos of 3 → 10000/5 = 2000; 'awful': 0 pos of 2 → 10000/4 = 2500
    assert(got(3L)._2 < 5000L && !got(3L)._3)
    assert(got(4L) == ((2L, (2000L + 2500L) / 2, false)))
  }

  // ---------------------------------------------------------------- q93
  test("bpePairCounts: frequency-weighted pair counts with deterministic order") {
    val df = Seq("low low lower", "lowest").toDF("text")
    val got = CorpusModels.bpePairCounts(df, "text", topK = 3)
      .as[(String, Long)].collect().toSeq
    // 'lo' and 'ow' appear in all 4 words; tie broken lexicographically.
    assert(got.take(2) == Seq(("lo", 4L), ("ow", 4L)))
  }

  test("bpeTrain: greedy merges follow max-count with lexicographic ties") {
    val df = Seq("aaab aaab ab").toDF("text")
    // pairs over {aaab:2, ab:1}: (a,a)=4, (a,b)=3 → merge1 = (a,a).
    // then words {(aa,a,b):2,(a,b):1}: (aa,a)=2, (a,b)=3... wait (aa,a)=2,
    // (a,b)=1, (aa, b)? no — (aa,a)=2 and (a,b) appears in 'ab' once and
    // in 'aa|a|b' once = 2 with tie → (a,b) < (aa,a) lexicographically.
    val merges = CorpusModels.bpeTrain(df, "text", nMerges = 2)
    assert(merges.head == (("a", "a")))
    assert(merges.size == 2)
    // step-2 candidates from {[aa,a,b]:2, [a,b]:1}: (aa,a)→2, (a,b)→1+2=3
    assert(merges(1) == (("a", "b")))
  }

  test("bpeTrain symbols are CODE POINTS, so apply's '(.)' spacing can " +
      "consume every trained merge (supplementary chars stay whole)") {
    // 🙂 is a supplementary char (2 UTF-16 code units); split("") would
    // have trained surrogate-half symbols that bpeApply can never match
    val word = "a🙂"   // "a🙂"
    val df = Seq(s"$word $word").toDF("text")
    val merges = CorpusModels.bpeTrain(df, "text", nMerges = 1)
    assert(merges == Seq(("a", "🙂")),
      s"expected a whole-code-point merge, got $merges")
    // and the apply side actually consumes it: 1 token per word, not 2
    val applied = CorpusModels.bpeApply(
      Seq((1L, s"$word $word")).toDF("doc_id", "text"),
      "doc_id", "text", merges)
      .select("n_words", "n_tokens").as[(Long, Long)].collect().head
    assert(applied == ((2L, 2L)),
      s"merge must collapse each word to ONE token, got $applied")
  }

  test("bpeTrain: stops early when no pairs remain") {
    val df = Seq("ab ab").toDF("text")
    val merges = CorpusModels.bpeTrain(df, "text", nMerges = 10)
    // merge1 = (a,b); after that every word is one symbol — no more pairs.
    assert(merges == Seq(("a", "b")))
  }

  // ---------------------------------------------------------------- q98
  test("overlapChunks: stride windows, overlap, partial tail") {
    val text = (1 to 10).map(i => s"w$i").mkString(" ")
    val got = CorpusModels.overlapChunks(
      Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text",
      chunkWords = 6, stride = 4)
      .select("chunk_idx", "n_words", "chunk_text")
      .as[(Long, Long, String)].collect().sortBy(_._1)
    // starts at 1, 5, 9: [w1..w6], [w5..w10], [w9, w10]
    assert(got.toSeq == Seq(
      (0L, 6L, "w1 w2 w3 w4 w5 w6"),
      (1L, 6L, "w5 w6 w7 w8 w9 w10"),
      (2L, 2L, "w9 w10")))
  }

  test("overlapChunks: doc shorter than one window is a single chunk") {
    val got = CorpusModels.overlapChunks(
      Seq((1L, "a b")).toDF("doc_id", "text"), "doc_id", "text",
      chunkWords = 64, stride = 48)
      .select("chunk_idx", "chunk_text").as[(Long, String)].collect()
    assert(got.toSeq == Seq((0L, "a b")))
  }

  // ---------------------------------------------------------------- q99
  test("tokenDrift: removed tokens drift down, enriched tokens drift up") {
    val oldDf = (Seq.fill(10)("keep keep gone") ++ Seq.fill(10)("keep"))
      .toDF("text")
    val newDf = Seq.fill(20)("keep keep").toDF("text")
    val got = CorpusModels.tokenDrift(oldDf, newDf, "text",
      minCount = 5L, topK = 10)
      .select("token", "ratio_bp").as[(String, Long)].collect().toMap
    // 'gone': c_old=10, c_new=0 -> ratio near 0; 'keep': 30 -> 40 up
    assert(got("gone") < 2000L)
    assert(got("keep") > 10000L)
  }

  // --------------------------------------------------------------- q101
  test("epochPlan: proportional allocation, repeat cap, short-stratum repeats") {
    import graft.operators.llm.Sampling
    val df = Seq(
      ("big", 1000L), ("big", 1000L),   // 2000 tokens, weight 100
      ("small", 50L)                     // 50 tokens, weight 300
    ).toDF("source", "n_tok")
    val got = Sampling.epochPlan(df, "source", "n_tok",
      weightBp = when(col("source") === "small", 300L).otherwise(100L),
      budget = 4000L, maxEpochsX100 = 400L)
      .select("source", "n_docs", "n_tokens", "target_tokens", "epochs_x100")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    // wsum=400: big target = 4000*100/400 = 1000 -> 100*1000/2000 = 50
    assert(got("big") == ((2L, 2000L, 1000L, 50L)))
    // small target = 3000 -> 100*3000/50 = 6000, capped at 400 (4 epochs)
    assert(got("small") == ((1L, 50L, 3000L, 400L)))
    // ZERO weight sum: no defined allocation — target and epochs must be
    // NULL, not a DIVIDE_BY_ZERO job failure under ANSI mode, and not a
    // silently-reported cap (r19 review finding)
    val zeroed = Sampling.epochPlan(df, "source", "n_tok",
        weightBp = lit(0L), budget = 4000L)
      .select("target_tokens", "epochs_x100").collect()
    assert(zeroed.length == 2 &&
      zeroed.forall(r => r.isNullAt(0) && r.isNullAt(1)))
  }

  // ---------------------------------------------------------------- q94
  test("collocationLift: exclusive pair ranks above promiscuous pair") {
    // 'x y' always adjacent and exclusive; 'a b' adjacent but a and b
    // also appear apart — lift must rank (x,y) first.
    val rows = Seq.fill(5)("x y a b") ++ Seq.fill(5)("a c b d")
    val got = CorpusModels.collocationLift(
      rows.toDF("text"), "text", minCount = 5, topK = 10)
      .select("w1", "w2", "lift_bp").as[(String, String, Long)].collect()
    assert(got.head._1 == "x" && got.head._2 == "y")
    val lifts = got.map(r => (r._1, r._2) -> r._3).toMap
    assert(lifts(("x", "y")) > lifts(("a", "b")))
  }

  test("bm25TopK matches a BigInt brute force; self-query ranks its own " +
      "doc first") {
    val corpus = Seq(
      (0L, "apple banana cherry apple"),
      (1L, "banana banana durian"),
      (2L, "cherry durian elderberry fig grape"),
      (3L, "apple apple apple banana"),
      (4L, "unrelated words only here"))
    val docs = corpus.toDF("doc_id", "text")
    val queries = Seq((0L, "apple banana"), (2L, "cherry durian"))
      .toDF("query_id", "qtext")
    val got = CorpusModels.bm25TopK(docs, "doc_id", "text",
        queries, "query_id", "qtext", k = 3)
      .orderBy("query_id", "rank")
      .select("query_id", "rank", "doc_id", "n_terms", "score")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq

    // brute force with the exact integer formula
    val toks = corpus.map { case (d, t) => d -> t.split(" ").toSeq }.toMap
    val n = toks.size.toLong
    val a = toks.values.map(_.size.toLong).sum
    def score(qTerms: Seq[String], d: Long): (Long, Long) = {
      val tfm = toks(d).groupBy(identity).map { case (t, o) => t -> o.size.toLong }
      val dl = toks(d).size.toLong
      val terms = qTerms.distinct.filter(tfm.contains)
      val avg100 = (100L * a) / n
      val s = terms.map { t =>
        val df = toks.values.count(_.contains(t)).toLong
        val idf = (10000L * (n - df + 1)) / (df + 1)
        val tf = tfm(t)
        val sat = (10000L * tf * 88 * avg100) /
          (tf * 40 * avg100 + 12 * (avg100 + 300 * dl))
        (BigInt(idf) * sat / 10000).toLong
      }.sum
      (s, terms.size.toLong)
    }
    val expected = Seq((0L, Seq("apple", "banana")), (2L, Seq("cherry", "durian")))
      .flatMap { case (q, ts) =>
        val ranked = corpus.map(_._1)
          .map(d => (d, score(ts, d))).filter(_._2._2 > 0)
          .sortBy { case (d, (s, _)) => (-s, d) }.take(3)
        ranked.zipWithIndex.map { case ((d, (s, nt)), i) =>
          (q, (i + 1).toLong, d, nt, s) }
      }
    assert(got == expected)
    // retrieval sanity: query 0's winner is doc 3 (three "apple"
    // occurrences beat doc 0's two in a same-length doc — tf
    // saturation, not raw counts, but 3 > 2 still wins); query 2's
    // winner is its own source doc; the no-overlap doc 4 never appears
    assert(got.filter(_._2 == 1L).map(r => (r._1, r._3)) ==
      Seq((0L, 3L), (2L, 2L)))
    assert(!got.exists(_._3 == 4L))
  }

  test("bm25TopK gram=2: phrase order matters — the exact-phrase doc " +
      "outranks the bag-of-words doc; index reuse across query batches") {
    val docs = Seq(
      (0L, "red fox jumps high today"),
      (1L, "fox red and jumps never fox"),   // both words, wrong order
      (2L, "red fox red fox red fox"),       // exact phrase, thrice
      (3L, "entirely different content here")).toDF("doc_id", "text")
    val idx = CorpusModels.bm25Index(docs, "doc_id", "text", gram = 2)
    val q1 = Seq((10L, "red fox")).toDF("query_id", "qtext")
    val r1 = CorpusModels.bm25Query(idx, q1, "query_id", "qtext",
        k = 4, idCol = "doc_id")
      .orderBy("rank").select("doc_id").as[Long].collect().toSeq
    // only docs containing the BIGRAM "red fox" are candidates at all
    assert(r1.toSet == Set(0L, 2L))
    assert(r1.head == 2L) // higher tf of the phrase wins
    // the same index serves a second query batch
    val q2 = Seq((11L, "jumps never")).toDF("query_id", "qtext")
    val r2 = CorpusModels.bm25Query(idx, q2, "query_id", "qtext",
        k = 4, idCol = "doc_id")
      .select("doc_id").as[Long].collect().toSeq
    assert(r2 == Seq(1L))
  }

  test("bm25Query distributed path (pairs past driverPairLimit) equals " +
      "the driver-literal path row for row") {
    val docs = Seq(
      (0L, "apple banana cherry apple"),
      (1L, "banana banana durian"),
      (2L, "cherry durian elderberry fig grape"),
      (3L, "apple apple apple banana"),
      (4L, "unrelated words only here")).toDF("doc_id", "text")
    val queries = Seq(
      (0L, "apple banana"), (1L, "cherry durian"),
      (2L, "banana fig grape"), (3L, "elderberry apple nonword"))
      .toDF("query_id", "qtext")
    val idx = CorpusModels.bm25Index(docs, "doc_id", "text")
    def run(limit: Int): Seq[(Long, Long, Long, Long, Long)] =
      CorpusModels.bm25Query(idx, queries, "query_id", "qtext",
          k = 3, idCol = "doc_id", driverPairLimit = limit)
        .orderBy("query_id", "rank")
        .select("query_id", "rank", "doc_id", "n_terms", "score")
        .as[(Long, Long, Long, Long, Long)].collect().toSeq
    val local = run(8192)      // all pairs fit on the driver
    val distributed = run(1)   // forces the distributed pair table
    assert(local.nonEmpty)
    assert(distributed == local)
    // the caller-supplied driver-fold bound is clamped LOUDLY: past
    // 65536 the right move is the distributed regime, not a bigger
    // driver collect — the guard must name that
    val e = intercept[IllegalArgumentException](run(65537))
    assert(e.getMessage.contains("distributed regime"))
    assert(e.getMessage.contains("65536"))
    intercept[IllegalArgumentException](run(-1))
  }

  test("fused one-shot bm25TopK (r22: merged totals+df(t) job, shuffle-" +
      "free occurrence probe) equals bm25Index+bm25Query row for row") {
    val docs = Seq(
      (0L, "red fox jumps high today"),
      (1L, "fox red and jumps never fox"),
      (2L, "red fox red fox red fox"),
      (3L, " leading space  double"), // empty words exercise the toks filter
      (4L, "entirely different content here")).toDF("doc_id", "text")
    val queries = Seq((10L, "red fox"), (11L, "jumps never"),
      (12L, "nonword only")).toDF("query_id", "qtext")
    for (gram <- Seq(1, 2)) {
      val fused = CorpusModels.bm25TopK(docs, "doc_id", "text",
          queries, "query_id", "qtext", k = 4, gram = gram)
        .orderBy("query_id", "rank")
        .select("query_id", "rank", "doc_id", "n_terms", "score")
        .as[(Long, Long, Long, Long, Long)].collect().toSeq
      val unfused = CorpusModels.bm25Query(
          CorpusModels.bm25Index(docs, "doc_id", "text", gram = gram),
          queries, "query_id", "qtext", k = 4, idCol = "doc_id")
        .orderBy("query_id", "rank")
        .select("query_id", "rank", "doc_id", "n_terms", "score")
        .as[(Long, Long, Long, Long, Long)].collect().toSeq
      assert(fused.nonEmpty, s"gram=$gram")
      assert(fused == unfused, s"gram=$gram")
    }
    // empty query set: same empty frame (schema + zero rows)
    val empty = CorpusModels.bm25TopK(docs, "doc_id", "text",
      queries.where(lit(false)), "query_id", "qtext", k = 4)
    assert(empty.columns.toSeq ==
      Seq("query_id", "rank", "doc_id", "n_terms", "score"))
    assert(empty.count() == 0)
    // occurrence-probe overflow (> 8192 query-term occurrences): the
    // fused entry falls back to the indexed path — results identical
    // to the driver-regime answer for the same effective term set
    val bigQ = Seq((20L, (0 until 8200).map(_ => "red fox").mkString(" ")))
      .toDF("query_id", "qtext")
    val viaFallback = CorpusModels.bm25TopK(docs, "doc_id", "text",
        bigQ, "query_id", "qtext", k = 4)
      .orderBy("rank").select("doc_id").as[Long].collect().toSeq
    val viaIndex = CorpusModels.bm25Query(
        CorpusModels.bm25Index(docs, "doc_id", "text"),
        bigQ, "query_id", "qtext", k = 4, idCol = "doc_id")
      .orderBy("rank").select("doc_id").as[Long].collect().toSeq
    assert(viaFallback == viaIndex && viaFallback.nonEmpty)
  }

  test("bm25: DECIMAL fallback branch (coefficients past int64) matches " +
      "the BigInt formula exactly") {
    // k1/b chosen so cNum = 1e4·(k1n+k1d)·bd·avg100 overflows int64 →
    // every row takes the DECIMAL(38,0) replay of the saturation; the
    // expected scores come from the identical formula in BigInt
    val corpus = Seq(
      (0L, "apple banana cherry apple"),
      (1L, "banana banana durian"),
      (2L, "apple apple apple banana"))
    val docs = corpus.toDF("doc_id", "text")
    val queries = Seq((0L, "apple banana")).toDF("query_id", "qtext")
    val k1n = Int.MaxValue; val k1d = 1; val bn = 0; val bd = Int.MaxValue
    val got = CorpusModels.bm25TopK(docs, "doc_id", "text",
        queries, "query_id", "qtext", k = 3,
        k1Num = k1n, k1Den = k1d, bNum = bn, bDen = bd)
      .orderBy("rank")
      .select("query_id", "rank", "doc_id", "n_terms", "score")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    val toks = corpus.map { case (d, t) => d -> t.split(" ").toSeq }.toMap
    val n = toks.size.toLong
    val avg100 = (100L * toks.values.map(_.size.toLong).sum) / n
    val cNum = BigInt(10000) * (BigInt(k1n) + k1d) * bd * avg100
    assert(cNum > BigInt(Long.MaxValue)) // the premise: fast path is off
    val cTf = BigInt(k1d) * bd * avg100
    val cConst = BigInt(k1n) * (bd - bn) * avg100
    val cDl = BigInt(100) * bn * k1n
    def score(qTerms: Seq[String], d: Long): (Long, Long) = {
      val tfm = toks(d).groupBy(identity)
        .map { case (t, o) => t -> o.size.toLong }
      val dl = BigInt(toks(d).size)
      val terms = qTerms.distinct.filter(tfm.contains)
      val s = terms.map { t =>
        val df = toks.values.count(_.contains(t)).toLong
        val idf = (10000L * (n - df + 1)) / (df + 1)
        val sat = (cNum * tfm(t)) / (cTf * tfm(t) + cConst + cDl * dl)
        (BigInt(idf) * sat / 10000).toLong
      }.sum
      (s, terms.size.toLong)
    }
    val expected = corpus.map(_._1)
      .map(d => (d, score(Seq("apple", "banana"), d)))
      .sortBy { case (d, (s, _)) => (-s, d) }
      .zipWithIndex.map { case ((d, (s, nt)), i) =>
        (0L, (i + 1).toLong, d, nt, s) }
    assert(got == expected)
  }
}
