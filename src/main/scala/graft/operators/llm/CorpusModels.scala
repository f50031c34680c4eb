package graft.operators.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Operators that FIT a small model / statistic from a corpus and apply it
 * back — the "train a filter from the data" steps of an LLM curation
 * pipeline (fastText-style quality classifiers, BPE vocabulary learning,
 * collocation mining). All arithmetic is integer basis points (the q88
 * convention): per-token weights are exact BIGINT ratios, so any engine —
 * the DuckDB oracle included — replays scores bit-for-bit, with no
 * cross-engine float drift and no log() in results.
 *
 * Scale shape: each fit is one or two map-side-combinable aggregations
 * over the corpus; the fitted artifact (vocab weights, merge table, pair
 * table) is orders of magnitude smaller than the corpus — the same
 * asymmetry fastText / SentencePiece exploit single-node, kept here as
 * "aggregate distributed, fit on the aggregate".
 */
object CorpusModels {

  /** Naive-Bayes-flavored quality classifier, trained and applied in one
    * plan (the CCNet / fastText quality-filter step: fit per-token
    * class odds on labeled documents, score every document by its
    * tokens' aggregate odds).
    *
    * Per-token weight = add-one-smoothed positive rate in basis points:
    * `w(t) = (10000 * (n_pos(t) + 1)) div (n(t) + 2)` — exact integer.
    * Document score = token-count-weighted mean weight (integer div);
    * `pred` = score ≥ 5000 bp.
    *
    * Scale shape: the vocab fit is a map-side-combinable aggregation
    * whose wire is per-partition-distinct-token partials (Zipfian text
    * collapses hard under combine — vocab-scale, not corpus-scale);
    * the scoring join is declared unhinted so AQE picks its physical
    * form from the FIT'S ACTUAL SIZE at runtime: a broadcast hash join
    * when the vocabulary is small (zero corpus-scale exchanges in the
    * whole plan), the one corpus-scale token exchange + shuffle join
    * when it is web-scale; the per-doc score is then one
    * map-side-combinable aggregation whose wire is one row per doc. */
  def nbQualityScore(df: DataFrame, idCol: String, textCol: String,
                     labelCol: String): DataFrame = {
    // r14 adjudication of the two-round q91 drift (0.281 -> 0.368 ->
    // 0.468 s committed): same-JVM min-of-3 at sf0.1 read
    //   colocated repartition(__tok) (r13 shape)   0.688 s  5 jobs
    //   colocated + shuffle_hash hint              0.566 s  4 jobs
    //   no repartition, broadcast hint             0.373 s  4 jobs
    //   no repartition, AQE decides   (this shape) 0.345 s  4 jobs
    // (anchor q74 0.715 s in the same JVM, battery 0.511 — host factor
    // ~1.4, so ~0.25 s battery-equivalent). The r13 colocation bought
    // its single exchange by shuffling RAW occurrences — exactly the
    // map-side-combine defeat SCALE.md records for q94: the vocab fit's
    // combine collapses the Zipfian token stream to vocab-sized
    // partials, so the unpartitioned plan moves less wire AND lets AQE
    // broadcast the fitted vocab (the sort-free join) when it is small.
    // The corpus lineage is read twice (fit + score) — scan+explode is
    // pushdown-pruned and strictly cheaper than materializing one full
    // occurrence exchange at any scale we measured.
    // Job-count correction (r15): the steady count for this shape is
    // 5, not the 4 the r14 table recorded — AQE only converts the
    // scoring SMJ to a broadcast join AFTER materializing the vocab
    // fit as its own query stage, so the runtime decision costs one
    // extra stage-job over a static broadcast hint (the hint variant
    // is genuinely 4). The time win is real either way (0.388-0.429 s
    // r15 Diag at anchor q74 0.675 vs 0.688 colocated); the hint was
    // rejected because web-scale vocabularies must not be forced
    // through a broadcast.
    val toks = df.select(col(idCol).cast("long").as("__doc"),
        col(labelCol).cast("boolean").as("__pos"),
        explode(Shingles.words(col(textCol))).as("__tok"))
    val vocab = toks.groupBy(col("__tok"))
      .agg(((sum(when(col("__pos"), 1L).otherwise(0L)) + 1L) * 10000L)
        .as("__num"), (count(lit(1)) + 2L).as("__den"))
      .select(col("__tok"), expr("__num div __den").as("__wbp"))
    toks.join(vocab, "__tok")
      .groupBy(col("__doc"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("__wbp")).as("__wsum"))
      .select(col("__doc").as(idCol), col("n_tokens"),
        expr("__wsum div n_tokens").as("score_bp"),
        expr("(__wsum div n_tokens) >= 5000").as("pred"))
  }

  /** Adjacent-symbol pair counts for ONE BPE merge step (Sennrich et al.
    * 2016): every within-word character bigram, weighted by corpus word
    * frequency, the `topK` most frequent returned (count desc, pair asc —
    * a total order, so the merge choice is deterministic).
    *
    * Scale shape: the corpus collapses to its word-frequency table first
    * (one map-side-combinable groupBy — THE shuffle of this operator);
    * pair explosion then runs over distinct words only (vocab-sized, not
    * corpus-sized), and the final top-k is a TakeOrdered, never a global
    * sort. */
  def bpePairCounts(df: DataFrame, textCol: String, topK: Int): DataFrame =
    df.select(explode(Shingles.words(col(textCol))).as("__w"))
      .where(length(col("__w")) >= 2)
      .groupBy(col("__w")).agg(count(lit(1)).as("__f"))
      .select(col("__f"), explode(expr(
        "transform(sequence(1, length(__w) - 1), " +
          "i -> substring(__w, i, 2))")).as("pair"))
      .groupBy(col("pair")).agg(sum(col("__f")).as("n"))
      .orderBy(desc("n"), asc("pair")).limit(topK)

  /** Full BPE merge-table learning: `nMerges` greedy merges, each taking
    * the most frequent adjacent symbol pair (ties: lexicographically
    * smallest pair) over the frequency-weighted vocabulary.
    *
    * The corpus is scanned ONCE, distributed, into its word-frequency
    * table; the merge loop then runs on that aggregate locally — at 100 TB
    * the corpus is ~10^12 words but its vocabulary is ~10^7 rows, so the
    * iterate-on-the-aggregate shape (exactly how SentencePiece/HF train
    * single-node from a counted vocab) is the scalable design, not a
    * shortcut; an iterative distributed re-scan per merge would read the
    * corpus `nMerges` times for no added information. */
  def bpeTrain(df: DataFrame, textCol: String, nMerges: Int): Seq[(String, String)] = {
    val vocab: Array[(Array[String], Long)] =
      df.select(explode(Shingles.words(col(textCol))).as("w"))
        .where(length(col("w")) >= 1)
        .groupBy("w").agg(count(lit(1)).as("f"))
        .collect()
        .map(r => (codePointSymbols(r.getString(0)), r.getLong(1)))
    var words = vocab
    val merges = Seq.newBuilder[(String, String)]
    var step = 0
    var done = false
    while (step < nMerges && !done) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      for ((syms, f) <- words; i <- 0 until syms.length - 1)
        counts.updateWith((syms(i), syms(i + 1)))(c => Some(c.getOrElse(0L) + f))
      if (counts.isEmpty) done = true
      else {
        val best = counts.keys.minBy { case (a, b) => (-counts((a, b)), a, b) }
        merges += best
        val merged = best._1 + best._2
        words = words.map { case (syms, f) =>
          val out = Array.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == best._1 && syms(i + 1) == best._2) {
              out += merged; i += 2
            } else { out += syms(i); i += 1 }
          }
          (out.result(), f)
        }
        step += 1
      }
    }
    merges.result()
  }

  /** Split a word into CODE-POINT symbols — `split("")` would split
    * UTF-16 code units, training surrogate-half merge symbols that
    * [[bpeApply]]'s code-point spacing (regex `(.)`) can never match;
    * supplementary characters (emoji, rare CJK) must stay whole so
    * train and apply share one symbol alphabet. */
  private[llm] def codePointSymbols(w: String): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < w.length) {
      val n = Character.charCount(w.codePointAt(i))
      out += w.substring(i, i + n)
      i += n
    }
    out.result()
  }

  /** Apply a trained BPE merge table (the [[bpeTrain]] output, in
    * production an offline artifact) and count the resulting tokens per
    * document — the "how many tokens under MY tokenizer" signal a
    * training pipeline bills by, exact under the learned vocab rather
    * than the whitespace/regex approximations of tokenCount.
    *
    * Representation: each word becomes a double-space-separated symbol
    * string with a leading/trailing double space (`"ab" → "  a  b  "`);
    * merge (a, b) is then the literal replace `" a  b " → " ab "`.
    * The surrounding single spaces anchor complete symbols (no
    * mid-symbol false matches), and because each match consumes only
    * ONE space of each side's double-space gap, adjacent matches stay
    * replaceable — left-to-right non-overlapping replace (the shared
    * semantics of Spark's `replace` and any SQL engine's) then merges
    * runs correctly. The whole chain is a fixed composition of literal
    * string replaces, so an external oracle replays it byte-for-byte.
    *
    * Scale shape: pure map-side (explode words → replace chain → count
    * symbols → per-doc sum is one map-side-combinable aggregation; one
    * shuffle of (doc, partial count) rows). For very hot vocabularies a
    * caller can memoize per DISTINCT word (vocab-sized aggregation +
    * broadcast join back) — not done here because the replace chain is
    * already codegen'd and cheap relative to a second exchange.
    * Output: (idCol, n_words, n_tokens, tokens_per_100w). */
  def bpeApply(df: DataFrame, idCol: String, textCol: String,
               merges: Seq[(String, String)]): DataFrame = {
    require(merges.nonEmpty, "empty merge table")
    require(merges.forall { case (a, b) =>
      a.nonEmpty && b.nonEmpty && !a.contains(' ') && !b.contains(' ') },
      "merge symbols must be non-empty and space-free")
    val spaced = concat(lit(" "),
      regexp_replace(col("__word"), "(.)", " $1 "), lit(" "))
    // NOT regexp_replace: merge symbols are literal text, and e.g. a
    // learned merge of "." or "(" would otherwise be a regex
    val merged = merges.foldLeft(spaced) { case (acc, (a, b)) =>
      org.apache.spark.sql.functions.replace(
        acc, lit(s" $a  $b "), lit(s" ${a + b} "))
    }
    df.select(col(idCol),
        explode(Shingles.words(col(textCol))).as("__word"))
      .where(col("__word") =!= "")
      .select(col(idCol),
        size(split(trim(merged), "  ", -1)).cast("long").as("__ntok"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"), sum(col("__ntok")).as("n_tokens"))
      .select(col(idCol), col("n_words"), col("n_tokens"),
        expr("(100 * n_tokens) div n_words").as("tokens_per_100w"))
  }

  /** Overlapping window chunking — the RAG/embedding-pipeline splitter:
    * chunk i covers words [i·stride+1, i·stride+chunkWords], windows
    * overlap by chunkWords−stride words, the final partial window is
    * kept (its text is the retrieval context for the document tail).
    * Pure map-side (one transform+slice per doc, one posexplode); at
    * 100 TB this is a projection stage, zero shuffle. Returns
    * (idCol, chunk_idx, n_words, chunk_text). */
  def overlapChunks(df: DataFrame, idCol: String, textCol: String,
                    chunkWords: Int, stride: Int): DataFrame = {
    require(chunkWords >= 1, s"chunkWords must be >= 1, got $chunkWords")
    require(stride >= 1 && stride <= chunkWords,
      s"stride must be in [1, chunkWords], got $stride")
    df.select(col(idCol), Shingles.words(col(textCol)).as("__w"))
      .select(col(idCol), posexplode(expr(
        // last chunk starts at the largest i*stride+1 <= len
        s"transform(sequence(0, cast((size(__w) - 1) div $stride AS INT)), " +
          s"i -> array_join(slice(__w, i * $stride + 1, $chunkWords), ' '))"))
        .as(Seq("chunk_idx", "chunk_text")))
      .select(col(idCol), col("chunk_idx").cast("long").as("chunk_idx"),
        size(split(col("chunk_text"), " ", -1)).cast("long").as("n_words"),
        col("chunk_text"))
  }

  /** Unigram-distribution drift between two corpus versions — the
    * monitoring op a pipeline runs per snapshot: per-token ratio of
    * relative frequencies in integer basis points,
    * `ratio_bp = (10000 · c_new · N_old) div (c_old · N_new)`
    * (DECIMAL(38,0)-widened: both products overflow int64 at the
    * 10^12-token design point), add-one smoothing so tokens present in
    * only one version stay finite, deviation `|ratio − 10000|` ranks
    * the most-drifted tokens under a deterministic total order.
    *
    * Scale shape: two map-side-combinable token counts, one vocab-keyed
    * full-outer merge (vocab-sized, not corpus-sized), totals ride the
    * plan as 1-row broadcasts, final top-k is a TakeOrdered. */
  def tokenDrift(oldDf: DataFrame, newDf: DataFrame, textCol: String,
                 minCount: Long, topK: Int): DataFrame = {
    def counts(df: DataFrame, out: String): DataFrame =
      df.select(explode(Shingles.words(col(textCol))).as("token"))
        .where(col("token") =!= "")
        .groupBy(col("token")).agg(count(lit(1)).as(out))
    val c1 = counts(oldDf, "c_old")
    val c2 = counts(newDf, "c_new")
    val merged = c1.join(c2, Seq("token"), "full_outer")
      .select(col("token"), coalesce(col("c_old"), lit(0L)).as("c_old"),
        coalesce(col("c_new"), lit(0L)).as("c_new"))
    val totals = merged.agg(sum(col("c_old")).as("__n1"),
      sum(col("c_new")).as("__n2"))
    merged.where(col("c_old") + col("c_new") >= minCount)
      .crossJoin(broadcast(totals))
      .select(col("token"), col("c_old"), col("c_new"),
        expr("CAST((CAST(10000 AS DECIMAL(38,0)) * (c_new + 1) * __n1) " +
          "DIV (CAST(c_old + 1 AS DECIMAL(38,0)) * __n2) AS BIGINT)")
          .as("ratio_bp"))
      .select(col("token"), col("c_old"), col("c_new"), col("ratio_bp"),
        abs(col("ratio_bp") - 10000L).as("dev_bp"))
      .orderBy(desc("dev_bp"), asc("token")).limit(topK)
  }

  /** Collocation mining by LIFT in basis points — the log-free exact form
    * of PMI ranking (lift = p(xy)/(p(x)p(y)); log of it is PMI, and log
    * is monotone, so ranking by integer lift ranks by PMI with zero
    * cross-engine float risk): `lift_bp = (10000 * n_xy * N) div
    * (n_x * n_y)` over within-document adjacent word pairs, pairs seen
    * < `minCount` times dropped, top `topK` by (lift desc, w1, w2).
    *
    * Scale shape — ONE corpus pass, ONE corpus-scale exchange: every
    * word occurrence is emitted ONCE as (w1, next-word-or-NULL) and
    * reduced straight to (w1, w2) counts with map-side partials; that
    * distinct-bigram-sized table (materialized once — it has three
    * consumers) then yields the bigram counts (w2 NOT NULL rows), the
    * unigram counts (sum over w1: every occurrence of a word appears
    * exactly once as w1, doc-final occurrences in its (w1, NULL) row),
    * and the corpus total — all without touching the corpus again. The
    * unigram table joined twice is vocab-sized (AQE broadcasts it at
    * any realistic scale); the corpus-total N rides the plan as a 1-row
    * cross join (no driver collect); final top-k is a TakeOrdered. The
    * former shape tokenized the corpus on two separate branches and
    * re-derived the whole bigram aggregation for the total — three
    * corpus passes for the same answer. */
  def collocationLift(df: DataFrame, textCol: String,
                      minCount: Int, topK: Int): DataFrame = {
    // (word, following-word-or-NULL): one row per word OCCURRENCE, so
    // unigram counts fold out of the same pre-aggregated table as
    // bigram counts
    val pairCnt = df.select(Shingles.words(col(textCol)).as("__w"))
      .select(explode(expr(
        // size(__w) >= 1 always for split() output, but guard anyway:
        // sequence(1, 0) would DESCEND ([1, 0]) and emit bogus rows
        "CASE WHEN size(__w) < 1 THEN array() ELSE " +
          "transform(sequence(1, size(__w)), " +
          "i -> struct(element_at(__w, i) AS w1, " +
          "CASE WHEN i < size(__w) THEN element_at(__w, i + 1) END AS w2)) " +
          "END")).as("__b"))
      .select(col("__b.w1").as("w1"), col("__b.w2").as("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("n_xy"))
      .localCheckpoint(eager = false)
    val bigrams = pairCnt.where(col("w2").isNotNull)
    val uni = pairCnt.groupBy(col("w1")).agg(sum(col("n_xy")).as("n_w"))
    val total = bigrams.agg(sum(col("n_xy")).as("__n"))
    bigrams.where(col("n_xy") >= minCount)
      .join(uni.select(col("w1"), col("n_w").as("__nx")), "w1")
      .join(uni.select(col("w1").as("w2"), col("n_w").as("__ny")), "w2")
      // broadcast the 1-row aggregate EXPLICITLY (as tokenDrift does):
      // pre-AQE its size stats are unknown and the cross join can plan
      // as a non-broadcast nested loop against the full bigram table
      .crossJoin(broadcast(total))
      .select(col("w1"), col("w2"), col("n_xy"),
        // DECIMAL(38,0) on both sides of the DIV: at the 10^12-word
        // design point 10000·n_xy·N and n_x·n_y both blow through
        // int64 (silent wraparound under non-ANSI Spark, an overflow
        // error in the HUGEINT oracle) — same widening as the AnnOps
        // cosine products; DIV truncation order matches the oracle
        expr("CAST((CAST(10000 AS DECIMAL(38,0)) * n_xy * __n) DIV " +
          "(CAST(__nx AS DECIMAL(38,0)) * __ny) AS BIGINT)").as("lift_bp"))
      .orderBy(desc("lift_bp"), asc("w1"), asc("w2")).limit(topK)
  }

  /** BM25 retrieval scoring (Robertson–Spärck Jones / Okapi), integer-
    * exact: rank the corpus against a benchmark-sized query set — the
    * retrieval primitive behind RAG source selection and dedup-by-
    * retrieval ("which training docs does this eval question pull
    * up?"). Per query term t in doc d:
    *
    *   avgdl_x100 = (100 · A) DIV N          (one global integer)
    *   idf_bp(t)  = (10000 · (N − df + 1)) DIV (df + 1)
    *   sat_bp     = (10000 · tf · (k1n + k1d) · bd · avgdl_x100) DIV
    *                (tf · k1d · bd · avgdl_x100 +
    *                 k1n · ((bd − bn) · avgdl_x100 + 100 · bn · dl))
    *   term score = (idf_bp · sat_bp) DIV 10000,  doc score = Σ terms
    *
    * i.e. the classical tf-saturation fraction cleared of division by
    * multiplying through with k1d·bd·avgdl_x100 (A = total corpus
    * tokens, N = docs, dl = doc length) — every quantity integer,
    * every DIV a deterministic truncation an external engine replays
    * exactly. The IDF is the log-free LIFT form (the monotone-per-term
    * trade of dsirScore/bigramFluency/collocationLift: a sum of
    * integer ratios in place of a sum of float logs — rank-equivalent
    * per term, engine-exact, which the float-log form can never
    * promise). Width handling: sat_bp ≤ 10⁴·(k1n+k1d)/k1d (~22000),
    * but its numerator c·tf (c = 10⁴·(k1n+k1d)·bd·avgdl_x100) exceeds
    * int64 once tf·avgdl ≳ 10¹¹, so the scoring expression guards the
    * int64 fast path with driver-computed row bounds (tf ≤ tfMax,
    * dl ≤ dlMax — every intermediate provably in-range) and falls to a
    * DECIMAL(38,0) replay of the same truncating DIV for the rare
    * pathological row; idf_bp·sat_bp (≤ ~10²⁰ at N = 10¹²) always
    * widens to DECIMAL(38,0) — ONE wide multiply per candidate row, not
    * eight (the all-DECIMAL first cut benched 2.5x slower on that).
    *
    * Scale shape — the decontaminate asymmetry and the retrieval
    * lifecycle: the corpus reduces ONCE ([[bm25Index]]) to its
    * per-(doc, term) tf table and per-doc lengths (map-side combinable
    * — THE corpus exchange, materialized for every later query batch);
    * each [[bm25Query]] collects a benchmark-sized distinct (query,
    * term) pair set to the driver, counts df(t) on the term-filtered
    * index slice only, folds idf/avgdl back as literals riding the
    * broadcast query rows, and scores in one job — while a query set
    * past `driverPairLimit` pairs (decontamination scale: millions of
    * eval queries) keeps the pair table DISTRIBUTED end to end, with
    * idf attached by broadcast join; either way the corpus text never
    * shuffles again. Top-`k` docs per query by (score desc, doc id) —
    * the window runs over candidate rows only (docs sharing ≥ 1 query
    * term). */
  /** The indexed corpus side of [[bm25TopK]]: the per-(doc, term) tf
    * table and per-doc lengths (both materialized once — the index), plus
    * the two global stats. Index ONCE, query many — the retrieval
    * lifecycle; every [[bm25Query]] against the same index reuses the
    * materialized tables and pays only its own candidate slice. */
  final case class Bm25Index(tf: DataFrame, dl: DataFrame,
                             nDocs: Long, avg100: Long, gram: Int)

  private def bm25Toks(d: DataFrame, id: String, text: String,
                       outId: String, gram: Int): DataFrame =
    if (gram == 1)
      d.select(col(id).cast("long").as(outId),
        explode(Shingles.words(col(text))).as("__t"))
        .where(col("__t") =!= "")
    else
      Shingles.explodeShingles(d, id, text, gram)
        .select(col(id).cast("long").as(outId), col("shingle").as("__t"))

  /** Build the BM25 corpus index. `gram > 1` indexes word n-grams as
    * the terms (phrase-sensitive n-gram BM25; dl becomes the doc's gram
    * count) — the right shape when the unigram vocabulary is
    * stopword-dense and unigram df carries no signal. */
  def bm25Index(df: DataFrame, idCol: String, textCol: String,
                gram: Int = 1): Bm25Index = {
    require(gram >= 1, s"gram must be >= 1, got $gram")
    import df.sparkSession.implicits._
    val tf = bm25Toks(df, idCol, textCol, "__doc", gram)
      .groupBy(col("__doc"), col("__t")).agg(count(lit(1)).as("__tf"))
      .localCheckpoint(eager = false) // consumers: dl fold + every query
    val dl = tf.groupBy(col("__doc")).agg(sum(col("__tf")).as("__dl"))
      .localCheckpoint(eager = false) // consumers: totals + every query
    val Array(nDocs, totTok) = dl
      .agg(count(lit(1)), sum(col("__dl"))).as[(Long, Long)].collect()
      .headOption.map(t => Array(t._1, t._2)).getOrElse(Array(0L, 0L))
    Bm25Index(tf, dl, nDocs,
      if (nDocs == 0) 0L else (100L * totTok) / nDocs, gram)
  }

  /** Score `queries` against a prepared [[Bm25Index]]; see [[bm25TopK]]
    * for the formula and the scale shape. */
  def bm25Query(index: Bm25Index, queries: DataFrame,
                qIdCol: String, qTextCol: String, k: Int,
                idCol: String,
                k1Num: Int = 12, k1Den: Int = 10,
                bNum: Int = 3, bDen: Int = 4,
                driverPairLimit: Int = 8192): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(k1Num >= 0 && k1Den > 0 && bNum >= 0 && bDen > 0 &&
      bNum <= bDen, s"bad BM25 params k1=$k1Num/$k1Den b=$bNum/$bDen")
    // the one collect in this file whose bound is CALLER-supplied: the
    // limit(N+1) regime probe below materializes up to
    // driverPairLimit+1 (query, term) pairs on the driver, so an
    // unbounded value would turn the probe itself into a silent driver
    // OOM. 65536 pairs is already far past where the distributed
    // regime wins — big query sets need a SMALLER limit (or the
    // default), never a bigger one: they take the broadcast-join
    // regime automatically once the probe overflows the limit.
    require(driverPairLimit >= 0 && driverPairLimit <= 65536,
      s"driverPairLimit=$driverPairLimit out of [0, 65536]: the driver " +
        "fold is for benchmark-sized query sets; larger sets are served " +
        "by the distributed regime automatically, so raising the limit " +
        "past 65536 only risks a driver OOM")
    import org.apache.spark.sql.expressions.Window
    import queries.sparkSession.implicits._
    val tf = index.tf
    val avg100 = index.avg100
    val nDocs = index.nDocs
    // TWO query-set regimes, picked by ONE probe job (limit N+1): a
    // benchmark-sized set's distinct (query, term) pairs live on the
    // driver (same metadata class as a codebook — df(t) a
    // query-vocabulary-sized map, N/avgdl two scalars, everything folds
    // back as literals, so scoring is ONE job with zero
    // broadcast-exchange builds); above `driverPairLimit` pairs — a
    // decontamination-scale query set, millions of rows at 100x — the
    // pair table NEVER funnels through the driver: it stays a DataFrame,
    // the idf fold becomes a broadcast join against the slice-computed
    // df(t), and the pair table ships as a Spark-managed broadcast into
    // the same scoring tail.
    val qtAll = bm25Toks(queries, qIdCol, qTextCol, "__q", index.gram)
      .distinct()
    val headPairs: Array[(Long, String)] =
      qtAll.limit(driverPairLimit + 1).as[(Long, String)].collect()
    if (nDocs == 0L || headPairs.isEmpty)
      return queries.sparkSession.emptyDataFrame
        .select(lit(0L).as(qIdCol), lit(0L).as("rank"), lit(0L).as(idCol),
          lit(0L).as("n_terms"), lit(0L).as("score")).limit(0)
    // cand = the term-filtered index slice; qt = (__q, __t, __idf) —
    // idf rides the (query, term) rows into the broadcast join (a
    // string-keyed literal MAP lookup would linear-scan its entries per
    // candidate row — measured ~1 s at 250 terms x 300k candidates; the
    // broadcast hash join probes in O(1))
    val (cand: DataFrame, qt: DataFrame) =
      if (headPairs.length <= driverPairLimit) {
        val qPairs: Seq[(Long, String)] = headPairs.toSeq.sorted
        val terms: Seq[String] = qPairs.map(_._2).distinct.sorted
        val dft: Map[String, Long] = tf
          .where(col("__t").isin(terms: _*))
          .groupBy(col("__t")).agg(count(lit(1)).as("c"))
          .as[(String, Long)].collect().toMap
        val idfBp: Map[String, Long] = dft.map { case (t, dfc) =>
          t -> (10000L * (nDocs - dfc + 1)) / (dfc + 1)
        }
        (tf.where(col("__t").isin(terms: _*)),
          qPairs.map { case (q, t) => (q, t, idfBp.getOrElse(t, 0L)) }
            .toDF("__q", "__t", "__idf"))
      } else {
        val qtD = qtAll.localCheckpoint(eager = false) // term set + idf join
        val slice = tf.join(broadcast(qtD.select(col("__t")).distinct()),
            Seq("__t"), "leftsemi")
          .localCheckpoint(eager = false) // consumers: df(t) + scoring
        // same integer idf as the local path (operands nonnegative, so
        // Scala Long / == SQL DIV); terms absent from the corpus drop
        // out of the inner join — they match no candidate row anyway
        val idfD = slice.groupBy(col("__t"))
          .agg(count(lit(1)).as("__dfc"))
          .select(col("__t"), expr(
            s"(10000L * (${nDocs}L - __dfc + 1L)) DIV (__dfc + 1L)")
            .as("__idf"))
        (slice, qtD.join(broadcast(idfD), "__t"))
      }
    bm25ScoreTail(cand, qt, index.dl, avg100, k, qIdCol, idCol,
      k1Num, k1Den, bNum, bDen)
  }

  /** The shared BM25 scoring tail: candidate tf slice × broadcast
    * (query, term, idf) rows × per-doc lengths → per-(query, doc) score
    * → top-k window. Factored so [[bm25Query]] and the fused one-shot
    * [[bm25TopK]] run the byte-identical expression tree. */
  private def bm25ScoreTail(cand: DataFrame, qt: DataFrame, dl: DataFrame,
                            avg100: Long, k: Int, qIdCol: String,
                            idCol: String, k1Num: Int, k1Den: Int,
                            bNum: Int, bDen: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // Saturation coefficients folded on the driver (BigInt: the folds
    // themselves must not wrap):
    //   sat = (cNum·tf) DIV (cTf·tf + cConst + cDl·dl)
    val cNum = BigInt(10000) * (k1Num.toLong + k1Den) * bDen * avg100
    val cTf = BigInt(k1Den) * bDen * avg100
    val cConst = BigInt(k1Num) * (bDen - bNum) * avg100
    val cDl = BigInt(100) * bNum * k1Num
    // int64 fast-path row bounds: cNum·tf ≤ MAX forces cTf·tf ≤ MAX/1e4
    // (cTf·1e4 ≤ cNum), and cConst ≤ MAX/4 ∧ cDl·dl ≤ MAX/4 keeps the
    // denominator sum in range; any row above the bounds replays the
    // identical truncating DIV in DECIMAL(38,0)
    val longMax = BigInt(Long.MaxValue)
    // cDl's bound sits in fastOk explicitly (not only implicitly via a
    // dlMax of 0 when longMax/(cDl*4) floors to zero) so the whole
    // int64-safety invariant is checkable on this one line
    val fastOk = cNum > 0 && cNum <= longMax && cConst <= longMax / 4 &&
      cDl <= longMax / 4
    val tfMax = if (fastOk) (longMax / cNum).min(longMax).toLong else 0L
    val dlMax =
      if (!fastOk) 0L
      else if (cDl == 0) Long.MaxValue
      else (longMax / (cDl * 4)).min(longMax).toLong
    val satLong =
      s"(($cNum * __tf) DIV ($cTf * __tf + $cConst + $cDl * __dl))"
    val satDec =
      s"((CAST('$cNum' AS DECIMAL(38,0)) * __tf) DIV " +
        s"(CAST('$cTf' AS DECIMAL(38,0)) * __tf + " +
        s"CAST('$cConst' AS DECIMAL(38,0)) + " +
        s"CAST('$cDl' AS DECIMAL(38,0)) * __dl))"
    val scored = cand
      .join(broadcast(qt), "__t")
      .join(dl, "__doc")
      .select(col("__q"), col("__doc"),
        expr(s"""CAST(
          |(CAST(__idf AS DECIMAL(38,0)) *
          | (CASE WHEN __tf <= $tfMax AND __dl <= $dlMax
          |  THEN $satLong ELSE $satDec END))
          |DIV 10000 AS BIGINT)""".stripMargin.replaceAll("\n", " "))
          .as("__term"))
      .groupBy(col("__q"), col("__doc"))
      .agg(sum(col("__term")).as("score"),
        count(lit(1)).as("n_terms"))
    scored
      .withColumn("rank", row_number().over(Window.partitionBy(col("__q"))
        .orderBy(col("score").desc, col("__doc"))))
      .where(col("rank") <= k)
      .select(col("__q").as(qIdCol), col("rank").cast("long").as("rank"),
        col("__doc").as(idCol), col("n_terms"), col("score"))
  }

  /** One-shot [[bm25Index]] + [[bm25Query]] with the driver folds FUSED
    * (r22, guide §1.2 step 1 / the r21 verdict's q114 item — "14 jobs =
    * 2 checkpoint materializations + 3 driver folds"): the indexed path
    * pays three driver jobs before scoring (index totals collect, query
    * pair probe, df(t) collect). One-shot callers don't need the totals
    * before the probe, so this
    *  1. probes the QUERY side first — a plain map-side take of up to
    *     driverPairLimit+1 (query, term) OCCURRENCE rows, deduped on
    *     the driver (the indexed path's probe pays a distinct()
    *     exchange of the same rows first; regime choice by occurrence
    *     count is more conservative — a set overflowing it falls to
    *     the distributed regime, which is pinned result-identical);
    *  2. collects corpus totals AND the term-sliced df(t) in ONE job
    *     (a tagged union over the same lazy tf/dl checkpoints — both
    *     checkpoints materialize inside this single job);
    *  3. runs the byte-identical [[bm25ScoreTail]].
    * Driver jobs 3 → 2, and the probe no longer shuffles. Results are
    * pinned identical to bm25Index+bm25Query in CorpusModelsSpec; the
    * index-once-query-many lifecycle keeps the unfused entry points. */
  def bm25TopK(df: DataFrame, idCol: String, textCol: String,
               queries: DataFrame, qIdCol: String, qTextCol: String,
               k: Int, k1Num: Int = 12, k1Den: Int = 10,
               bNum: Int = 3, bDen: Int = 4, gram: Int = 1): DataFrame = {
    require(gram >= 1, s"gram must be >= 1, got $gram")
    require(k >= 1, s"k must be >= 1, got $k")
    require(k1Num >= 0 && k1Den > 0 && bNum >= 0 && bDen > 0 &&
      bNum <= bDen, s"bad BM25 params k1=$k1Num/$k1Den b=$bNum/$bDen")
    import queries.sparkSession.implicits._
    val driverPairLimit = 8192
    def emptyResult: DataFrame = queries.sparkSession.emptyDataFrame
      .select(lit(0L).as(qIdCol), lit(0L).as("rank"), lit(0L).as(idCol),
        lit(0L).as("n_terms"), lit(0L).as("score")).limit(0)
    // the index tables, lazily checkpointed — NOT materialized yet; the
    // stats job below is the first (and only) materializing action
    val tf = bm25Toks(df, idCol, textCol, "__doc", gram)
      .groupBy(col("__doc"), col("__t")).agg(count(lit(1)).as("__tf"))
      .localCheckpoint(eager = false) // consumers: dl + df(t) + scoring
    val dl = tf.groupBy(col("__doc")).agg(sum(col("__tf")).as("__dl"))
      .localCheckpoint(eager = false) // consumers: totals + scoring
    val headOcc: Array[(Long, String)] =
      bm25Toks(queries, qIdCol, qTextCol, "__q", gram)
        .limit(driverPairLimit + 1).as[(Long, String)].collect()
    if (headOcc.isEmpty) return emptyResult
    if (headOcc.length <= driverPairLimit) {
      val qPairs: Seq[(Long, String)] = headOcc.toSeq.distinct.sorted
      val terms: Seq[String] = qPairs.map(_._2).distinct.sorted
      // ONE stats job: corpus totals + term-sliced df(t), tagged union
      // (counts travel as strings — exact at any magnitude)
      val stats = dl
        .agg(count(lit(1)).cast("string").as("a"),
          coalesce(sum(col("__dl")), lit(0L)).cast("string").as("b"))
        .select(lit(0).as("kind"), lit(null).cast("string").as("t"),
          col("a"), col("b"))
        .unionByName(tf.where(col("__t").isin(terms: _*))
          .groupBy(col("__t")).agg(count(lit(1)).cast("string").as("a"))
          .select(lit(1).as("kind"), col("__t").as("t"), col("a"),
            lit(null).cast("string").as("b")))
        .collect()
      val totals = stats.find(_.getInt(0) == 0).get
      val nDocs = totals.getString(2).toLong
      if (nDocs == 0L) return emptyResult
      val avg100 = (100L * totals.getString(3).toLong) / nDocs
      val dft: Map[String, Long] = stats.iterator.filter(_.getInt(0) == 1)
        .map(r => r.getString(1) -> r.getString(2).toLong).toMap
      val idfBp: Map[String, Long] = dft.map { case (t, dfc) =>
        t -> (10000L * (nDocs - dfc + 1)) / (dfc + 1)
      }
      bm25ScoreTail(
        tf.where(col("__t").isin(terms: _*)),
        qPairs.map { case (q, t) => (q, t, idfBp.getOrElse(t, 0L)) }
          .toDF("__q", "__t", "__idf"),
        dl, avg100, k, qIdCol, idCol, k1Num, k1Den, bNum, bDen)
    } else {
      // query set past the occurrence probe: the indexed path (its own
      // totals job; its distinct-pair probe re-decides the regime —
      // the one-shot fusion is for benchmark-sized query sets)
      val Array(nDocs, totTok) = dl
        .agg(count(lit(1)), coalesce(sum(col("__dl")), lit(0L)))
        .as[(Long, Long)].collect()
        .headOption.map(t => Array(t._1, t._2)).getOrElse(Array(0L, 0L))
      bm25Query(Bm25Index(tf, dl, nDocs,
          if (nDocs == 0) 0L else (100L * totTok) / nDocs, gram),
        queries, qIdCol, qTextCol, k, idCol, k1Num, k1Den, bNum, bDen)
    }
  }
}
