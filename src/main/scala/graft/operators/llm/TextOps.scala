package graft.operators.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Text-pipeline operators for training-data curation (beyond-reference
 * surface; the brief's dedup / fingerprint / analysis set). All hashing is
 * plain md5 over explicit strings so ANY engine (the DuckDB oracle
 * included) can recompute identical values — no engine-private hash
 * functions in results.
 *
 * Scale notes: every operator here is a projection + one hash-partitioned
 * aggregation/join on a derived key (shingle, band hash, bucket) — no
 * all-pairs products anywhere. Candidate generation is confined to LSH
 * buckets; at 100 TB the band `groupBy` is the only shuffle and AQE
 * handles skewed buckets.
 */
object Shingles {

  /** Single-space split, empties kept — textually identical to DuckDB's
    * `string_split(text, ' ')` so oracles recompute the same token list. */
  def words(text: Column): Column = split(text, " ", -1)

  /** Explode word k-grams: (idCol, "shingle"). Documents shorter than k
    * words contribute nothing (both engines guard identically; the native
    * gram builder returns an empty array, which explode drops). */
  def explodeShingles(df: DataFrame, idCol: String, textCol: String,
                      k: Int): DataFrame =
    df.select(col(idCol), words(col(textCol)).as("__w"))
      .select(col(idCol), explode(
        graft.functions.VectorFunctions.wordGrams(col("__w"), k))
        .as("shingle"))
}

/**
 * MinHash + banded LSH near-duplicate candidate generation
 * (shingle → minhash signature → band hash → bucket equi-join).
 *
 * Hash family: hash_j(s) is the j-th 10-hex-char (40-bit) chunk of the
 * concatenation md5("0|"+s) || md5("1|"+s) || ... — ⌈numHashes·10/32⌉ md5
 * invocations yield all the hashes, instead of one full md5 PER hash.
 * Hashing is the dominant map-side cost of the signature stage (every
 * shingle of every document), so at 6 hashes this cuts it 3×; chunks of
 * independent md5s are themselves independent uniform hashes, and min()
 * over fixed-length hex strings is the same order as min() over the
 * underlying 40-bit value. A band's key is the md5 of its member hashes.
 */
object MinHashLsh {

  /** Hex chars per derived hash (40 bits — collision-safe for minhashing). */
  val HashHexLen = 10

  /** All `numHashes` hash chunks as one concatenated hex string — project
    * this ONCE per shingle row, then slice; referencing the md5s from
    * every min() aggregate would re-evaluate them per aggregate. */
  def hashPool(shingle: Column, numHashes: Int): Column = {
    val needed = numHashes * HashHexLen
    val nMd5 = (needed + 31) / 32
    // the fused native md5 (byte-identical hex, thread-local digest):
    // this runs nMd5 times PER SHINGLE OCCURRENCE — the hottest md5
    // call site in the library
    concat((0 until nMd5).map(j =>
      graft.functions.Md5Functions.md5Hex(concat(lit(s"$j|"), shingle))): _*)
  }

  def minhash(j: Int, pool: Column): Column =
    substring(pool, j * HashHexLen + 1, HashHexLen)

  /** One aggregation pass computes all `numHashes` min-hashes.
    *
    * Each hash aggregates as a LONG (the native hex-slice parse of its
    * 40-bit chunk), not as the sliced hex STRING: min over fixed-width
    * longs keeps the hash-aggregate buffer in the UnsafeRow fast path
    * and avoids one substring allocation per (row × hash), while
    * ordering is identical (same-length lowercase hex sorts exactly like
    * its numeric value). [[bands]] converts back to the canonical
    * 10-hex-char form, so band keys — and any external recomputation of
    * them — are byte-identical to the string formulation. */
  def signature(shingles: DataFrame, idCol: String, numHashes: Int): DataFrame = {
    require(numHashes >= 1, s"numHashes must be >= 1, got $numHashes")
    val pooled = shingles.select(col(idCol),
      hashPool(col("shingle"), numHashes).as("__pool"))
    val aggs = (0 until numHashes)
      .map(j => min(graft.functions.TextFunctions.hexSliceLong(
        col("__pool"), j * HashHexLen, HashHexLen)).as(s"h$j"))
    pooled.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** numHashes/rowsPerBand bands; two docs are candidates iff they agree on
    * ALL hashes of at least one band. Band keys hash the canonical
    * 10-hex-char rendering of each LONG min-hash (restored via
    * lower(lpad(hex(...)))) — once per document, not per shingle. */
  def bands(sig: DataFrame, idCol: String, numHashes: Int,
            rowsPerBand: Int): DataFrame = {
    require(rowsPerBand >= 1 && numHashes % rowsPerBand == 0,
      s"numHashes ($numHashes) must divide evenly into bands of " +
        s"$rowsPerBand — trailing hashes would be silently unused")
    val nBands = numHashes / rowsPerBand
    val bandStructs = (0 until nBands).map { b =>
      val members = concat((0 until rowsPerBand).map(r =>
        lower(lpad(hex(col(s"h${b * rowsPerBand + r}")), HashHexLen, "0"))): _*)
      struct(lit(b).as("band"),
        graft.functions.Md5Functions.md5Hex(members).as("bh"))
    }
    sig.select(col(idCol), explode(array(bandStructs: _*)).as("__bb"))
      .select(col(idCol), col("__bb.band").as("band"), col("__bb.bh").as("bh"))
  }

  /** Distinct candidate pairs (doc_a < doc_b) from shared buckets: ONE
    * shuffle on (band, bh), pairs expanded inside each bucket — the
    * signature pipeline is computed once (a self-join formulation would
    * recompute the shingle+minhash lineage on both sides).
    *
    * `maxBucket` (0 = unlimited) bounds the quadratic expansion on
    * degenerate buckets — a bucket of boilerplate-identical documents
    * otherwise expands n²/2 pairs in one task. Capping is NOT silent:
    * oversized buckets are DROPPED whole (not sampled — a truncated
    * near-dup graph is worse than an explicit skip-list) and returned in
    * the second DataFrame as (band, bh, n_ids) for a follow-up pass
    * (exact dedup handles identical content more cheaply than LSH).
    *
    * Cost note: the two outputs are independent plans over the same
    * bucket aggregation — a caller materializing BOTH at scale should
    * persist the upstream bands (or signatures) first, or the
    * shingle→minhash lineage runs twice. With maxBucket = 0 the dropped
    * side is `limit(0)` and optimizes to an empty relation for free. */
  def candidatePairsCapped(bandsDf: DataFrame, idCol: String,
                           maxBucket: Int): (DataFrame, DataFrame) = {
    val buckets = bandsDf.groupBy(col("band"), col("bh"))
      .agg(collect_list(col(idCol)).as("ids"))
      .where(size(col("ids")) > 1)
    val (kept, dropped) =
      if (maxBucket <= 0) (buckets, buckets.limit(0))
      else (buckets.where(size(col("ids")) <= maxBucket),
        buckets.where(size(col("ids")) > maxBucket))
    val pairs = kept
      .selectExpr("explode(flatten(transform(ids, (a, i) -> " +
        "transform(slice(ids, i + 2, size(ids)), b -> " +
        "struct(least(a, b) AS doc_a, greatest(a, b) AS doc_b))))) AS p")
      .select(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"))
      .distinct()
    (pairs, dropped.select(col("band"), col("bh"),
      size(col("ids")).as("n_ids")))
  }

  def candidatePairs(bandsDf: DataFrame, idCol: String): DataFrame =
    candidatePairsCapped(bandsDf, idCol, maxBucket = 0)._1

  /** Exact-dedup follow-up for capped runs: among the docs whose buckets
    * the cap skipped (`skipIds`, one id column named `idCol`), find the
    * ids that are BYTE-EXACT duplicates of a smaller-id skip-listed doc —
    * the ids a complete keep-set must additionally drop.
    *
    * Rationale: a bucket only outgrows the cap when many documents share
    * every band hash, which at real duplication rates means exact or
    * near-exact copies — so a full-digest group-by over just the
    * skip-listed docs recovers (almost all of) the dedup the skipped
    * pair expansion would have found, at skip-list cost, not corpus
    * cost: the two shuffles here move only skip-listed rows, never the
    * 100 TB side. sha2-256 over the text makes a hash collision (two
    * different texts dropped as one) cryptographically negligible. */
  def exactDropWithin(corpus: DataFrame, idCol: String, textCol: String,
                      skipIds: DataFrame): DataFrame = {
    val skipDocs = corpus.join(skipIds.select(col(idCol)).distinct(),
        Seq(idCol), "left_semi")
      .select(col(idCol), sha2(col(textCol).cast("string"), 256).as("__d"))
    val minPerDigest = skipDocs.groupBy(col("__d"))
      .agg(min(col(idCol)).as("__min"))
    skipDocs.join(minPerDigest, "__d")
      .where(col(idCol) =!= col("__min"))
      .select(col(idCol))
  }

  /** End-to-end: corpus (idCol, textCol) → candidate pairs. */
  def apply(corpus: DataFrame, idCol: String, textCol: String,
            shingleLen: Int = 3, numHashes: Int = 6,
            rowsPerBand: Int = 2): DataFrame = {
    val sh = Shingles.explodeShingles(corpus, idCol, textCol, shingleLen)
    candidatePairs(bands(signature(sh, idCol, numHashes), idCol, numHashes,
      rowsPerBand), idCol)
  }
}

/**
 * SimHash document fingerprint: 32 bits, bit j = sign of the sum over word
 * occurrences of ±1, where +1 iff the high bit of md5(word)'s j-th nibble
 * is set. Near-dups differ in few bits; the signature is a single
 * aggregation pass (map-side combinable).
 */
object SimHash {
  val Bits = 32

  def apply(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // project the word's ENTIRE 32-nibble vote vector once, as one int
    // mask (native hex_high_bits over the md5): each of the 32 sum()
    // aggregates evaluates its own expression tree per input row, so
    // they must run on integer shifts of a shared column — the earlier
    // per-aggregate substring formulation allocated and compared 32
    // one-char strings per word row
    val w = df.select(col(idCol),
      explode(Shingles.words(col(textCol))).as("__word"))
      .select(col(idCol),
        graft.functions.TextFunctions.hexHighBits(
          graft.functions.Md5Functions.md5Hex(col("__word"))).as("__m"))
    // vote_j = +1 iff mask bit j set else -1, i.e. ((m >> j) & 1)*2 - 1
    val sums = (0 until Bits).map { j =>
      sum(shiftright(col("__m"), j).bitwiseAND(lit(1)) * 2 - 1).as(s"__s$j")
    }
    val agg = w.groupBy(col(idCol)).agg(sums.head, sums.tail: _*)
    val bits = concat((0 until Bits)
      .map(j => when(col(s"__s$j") > 0, "1").otherwise("0")): _*)
    agg.select(col(idCol), bits.as("simhash"))
  }
}

/** Token counting, marker-frequency scoring, and quality heuristics —
  * integer-valued so cross-engine comparison is exact. */
object TextAnalysis {

  def tokenCount(text: Column): Column = size(Shingles.words(text))

  /** BPE-style pre-tokenization count: alphanumeric runs and single
    * punctuation marks each count as one token — the splitting rule BPE
    * tokenizers apply before merges, so this tracks LLM token budgets
    * far closer than whitespace counting ("don't!" = 4, not 1). The
    * pattern is restricted to character classes (identical semantics in
    * Java regex and RE2-family engines) so an external oracle replays it. */
  val BpeTokenPattern = "[A-Za-z0-9]+|[^A-Za-z0-9 ]"

  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpeTokenPattern), lit(0)))

  /** Occurrences of an exact token. */
  def countToken(text: Column, token: String): Column =
    size(filter(Shingles.words(text), _ === lit(token)))

  /** PII-style pattern scrubbing: emails → `<EMAIL>`, digit runs of 6+ →
    * `<NUM>`. Patterns are deliberately restricted to syntax with identical
    * semantics in Java regex and RE2-family engines (character classes +
    * counted quantifiers, no lookaround), so an external oracle can replay
    * the scrub. Pure per-row projection — no shuffle at any scale. */
  def scrubPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, PiiEmailPattern, "<EMAIL>"),
      PiiNumberPattern, "<NUM>")

  /** Fused scrub + detection counts in ONE evaluation per row:
    * `struct<clean, n_emails, n_numbers>` with semantics byte-identical
    * to `scrubPii` + the two `regexp_extract_all` counts it used to take
    * four regex passes to compute. See PiiScrubExpression. */
  def scrubPiiAll(text: Column): Column =
    graft.functions.PiiScrubFunctions.piiScrubAll(text)

  val PiiEmailPattern = graft.functions.PiiScrubCodegen.EmailPattern
  val PiiNumberPattern = graft.functions.PiiScrubCodegen.NumberPattern

  /** Word k-grams over a word-array column — no explode, no shuffle; the
    * map-side building block for repetition scoring. Native codegen'd
    * expression (tight loop); documents shorter than k words yield an
    * empty array. */
  def gramArrayOf(wordsCol: Column, k: Int): Column =
    graft.functions.VectorFunctions.wordGrams(wordsCol, k)

  /** Repetition score in basis points over a MATERIALIZED gram-array
    * column: 10000 * (1 - distinct/total). Boilerplate/looped text scores
    * high; all-unique text scores 0. */
  def repetitionBpOf(gramsCol: Column): Column =
    // floor(a/b) = integer div for non-negative ints — Column./ is double
    // division, and a fractional bp would never hash-match another engine
    when(size(gramsCol) > 0,
      lit(10000) - floor(size(array_distinct(gramsCol)).cast("long") * 10000 /
        size(gramsCol)).cast("long"))
      .otherwise(lit(null).cast("long"))

  /** Staged projection: text → words → grams → (rep_bp, n_grams). Each
    * array materializes exactly once per row. */
  def repetitionScore(df: DataFrame, idCol: String, textCol: String,
                      k: Int = 2): DataFrame =
    df.select(col(idCol), Shingles.words(col(textCol)).as("__w"))
      .select(col(idCol), gramArrayOf(col("__w"), k).as("__g"))
      .select(col(idCol), repetitionBpOf(col("__g")).as("rep_bp"),
        size(col("__g")).as("n_grams"))

  /** Corpus vocabulary stats: per-token document frequency and total
    * occurrence count, top `k` tokens — the df/tf table that drives
    * vocabulary building, stopword induction, and IDF weighting over a
    * training corpus. Two aggregations: the (token, doc) pass dedups
    * per-document occurrences WITH map-side partial counts (so the
    * shuffle carries one row per distinct (token, doc), not one per
    * occurrence), the token pass is vocabulary-sized. Top-k is
    * orderBy+limit = TakeOrdered (parallel partial top-k per partition —
    * never a single-partition global window). Deterministic: the token
    * tie-break makes the ordering total. */
  def vocabTopK(df: DataFrame, idCol: String, textCol: String,
                k: Int): DataFrame =
    df.select(col(idCol), explode(Shingles.words(col(textCol))).as("token"))
      .where(col("token") =!= "")
      .groupBy(col("token"), col(idCol)).agg(count(lit(1)).as("__n"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("doc_freq"), sum(col("__n")).as("term_freq"))
      .orderBy(col("doc_freq").desc, col("term_freq").desc, col("token"))
      .limit(k)

  /** Integer-exact TF-IDF document weighting: per-(doc, token) term
    * frequency, document frequency from a second aggregation over the
    * SAME tf output, weight = tf * ((10000 * N) DIV df) — integer basis
    * points of the inverse document-frequency ratio instead of a float
    * log, so scores are bit-exact cross-engine and rank-equivalent to
    * 1/df weighting.
    *
    * ONE corpus pass, via an RDD-level `localCheckpoint` of the tf
    * aggregation. The tf output has three consumers (the broadcast df
    * table, the N row, the weighted sum); left declarative, column
    * pruning specializes each branch's aggregate (the df branch drops
    * the tf count, the N branch drops the token) into non-identical
    * exchanges that each re-tokenize the corpus, and no
    * pruning-defeating rewrite survives the optimizer (unused aggregate
    * expressions are pruned per consumer — a rollup-fused variant was
    * built and its explain showed three specialized scans; measured,
    * not guessed). The checkpoint materializes the tf rows once as raw
    * UnsafeRow blocks (MEMORY_AND_DISK, spills past memory) that all
    * three consumers read. Chosen over `Dataset.persist`, which an
    * earlier round used: (a) persist pins the plan in the session
    * CacheManager until an explicit unpersist — a leak for long-lived
    * sessions that a lazy operator API cannot safely schedule, while
    * checkpoint blocks are released by the context cleaner as soon as
    * the result Dataset goes unreferenced; (b) persist pays the
    * columnar cache encode/decode on every row, the dominant local
    * cost. Same trade as ConnectedComponents' iteration state. Caveat
    * shared with it: local (executor-resident) checkpoint blocks don't
    * survive executor loss — a cluster run under decommissioning that
    * needs fault tolerance should pass catalog N instead.
    * `nDocs = Some(n)` stays the zero-extra-work path for callers with
    * table statistics (N from the catalog, not a scan).
    *
    * The vocabulary-sized df table broadcasts back onto the tf rows, so
    * the big table is never reshuffled by token — token skew ("the")
    * never concentrates into one partition the way a token window
    * would. Big-data shuffles: the tf aggregation and the final per-doc
    * sum. N counts docs contributing at least one token; tokenless docs
    * score nothing and are excluded from both N and the output. At a
    * corpus where the distinct-token vocabulary outgrows broadcast,
    * swap the df broadcast join for a shuffle join (plus a stopword
    * cap) — the N derivation is unaffected. (A token-colocated
    * single-exchange variant — the q88/q91 shape — was A/B'd r13: the
    * colocated sort-merge join's string sorts cost MORE than the
    * broadcast hash join at bench scale, 0.57 vs 0.48 s isolated, so
    * the broadcast form stays.)
    *
    * r15 exchange audit (Diag min-of-3 at sf0.1, anchor q74 alongside;
    * the carried "q60 is 5.1x duck" item) — three literal-folding
    * variants built and REVERTED, this declarative shape keeps winning:
    *   shape                                     q60      anchor q74
    *   THIS (bcast df join + crossJoin bcast N)  0.526 s  0.728 s
    *   N collected to a driver literal           0.556 s  0.680-1.006
    *   one rollup pass -> df map + N literals    0.575 s  0.700 s
    *   df probe collect -> literal map + N coll  0.598 s  0.599-0.784
    * Why literal folding loses HERE but won in q114/dsir: those folds
    * replace metadata-sized side tables consumed by one scoring pass;
    * here the eager collects run at plan-build time against the lazy
    * tf checkpoint, SERIALIZING the three-consumer job chain that the
    * declarative form's broadcast builds overlap — and the rollup
    * variant's fused countDistinct even re-expands the checkpointed tf
    * into a second corpus-scale exchange. Duck's remaining edge is the
    * fixed multi-job floor (~9 jobs), not a plan defect.
    *
    * r19 drift adjudication (the r18 battery's only normalized >25%
    * mover, 0.388 → 0.513 s at the bench; q88 Diag protocol — anchor
    * q74 FIRST, three Diag invocations, min-of-3 each):
    *   run            q74 anchor   q60      q60/q74   jobs/stages
    *   r15 baseline   0.728        0.526    0.72      9/18
    *   r19 #1         1.036        0.855    0.825     9/18
    *   r19 #2         1.249        1.011    0.81      9/18
    *   r19 #3         1.213        0.953    0.786     9/18
    * The ANCHOR itself reads 1.4-1.7x its r15 band this session —
    * uniform machine phase, not a q60 regression; anchor-relative q60
    * sits 9-15% above its r15 ratio, inside the ±15-20% both-direction
    * wander the q88 table documents, and the job/stage counts are
    * byte-identical to the pinned shape. Phase; ranking unchanged;
    * the r15 variant table above stands. */
  def tfIdf(df: DataFrame, idCol: String, textCol: String,
            nDocs: Option[Long] = None): DataFrame = {
    nDocs.foreach(n => require(n > 0, s"nDocs must be positive, got $n"))
    val tf = df
      .select(col(idCol), explode(Shingles.words(col(textCol))).as("token"))
      .where(col("token") =!= "")
      .groupBy(col("token"), col(idCol)).agg(count(lit(1)).as("__tf"))
    // With catalog N the plan stays fully declarative (fault-tolerant,
    // re-derivable lineage); without it, the derived-N consumers make
    // lineage truncation the right trade — see docstring.
    val perDoc =
      if (nDocs.isDefined) tf else tf.localCheckpoint(eager = false)
    val docFreq = perDoc.groupBy(col("token"))
      .agg(count(lit(1)).as("__df"))
    val weighted = perDoc.join(broadcast(docFreq), "token")
    val withN = nDocs match {
      case Some(n) => weighted.withColumn("__n", lit(n))
      case None => weighted.crossJoin(
        broadcast(perDoc.agg(countDistinct(col(idCol)).as("__n"))))
    }
    withN
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_distinct_tokens"),
        sum(col("__tf") * expr("CAST((10000 * __n) DIV __df AS BIGINT)"))
          .as("tfidf"))
  }

  /** Benchmark decontamination: per-document count of distinct word
    * k-grams shared with an evaluation set — the train/test-overlap
    * check a training-data pipeline runs before shipping a corpus
    * (docs over a hit threshold get dropped or quarantined).
    *
    * Shape is deliberately asymmetric: the eval side is benchmark-sized
    * (thousands of docs), the corpus is the 100 TB side — so the eval
    * grams are DEDUPED and BROADCAST, the corpus grams stream map-side
    * through the broadcast hash join, and the only shuffle is the final
    * per-doc count aggregation over matching grams (a tiny fraction of
    * the corpus). Never a shuffle join: the corpus side's gram explosion
    * must not reach the wire. Gram granularity `k` follows the usual
    * decontamination setting (8–13 word n-grams); lower k flags more
    * aggressively. */
  def contaminationHits(corpus: DataFrame, idCol: String, textCol: String,
                        evalDocs: DataFrame, evalTextCol: String,
                        k: Int = 8): DataFrame = {
    val corpusGrams = Shingles.explodeShingles(corpus, idCol, textCol, k)
    val evalGrams = evalDocs
      .select(explode(graft.functions.VectorFunctions.wordGrams(
        Shingles.words(col(evalTextCol)), k)).as("shingle"))
      .distinct()
    corpusGrams
      .join(broadcast(evalGrams), "shingle")
      .groupBy(col(idCol))
      .agg(countDistinct(col("shingle")).as("n_hits"))
  }

  /** FUZZY decontamination — the near-verbatim leak detector next to
    * [[contaminationHits]]'s exact grams: an eval answer that drifted a
    * few words (casing fixes, appended attribution, trimmed boilerplate)
    * shares no exact 8-gram but still collides in MinHash-LSH bucket
    * space. Each corpus doc is flagged with how many of its LSH bands
    * land in a bucket ANY eval doc occupies — (idCol, n_bands_hit),
    * hit docs only; n_bands_hit ≤ numHashes/rowsPerBand is a
    * similarity-confidence signal (more shared bands ≈ higher Jaccard).
    *
    * Same asymmetric shape as the exact path: the eval side is
    * benchmark-sized, so only its DISTINCT bucket keys broadcast
    * (≤ |eval|·nBands rows of (band, md5) — KBs); the corpus pays the
    * q21 signature pipeline (map-side shingle+minhash, ONE groupBy-doc
    * shuffle) and then a broadcast join + per-doc count. No pair
    * expansion, no corpus self-join — strictly cheaper than the dedup
    * LSH at the same settings. Uses [[MinHashLsh]]'s exact md5-derived
    * hash family, so the whole pipeline replays in the oracle (q127). */
  def fuzzyContamination(corpus: DataFrame, idCol: String, textCol: String,
                         evalDocs: DataFrame, evalTextCol: String,
                         shingleK: Int = 3, numHashes: Int = 6,
                         rowsPerBand: Int = 2): DataFrame = {
    val corpusBands = MinHashLsh.bands(
      MinHashLsh.signature(
        Shingles.explodeShingles(corpus, idCol, textCol, shingleK),
        idCol, numHashes),
      idCol, numHashes, rowsPerBand)
    // the eval id only scopes the per-doc min-hash; the SET of bucket
    // keys that leaves this side is id-invariant, so a synthetic id is
    // fine and the eval frame needs no id column of its own
    val evalBands = MinHashLsh.bands(
      MinHashLsh.signature(
        Shingles.explodeShingles(
          evalDocs.select(monotonically_increasing_id().as("__eid"),
            col(evalTextCol)),
          "__eid", evalTextCol, shingleK),
        "__eid", numHashes),
      "__eid", numHashes, rowsPerBand)
    val evalBuckets = evalBands.select(col("band"), col("bh")).distinct()
    corpusBands
      .join(broadcast(evalBuckets), Seq("band", "bh"))
      .groupBy(col(idCol))
      // a doc contributes each of its bands at most once, so the row
      // count IS the distinct-band hit count
      .agg(count(lit(1)).as("n_bands_hit"))
  }

  /** Winnowing-style fingerprint: distinct word-k-gram md5s sampled where
    * the hash's first hex char is '0' (1/16 of grams, content-defined —
    * robust to local edits), sorted and re-hashed.
    *
    * ONE shuffle: hashing and the 1/16 prefix filter run per OCCURRENCE
    * on the map side (before any dedup), so only sampled hashes reach
    * the wire, and `collect_set` dedups inside the per-doc aggregation —
    * an upstream `distinct()` would be a second full-width shuffle of
    * every (doc, gram) pair just to drop rows the filter discards
    * anyway. The md5-per-occurrence overcount (vs per distinct gram) is
    * pure map-side CPU, the cheap side of the trade at scale. */
  def fingerprint(df: DataFrame, idCol: String, textCol: String,
                  k: Int = 4): DataFrame = {
    val sh = Shingles.explodeShingles(df, idCol, textCol, k)
    sh.select(col(idCol),
        graft.functions.Md5Functions.md5Hex(col("shingle")).as("__h"))
      .where(substring(col("__h"), 1, 1) === "0")
      .groupBy(col(idCol))
      .agg(sort_array(collect_set(col("__h"))).as("__hs"))
      .select(col(idCol),
        graft.functions.Md5Functions.md5Hex(concat_ws(",", col("__hs")))
          .as("fingerprint"),
        size(col("__hs")).cast("long").as("n_sampled"))
  }

  /** C4-style LINE-level exact dedup, generalized to fixed-size word
    * chunks (training corpora repeat boilerplate lines — navbars, license
    * headers — far more often than whole documents): each document is cut
    * into consecutive `chunkWords`-word chunks, every occurrence of a
    * chunk AFTER its first (in global (doc, position) order) is dropped
    * corpus-wide — including repeats within one document — and documents
    * are reassembled from their surviving chunks in position order.
    * Documents whose every chunk was seen earlier vanish entirely.
    * Returns (idCol, n_kept, clean_text).
    *
    * Scale shape: chunking is a map-side projection (transform+slice over
    * the word array — no per-chunk row until the single posexplode), then
    * TWO keyed shuffles, both map-side-combinable aggregations: (1)
    * groupBy(chunk) with min(packed (doc, pos) key) — the keep-first rule
    * as a partial-aggregable min, NOT a window over every occurrence; (2)
    * regroup by doc to reassemble. The winning rows ARE the agg output
    * (the chunk text is the group key), so there is no join back against
    * the occurrence table. Requires ids < 2^31 and positions < 2^32: the
    * keep-first key is doc*2^32+pos packed into one signed long, exact
    * for any engine. */
  def chunkDedup(df: DataFrame, idCol: String, textCol: String,
                 chunkWords: Int): DataFrame = {
    require(chunkWords >= 1, s"chunkWords must be >= 1, got $chunkWords")
    val cw = chunkWords
    df.select(col(idCol).cast("long").as("__doc"),
        Shingles.words(col(textCol)).as("__w"))
      .select(col("__doc"),
        // sequence(0, -1) would yield [0, -1] (Spark infers a negative
        // step), so the empty-doc case must short-circuit to array()
        posexplode(expr(
          s"CASE WHEN size(__w) <= 0 THEN array() ELSE " +
            s"transform(sequence(0, cast((size(__w) + ${cw - 1}) div $cw " +
            s"as int) - 1), i -> array_join(slice(__w, i * $cw + 1, $cw), " +
            "' ')) END")).as(Seq("__idx", "chunk")))
      .groupBy(col("chunk"))
      .agg(min(col("__doc") * lit(1L << 32) + col("__idx")).as("__k"))
      .select(expr("__k div 4294967296").as("__doc"),
        pmod(col("__k"), lit(1L << 32)).as("__idx"), col("chunk"))
      .groupBy(col("__doc"))
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(struct(col("__idx"), col("chunk")))),
          x => x.getField("chunk")), " ").as("clean_text"))
      .select(col("__doc").as(idCol), col("n_kept"), col("clean_text"))
  }

  /** Exact duplicated-SPAN removal (the substring-dedup of Lee et al.
    * 2022, "Deduplicating Training Data Makes Language Models Better" —
    * reference semantics: every repeated span above a length threshold
    * keeps exactly its first occurrence), re-expressed Spark-first: the
    * suffix-array the paper builds single-node is replaced by sliding
    * `k`-word grams — a span of ≥ k words is duplicated iff all its
    * k-grams are, so marking every NON-FIRST occurrence of each k-gram
    * and dropping the words it covers removes exactly the duplicated
    * spans. Unlike [[chunkDedup]] (fixed aligned chunks), the sliding
    * window catches duplicated spans at ANY word offset.
    *
    * First-occurrence semantics, precisely: the first occurrence of a
    * CROSS-document duplicate survives verbatim (a later doc's gram
    * occurrences never cover positions in an earlier doc). WITHIN one
    * document, a self-overlapping periodic run ("x x x x x x", k=5) is
    * collapsed harder than the reference's merged-range semantics: the
    * run's second gram occurrence starts inside the first's span, so
    * coverage eats back into it and the survivor can be shorter than k
    * words (here: one "x"). That is a deliberate property of the
    * coverage rule — deterministic, identical in the oracle, and
    * aligned with what repetition removal WANTS for degenerate periodic
    * boilerplate — but it is not byte-faithful "keep exactly one copy"
    * for intra-document repeats (pinned in CorpusModelsSpec).
    *
    * Keep-first = global (doc, pos) lexicographic order, so results are
    * deterministic on any cluster layout. Returns every input document:
    * (idCol, n_kept, n_dropped, clean_text).
    *
    * Scale shape: gram construction is one map-side transform+slice over
    * the word array (grams never exist as rows outside the single
    * explode), and each occurrence row carries only (doc, pos,
    * xxhash64(gram words)) — 8-byte keys shuffle, never the 15-word text.
    * Three keyed exchanges total, each on a different key: (1)
    * row_number over gram-hash partitions finds non-first occurrences
    * (the ONLY formulation that needs every loser, so a min-agg can't
    * replace it; boilerplate grams skew these partitions — AQE's skew
    * split handles the sort, and the q21-style cap alternative applies
    * if a gram goes truly degenerate); (2) covered word positions fold
    * to one sorted array per doc (collect_set dedups overlapping spans
    * in-agg); (3) the corpus meets its per-doc covered-set with one
    * equi-join on the doc key — the small side is only docs that HAVE
    * duplicated spans. Reassembly filters the in-row word array by
    * covered position (array_contains per word: bounded by doc length ×
    * covered count, both per-row quantities — never a corpus-wide
    * blowup). */
  def substringDedup(df: DataFrame, idCol: String, textCol: String,
                     k: Int): DataFrame = {
    require(k >= 2, s"window must be >= 2 words, got $k")
    import org.apache.spark.sql.expressions.Window
    val w = df.select(col(idCol).cast("long").as("__doc"),
      Shingles.words(col(textCol)).as("__w"))
    // gram keys are ENGINE-INTERNAL (results carry only the reassembled
    // text), so xxhash64 replaces md5 and the window shuffles 8-byte
    // longs, never the 15-word text; a 64-bit collision (~10^-8 at 10^6
    // grams) over-drops one span, never corrupts surviving text. Gram
    // strings come from the native WordGramsExpression builder (A/B'd
    // against a transform+slice array-hash formulation: the fused
    // builder wins).
    val occ = w.select(col("__doc"), posexplode(
        graft.functions.VectorFunctions.wordGrams(col("__w"), k))
        .as(Seq("__p0", "__gs")))
      .select(col("__doc"), (col("__p0") + 1).as("__pos"),
        xxhash64(col("__gs")).as("__g"))
    val dup = occ.withColumn("__rn", row_number().over(
        Window.partitionBy("__g").orderBy("__doc", "__pos")))
      .where(col("__rn") > 1)
    val cov = dup
      .select(col("__doc"),
        explode(expr(s"sequence(__pos, __pos + ${k - 1})")).as("__cp"))
      .groupBy(col("__doc"))
      .agg(sort_array(collect_set(col("__cp"))).as("__cov"))
    w.join(cov, Seq("__doc"), "left")
      .select(col("__doc").as(idCol),
        (size(col("__w")) - coalesce(size(col("__cov")), lit(0)))
          .as("n_kept"),
        coalesce(size(col("__cov")), lit(0)).as("n_dropped"),
        array_join(expr(
          "transform(filter(zip_with(__w, sequence(1, size(__w)), " +
            "(x, i) -> struct(x AS w, i AS p)), " +
            "s -> __cov IS NULL OR NOT array_contains(__cov, s.p)), " +
            "s -> s.w)"), " ").as("clean_text"))
  }

  /** Gopher-style document quality rules (Rae et al. 2021, "Scaling
    * Language Models: ... Gopher", §A1.1 — the standard pre-training
    * quality gate): word-count bounds, mean-word-length bounds,
    * symbol-to-word ratio, alphabetic-word fraction, and a stopword
    * check, evaluated as ONE map-side projection per row (no shuffle at
    * any scale — this runs as a filter stage over the full corpus).
    *
    * All metrics are integer-exact so any engine replays them: mean
    * word length in tenths (DIV), ratios in basis points (DIV). `passes`
    * is the conjunction the pipeline filters on; the per-rule metrics
    * are kept in the output because curation pipelines tune thresholds
    * from their distributions. Documents with zero words fail.
    * `keepCols` pass through unchanged, so a pipeline can filter on
    * `passes` inline — a map-side stage, never a join back against the
    * corpus. */
  def gopherQuality(df: DataFrame, idCol: String, textCol: String,
                    minWords: Int = 50, maxWords: Int = 100000,
                    minMeanLenX10: Int = 30, maxMeanLenX10: Int = 100,
                    maxSymbolBp: Int = 1000, minAlphaBp: Int = 8000,
                    minStopwords: Int = 2,
                    stopwords: Seq[String] =
                      Seq("the", "a", "of", "to", "and", "in"),
                    keepCols: Seq[String] = Seq.empty): DataFrame = {
    val keep = keepCols.map(col)
    // ONE byte walk per document (GopherStatsExpression) replaces the
    // regexp_replace + per-word rlike + two array-HOF passes — same
    // five integer metrics, byte-identical (property-pinned), at a
    // fifth of the scans and none of the regex machinery; this is a
    // full-corpus filter stage, so its per-row cost IS the operator
    val stages = df.select(Seq(col(idCol),
        graft.functions.GopherStatsFunctions
          .gopherStats(col(textCol), stopwords).as("__g")) ++ keep: _*)
      .select(Seq(col(idCol),
        col("__g.n_words").as("n_words"),
        col("__g.sum_len").as("__sum_len"),
        col("__g.n_sym").as("__n_sym"),
        col("__g.n_alpha").as("__n_alpha"),
        col("__g.n_stop").as("n_stop")) ++ keep: _*)
      .select(Seq(col(idCol), col("n_words"),
        when(col("n_words") > 0,
          expr("CAST((10 * __sum_len) DIV n_words AS BIGINT)"))
          .as("mean_word_len_x10"),
        when(col("n_words") > 0,
          expr("CAST((10000 * __n_sym) DIV n_words AS BIGINT)"))
          .as("symbol_bp"),
        when(col("n_words") > 0,
          expr("CAST((10000 * __n_alpha) DIV n_words AS BIGINT)"))
          .as("alpha_bp"),
        col("n_stop")) ++ keep: _*)
    stages.withColumn("passes",
      col("n_words").between(minWords, maxWords) &&
        col("mean_word_len_x10").between(minMeanLenX10, maxMeanLenX10) &&
        col("symbol_bp") <= maxSymbolBp &&
        col("alpha_bp") >= minAlphaBp &&
        col("n_stop") >= minStopwords)
  }

  /** Duplicate-text fraction: for each document, the share (in basis
    * points) of its overlapping word-k-gram occurrences whose gram also
    * appears in at least one OTHER document — the corpus-level
    * substring-duplication signal of Lee et al. 2022 ("Deduplicating
    * Training Data Makes Language Models Better"), reduced to gram
    * granularity so it is exact, deterministic, and oracle-replayable.
    * High-dup_bp documents are boilerplate/mirror candidates that
    * survive document-level dedup (they differ somewhere) but still
    * flood training with repeated spans.
    *
    * Scale shape: grams hash on the map side (fixed-width wire rows,
    * never the gram text) and the occurrence stream is hash-partitioned
    * on the GRAM once; the (gram, doc) reduction, the distinct-doc
    * window, and everything up to the per-doc fraction aggregation then
    * run in place on that one exchange (k-word grams rarely repeat
    * within a document, so a pre-aggregation exchange would ship nearly
    * as many rows and then pay a second corpus-scale re-key for the
    * window — the q88 measurement). Cross-doc gram skew is bounded by
    * the (gram, doc) reduction the window runs over: a gram must appear
    * in millions of DISTINCT documents
    * (pure boilerplate — exactly what the score exists to flag) before
    * its window partition grows large; such grams are cap-and-flag
    * material upstream, same policy as the LSH bucket cap. Documents
    * shorter than k words yield no grams and are absent from the
    * output. */
  def dupGramFraction(df: DataFrame, idCol: String, textCol: String,
                      k: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // gram keys are ENGINE-INTERNAL (output carries only per-doc
    // fractions), so xxhash64 over the word-slice array replaces
    // md5-of-joined-string: no gram string ever materializes and the
    // exchanges carry 8-byte longs; a 64-bit collision (~10^-8 at 10^6
    // grams) shifts one doc's fraction by one gram, nothing else
    val per = Shingles.explodeShingles(df, idCol, textCol, k)
      .select(col(idCol), xxhash64(col("shingle")).as("__h"))
      .repartition(col("__h"))
      .groupBy(col("__h"), col(idCol))
      .agg(count(lit(1)).as("__occ"))
    // clustered by __h from the one exchange above — the window sorts
    // within partitions but moves nothing
    val withDocs = per.withColumn("__ndocs",
      count(lit(1)).over(Window.partitionBy(col("__h"))))
    withDocs.groupBy(col(idCol))
      .agg(sum(col("__occ")).as("n_grams"),
        sum(when(col("__ndocs") >= 2, col("__occ")).otherwise(0L))
          .as("dup_grams"))
      .select(col(idCol), col("n_grams"), col("dup_grams"),
        expr("CAST((10000 * dup_grams) DIV n_grams AS BIGINT)").as("dup_bp"))
  }

  /** DSIR-style importance scoring (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): score every
    * corpus document by how much its hashed-unigram distribution looks
    * like a TARGET domain sample vs the corpus itself. The per-bucket
    * weight is the smoothed probability ratio in basis points,
    *
    *   w(b) = ((cnt_target(b)+1) · (total_corpus+B) · 10000)
    *            DIV ((cnt_corpus(b)+1) · (total_target+B))
    *
    * (Laplace-smoothed, B = 16^prefixLen buckets), and a document's
    * score is the sum of w over its token occurrences — the integer
    * rank-equivalent of DSIR's summed log-ratios (a sum of ratios in
    * place of a sum of logs: monotone per token, engine-exact, no
    * floats to drift cross-engine). Tokens hash into md5-prefix buckets
    * so the feature space is FIXED-SIZE regardless of vocabulary — the
    * property that makes the method viable at 100 TB.
    *
    * Scale shape — ONE corpus pass: the corpus aggregates straight to
    * per-(doc, bucket) counts (map-side partials; <= B rows per doc on
    * the wire, not one per token), and everything downstream derives
    * from that already-reduced table — the global bucket counts fold
    * out of it with a second tiny aggregation, the B-row weight table
    * broadcasts back onto it, and the per-doc sum is a sum of
    * pre-counted (cnt · w) products. The reduced table has two
    * consumers (global counts, scoring), so it is materialized once
    * (same trade as tfIdf's tf table — see its docstring for the
    * checkpoint-vs-persist rationale). The target side is
    * benchmark-sized and aggregates to <= B rows the same way.
    * Weight arithmetic runs on the driver in BigInt, so the numerator
    * (total_target+1)·(total_corpus+B)·10⁴ is exact at any corpus
    * size (the former SQL BIGINT product overflowed past ~10¹⁴
    * combined token counts). */
  /** Attach a driver-computed Long→Long weight table as `outCol` keyed
    * by `keyCol`. Small tables fold in as a literal map inside one
    * codegen'd projection (zero extra jobs); `element_at` over a
    * literal map LINEAR-SCANS its entries per row, so above
    * [[LiteralMapMaxEntries]] the table ships as a broadcast hash join
    * instead (O(1) probes — the bm25Query rationale); the join is LEFT
    * so a missing key yields a NULL weight on both paths. r15
    * re-confirmed the threshold after the left-join change: forcing
    * q85's 256-entry long-keyed table onto the join path read 0.619 s
    * vs 0.550 s literal (Diag min-of-3, anchor q74 0.707/0.728). */
  private[graft] val LiteralMapMaxEntries = 1024

  private[graft] def withWeightCol(df: DataFrame, keyCol: String,
                                 weights: Map[Long, Long],
                                 outCol: String): DataFrame =
    if (weights.size <= LiteralMapMaxEntries)
      df.withColumn(outCol, element_at(typedLit(weights), col(keyCol)))
    else {
      val spark = df.sparkSession
      import spark.implicits._
      val w = weights.toSeq.sorted.toDF(keyCol, outCol)
      // LEFT join: the literal-map path KEEPS a missing-key row with a
      // NULL weight (element_at semantics) — an inner join here would
      // silently drop it, a behavior fork that only surfaces above
      // LiteralMapMaxEntries. Current callers guarantee every key is
      // present; a future caller relying on the NULL gets identical
      // semantics on both paths.
      df.join(broadcast(w), Seq(keyCol), "left")
    }

  def dsirScore(corpus: DataFrame, idCol: String, textCol: String,
                target: DataFrame, targetTextCol: String,
                prefixLen: Int = 2): DataFrame = {
    require(prefixLen >= 1 && prefixLen <= 4,
      s"prefixLen must be in [1, 4], got $prefixLen")
    val buckets = 1L << (4 * prefixLen)
    // bucket = first prefixLen hex chars of md5(token), carried as its
    // NUMERIC value (top 4·prefixLen bits of the fused 48-bit md5
    // prefix — same partition of tokens as the oracle's hex-string
    // bucket, bijectively; the key is engine-internal, so the integer
    // form costs nothing cross-engine and skips the per-token hex
    // allocation entirely)
    def tokens(d: DataFrame, c: String, keep: Seq[Column]): DataFrame =
      d.select(keep :+ explode(Shingles.words(col(c))).as("__tok"): _*)
        .where(col("__tok") =!= "")
        .withColumn("__b", shiftrightunsigned(
          graft.functions.Md5Functions.md5Prefix48(col("__tok")),
          48 - 4 * prefixLen))
        .drop("__tok")
    val perDocBucket = tokens(corpus, textCol, Seq(col(idCol)))
      .groupBy(col(idCol), col("__b"))
      .agg(count(lit(1)).as("__cnt"))
      .localCheckpoint(eager = false)
    // The two B-row count tables are BUCKET-SIZED metadata (B = 16^p <=
    // 65536 — the fixed feature-space size that makes hashed DSIR viable
    // at 100 TB), so the weight table is computed on the DRIVER and
    // shipped back as a literal map: same data movement as the previous
    // broadcast-join chain (B rows to the driver, B entries to every
    // task) minus its three broadcast-exchange jobs and the join — the
    // whole weight lookup stays inside one codegen'd projection.
    // BigInt arithmetic makes the numerator exact at any corpus size
    // (the SQL-side BIGINT product overflowed past ~10^14 combined
    // token counts; DIV on nonnegative BigInt matches SQL DIV).
    val corpusCnt: Map[Long, Long] = perDocBucket.groupBy(col("__b"))
      .agg(sum(col("__cnt")).as("c")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val targetCnt: Map[Long, Long] = tokens(target, targetTextCol, Seq.empty)
      .groupBy(col("__b")).agg(count(lit(1)).as("c")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val totalC = corpusCnt.valuesIterator.sum
    val totalT = targetCnt.valuesIterator.sum
    val weights: Map[Long, Long] = corpusCnt.map { case (b, cc) =>
      val ct = targetCnt.getOrElse(b, 0L)
      val w = (BigInt(ct + 1) * BigInt(totalC + buckets) * 10000) /
        (BigInt(cc + 1) * BigInt(totalT + buckets))
      // loud, not wrapped: BigInt.toLong silently truncates past int64
      // (r19 review finding, same guard as Sampling.dsirSelect)
      require(w.isValidLong,
        s"bucket $b weight $w exceeds int64 — target/corpus sizes too " +
          s"lopsided (totalT=$totalT, totalC=$totalC) for the bp weights")
      b -> w.toLong
    }
    // every __b in perDocBucket is a corpusCnt key by construction, so
    // the weight attach never misses (lookup or inner join alike)
    TextAnalysis.withWeightCol(perDocBucket, "__b", weights, "__w")
      .groupBy(col(idCol))
      .agg(sum(col("__cnt")).as("n_tokens"),
        sum(col("__cnt") * col("__w")).as("score"))
      .select(col(idCol), col("n_tokens"), col("score"),
        expr("CAST(score DIV n_tokens AS BIGINT)").as("avg_bp"))
  }

  /** Bigram language-model fluency score — the integer-exact stand-in
    * for CCNet-style perplexity filtering (Wenzek et al. 2020: score
    * every document under an n-gram LM trained on the corpus, filter by
    * perplexity band). The corpus-trained bigram MLE assigns each
    * observed bigram a conditional weight in basis points,
    *
    *   w(w1 w2) = (10000 · c(w1 w2)) DIV c(w1 ·)
    *
    * (c counts bigram OCCURRENCES; c(w1 ·) sums them over the prefix, so
    * w is the integer MLE of P(w2|w1) and needs no smoothing — every
    * scored bigram was observed in training). A document's score sums
    * c_doc·w over its bigram occurrences; fluency_bp = score DIV
    * n_bigrams is the per-bigram average — a monotone rank-equivalent of
    * average log-likelihood that two engines reproduce bit for bit
    * (sums of integer ratios in place of sums of float logs, the same
    * trade as dsirScore).
    *
    * Scale shape — ONE corpus-scale shuffle: the occurrence stream is
    * hash-partitioned on the BIGRAM key once, and everything downstream
    * is colocated on it — the bigram-count aggregation needs no further
    * exchange (partitioning by gh clusters the gh groups), and the
    * scoring join consumes the SAME exchange (the engine reuses it for
    * both branches), so the corpus side of the join moves zero extra
    * bytes. Only the vocabulary-sized LM derivation (prefix counts, LM
    * join, re-key to gh) shuffles after that, each exchange <= one row
    * per distinct bigram. The former shape pre-aggregated per-(doc,
    * bigram) counts first — map-side combine, but then THREE
    * corpus-scale exchanges (the pre-agg by (doc, gh), the LM fold, and
    * the re-key of the reduced table for the scoring join); in web text
    * bigrams rarely repeat within a document, so the pre-agg removed
    * few rows and one occurrence-stream exchange is strictly less wire
    * (A/B at sf0.1: 0.85 -> see in-code note). Scoring joins ON THE
    * BIGRAM — the vocabulary-sized LM table is generally NOT
    * broadcastable, and a bigram key never concentrates the way a
    * prefix key would ("the" is one prefix-count ROW here, not a join
    * hot key; each of its continuations is its own join key). Documents
    * shorter than 2 words have no bigrams and are absent from the
    * output.
    *
    * ADJUDICATED (r15 Diag min-of-3 at sf0.1, anchor q74 alongside
    * each draw, after the battery drifted 0.439 -> 0.575 on untouched
    * code — the q91 suspicion pattern): this shape is NOT the q91
    * failure mode; the colocated exchange WINS here and stays.
    *   shape                                    q88      anchor q74
    *   repartition(__gh), no checkpoint (THIS)  0.486 s  0.728 s
    *   no repartition + lcp(bigramCnt)          0.586 s  0.710 s
    *   no repartition, pure AQE                 0.618 s  0.781 s
    *   repartition + lcp(bigramCnt)             0.655 s  0.681 s
    * Why the q91 verdict doesn't transfer: q91's vocab fit REDUCES
    * hard (map-side combine collapses the occurrence stream before the
    * wire), so its pre-agg exchange was pure cost; here the scoring
    * join must move the full occurrence stream to the bigram key
    * ANYWAY (per-doc bigrams rarely repeat, so combine saves little,
    * and the LM side is not broadcastable in general), and the single
    * reused exchange serves both the count agg and the join. The +31%
    * battery read was host-phase drift, uniform across untouched
    * queries that session.
    *
    * RE-ADJUDICATED (r18, after the r17 battery read 0.539 — the only
    * >25% round-over-round mover): same Diag protocol, code untouched
    * since the r15 pin.
    *   shape                                    q88      anchor q74
    *   repartition(__gh), no checkpoint (THIS)  0.596 s  0.696/0.590
    *   no repartition, pure AQE                 0.599 s  0.781/0.629
    *   no repartition + lcp(bigramCnt)          0.693 s  0.737/0.641
    * Ranking unchanged (lcp still worst; AQE ties within noise); the
    * pinned shape keeps the deterministic reused-exchange argument, so
    * it stays. The absolute level moved 0.486 -> ~0.60 while the AQE
    * variant moved 0.618 -> 0.599 and lcp 0.586 -> 0.693 — i.e. the
    * variants wander +-15-20% across sessions in BOTH directions on an
    * 8-job/15-stage query; the r17 battery's 0.539 sits inside that
    * envelope. Phase, not regression. */
  def bigramFluency(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // bigram and prefix keys are ENGINE-INTERNAL (output = per-doc
    // integer scores), so every exchange carries xxhash64 longs, never
    // the bigram text: (gh, wh) = hash of the word pair / its first
    // word, computed in the same map-side transform that windows the
    // word array (wh rides along because the prefix c(w1 ·) aggregation
    // and the LM join both need it; it is functionally dependent on gh,
    // so max() re-derives it per bigram group). A 64-bit collision
    // (~10^-9 at 10^5 distinct bigrams) merges two LM cells — same
    // accepted-risk class as substringDedup/dupGramFraction.
    val occ = Shingles.explodeShingles(df, idCol, textCol, 2)
      .select(col(idCol), xxhash64(col("shingle")).as("__gh"),
        xxhash64(substring_index(col("shingle"), " ", 1)).as("__wh"))
      .repartition(col("__gh"))
    val bigramCnt = occ.groupBy(col("__gh"))
      .agg(count(lit(1)).as("__cb"), max(col("__wh")).as("__wh"))
    val prefixCnt = bigramCnt.groupBy(col("__wh"))
      .agg(sum(col("__cb")).as("__cw"))
    val lm = bigramCnt.join(prefixCnt, "__wh")
      .select(col("__gh"),
        expr("CAST((10000 * __cb) DIV __cw AS BIGINT)").as("__w"))
    occ.join(lm, "__gh")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("__w")).as("score"))
      .select(col(idCol), col("n_bigrams"), col("score"),
        expr("CAST(score DIV n_bigrams AS BIGINT)").as("fluency_bp"))
  }
}
