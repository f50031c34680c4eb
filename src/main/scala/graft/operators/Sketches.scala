package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/**
 * Mergeable cardinality sketch (beyond-reference surface): K-minimum-values
 * (KMV) distinct-count estimation — the sketch family behind "how many
 * distinct urlkeys / digests / hosts" at 100 TB, where an exact
 * countDistinct shuffles every distinct value.
 *
 * Why KMV and not HyperLogLog: identical inputs give identical sketches in
 * ANY engine that can md5 — the k smallest distinct hash values are a pure
 * function of the value set, so the estimate is reproducible (and
 * oracle-checkable) cross-engine, bit for bit. HLL implementations differ
 * in hash and bias correction and cannot be verified externally.
 *
 * Estimator (Beyer et al., "On Synopses for Distinct-Value Estimation
 * Under Multiset Operations", SIGMOD'07): with h_k = k-th smallest of n
 * distinct 48-bit hashes, est = (k-1) * 2^48 / h_k; when fewer than k
 * distinct hashes exist the sketch is exact.
 *
 * Scale shape: one codegen'd projection computes the 48-bit hash, a
 * per-partition bounded heap keeps each partition's k smallest DISTINCT
 * hashes (mapPartitions — emits <= k rows per partition, the only
 * non-codegen step and it runs on already-projected longs), and the
 * global merge sees <= k * numPartitions rows. No shuffle ever carries
 * more than that; an exact distinct would shuffle every distinct value.
 * The per-partition sketch is the mergeable form — unions of sketches
 * (cross-file, cross-day) compose by the same merge.
 */
object Sketches {

  val HashBits = 48

  /** 48-bit value hash: first 12 hex chars of md5 — small enough that
    * (k-1) * 2^48 stays in a signed 64-bit long for k up to 32768, and
    * reproducible in any engine with md5 + hex parsing (the oracle
    * computes `conv(substring(md5(cast(v as varchar)), 1, 12), 16, 10)`
    * verbatim). The engine side computes the SAME number through the
    * fused native expression — the built-in md5+conv chain allocates a
    * digest, a hex string, and a radix-parse per ROW, which at sf0.1
    * was ~half of q74's wall time (0.57 s vs 0.11 s for the projection
    * alone; the fused call removes all three allocations). */
  private def hash48(value: org.apache.spark.sql.Column) =
    graft.functions.Md5Functions.md5Prefix48(value.cast("string"))

  /** One-row estimate: (n_mins, h_k, est_distinct) over the distinct set
    * of `valueCol`. Exact (est = count) below k distinct values. NULLs are
    * excluded from the estimate — the same semantics as countDistinct
    * (and md5(NULL) would otherwise poison the non-nullable hash pipe). */
  def kmvDistinct(df: DataFrame, valueCol: String, k: Int): DataFrame = {
    require(k >= 2 && k <= 32768, s"k must be in [2, 32768], got $k")
    val hashes = df.where(col(valueCol).isNotNull)
      .select(hash48(col(valueCol)).as("hv"))
      .as(Encoders.scalaLong)
    val partMins = hashes.mapPartitions(bottomK(_, k))(Encoders.scalaLong)
    val mins = partMins.toDF("hv").distinct().orderBy(col("hv")).limit(k)
    mins.agg(count(lit(1)).as("n_mins"), max(col("hv")).as("h_k"))
      .select(col("n_mins"), col("h_k"),
        when(col("n_mins") < k, col("n_mins")).otherwise(
          expr(s"CAST(${k - 1} AS BIGINT) * ${1L << HashBits} DIV h_k"))
          .as("est_distinct"))
  }

  /** Deterministic mergeable approximate quantiles over an integer
    * column (beyond-reference surface) — the scale companion to exact
    * per-group percentiles (q58): exact `percentile` over 100 TB
    * shuffles one row per distinct (group, value), while this bounds
    * the wire at k values regardless of domain size, and unlike
    * `percentile_approx` (whose sketch merge is implementation- and
    * partition-order-specific) it is a PURE FUNCTION of the value set +
    * counts, so an external engine replays it bit-for-bit.
    *
    * Construction: the sample is the k distinct values with the
    * smallest (48-bit md5 hash, value) pairs — the same KMV bottom-k
    * idea as [[kmvDistinct]], so it is deterministic and mergeable
    * (union of samples, re-truncated to k, is the sample of the
    * union). Exact counts for JUST the sampled values come from a
    * second pass whose aggregation carries at most k groups. The
    * p-basis-point quantile estimate is the smallest sampled value
    * whose cumulative sampled count reaches p/10000 of the total
    * sampled count — an all-integer ratio estimator (distinct-value
    * sampling, Beyer et al. SIGMOD'07 lineage): exact when the domain
    * has <= k distinct values, and at larger domains its error follows
    * the count-variance of the uniform value sample.
    *
    * Scale shape, two selectable plans with identical output:
    *
    *  - `preAggregate = false` (default, unbounded domains): ONE scan
    *    through per-partition COUNTING heaps — each partition's k
    *    smallest distinct (hash, value) pairs with exact local
    *    occurrence counts (see the in-body proof that evicted pairs
    *    can't be global survivors), merged by a count-summing heap over
    *    one exchange of <= k·partitions rows.
    *  - `preAggregate = true` (bounded domains — prices, lengths,
    *    scores: the common quantile targets): one `groupBy(value)`
    *    count first (map-side partial, wire = per-partition distinct
    *    values), then hash + bottom-k run over the distinct table and
    *    the counts ride the same rows — ONE scan, no broadcast, no
    *    second pass. Wins whenever shuffling the distinct set is
    *    cheaper than re-scanning the corpus; loses on near-unique
    *    domains where the distinct set IS the corpus.
    *
    * The final cumulative fold runs on <= k rows either way. */
  def kmvQuantiles(df: DataFrame, valueCol: String, k: Int,
                   probesBp: Seq[Int] = Seq(100, 1000, 2500, 5000,
                     7500, 9000, 9900),
                   preAggregate: Boolean = false): DataFrame = {
    require(k >= 2 && k <= 32768, s"k must be in [2, 32768], got $k")
    require(probesBp.nonEmpty && probesBp.forall(p => p >= 1 && p <= 10000),
      s"probesBp must be basis points in [1, 10000], got $probesBp")
    import df.sparkSession.implicits._
    val vals = df.where(col(valueCol).isNotNull)
      .select(col(valueCol).cast("long").as("v"))
    val counts: DataFrame = if (preAggregate) {
      // one-scan plan: distinct counts first, then hash + bottom-k over
      // the (already distinct) value table — counts ride the heap rows
      val enc3 = Encoders.tuple(
        Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong)
      val byValue = vals.groupBy(col("v")).agg(count(lit(1)).as("cnt"))
        .select(hash48(col("v")).as("hv"), col("v"), col("cnt"))
        .as(enc3)
      // (hv, v) is unique after the groupBy, so the lexicographic
      // (hv, v, cnt) ordering never reaches cnt — same admission order
      // as the two-pass plan
      byValue.mapPartitions(bottomK(_, k))(enc3)
        .repartition(1)
        .mapPartitions(bottomK(_, k))(enc3)
        .toDF("hv", "v", "cnt")
        .select(col("v"), col("cnt"))
    } else {
      // ONE-pass counting heap: each partition keeps its k smallest
      // DISTINCT (hash, value) pairs WITH exact local occurrence counts
      // (value in the order key breaks 48-bit collisions
      // deterministically). Local counts are exact for every GLOBAL
      // survivor: a pair rejected or evicted by partition p's heap has k
      // distinct smaller pairs inside p alone, so it cannot be among the
      // global k smallest — and rejection is permanent (the heap's max
      // only decreases), so every occurrence of a locally-surviving pair
      // was counted while it sat in the heap. The global merge is the
      // same heap SUMMING counts of equal pairs across partitions, over
      // one exchange of <= k-per-partition rows. One corpus scan, wire
      // bounded by k·partitions — replaces the former two-scan plan
      // (sample pass + broadcast-semi count pass), which read the corpus
      // twice for the same output.
      val enc3 = Encoders.tuple(
        Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong)
      val hashed = vals.select(hash48(col("v")).as("hv"), col("v"))
        .as(Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong))
      hashed.mapPartitions(bottomKCounting(_, k))(enc3)
        // NOT coalesce(1), which would narrowly fuse the per-partition
        // heaps into a single serial task
        .repartition(1)
        .mapPartitions(bottomKSumming(_, k))(enc3)
        .toDF("hv", "v", "cnt")
        .select(col("v"), col("cnt"))
    }
    // <= k rows: collapse the cumulative distribution + probe lookup
    // into ONE single-partition aggregation and one codegen'd projection
    // over the sorted (v, cnt) array — a window + probe-crossJoin +
    // groupBy tail re-shuffles these k rows twice for the same result
    val probesArr = array(probesBp.map(p => lit(p)): _*)
    counts
      .agg(sort_array(collect_list(struct(col("v"), col("cnt")))).as("a"))
      .where(size(col("a")) > 0) // empty input -> 0 rows, not null probes
      .select(explode(probesArr).as("p_bp"), col("a"),
        aggregate(col("a"), lit(0L), (acc, x) => acc + x("cnt")).as("total"))
      .select(col("p_bp"),
        // smallest sampled v whose cumulative count reaches p/10000 of
        // the total: fold with (cum, found) state, keep the first hit
        aggregate(col("a"),
          struct(lit(0L).as("cum"), lit(null).cast("long").as("found")),
          (s, x) => {
            val cum = s("cum") + x("cnt")
            struct(cum.as("cum"),
              coalesce(s("found"),
                when(cum * 10000 >= col("p_bp") * col("total"), x("v")))
                .as("found"))
          }).getField("found").as("value"))
  }

  /** EXACT heavy hitters — every value whose count strictly exceeds
    * total/k, with its exact count — without ever shuffling the full
    * value distribution (beyond-reference surface: frequent tokens /
    * domains / digests over a 100 TB corpus, where a plain
    * groupBy-then-filter shuffles one row per distinct value and the
    * long tail IS the corpus).
    *
    * Two passes, both wire-bounded:
    *
    *  1. Per-partition Misra-Gries summaries with k-1 counters
    *     (mapPartitions over the codegen-projected values — each
    *     partition emits <= k-1 candidate values). The union of
    *     per-partition candidates is a SUPERSET of the global heavy
    *     hitters: if x is absent from partition p's summary then
    *     count_p(x) <= N_p/k (the MG guarantee), so a value absent from
    *     every summary has count <= N/k and cannot be heavy. At most
    *     (k-1)·numPartitions candidate rows exist, ever.
    *  2. One exact aggregation whose group count is bounded by the
    *     candidate set + 1: values stream map-side through a broadcast
    *     join against the candidates, non-candidates collapse into a
    *     single NULL group (they only contribute to the total), and the
    *     HAVING filter `cnt * k > total` runs on the tiny aggregate.
    *
    * Exact, deterministic, engine-replayable (the oracle is a plain
    * GROUP BY + HAVING). Output: (value, cnt, share_bp) with share_bp =
    * 10000·cnt DIV total. NULLs are excluded (same semantics as
    * countDistinct-family aggregates).
    *
    * Perf pin (r15 Diag min-of-3 at sf0.1: 0.558 s, 7 jobs/11 stages,
    * anchor q74 0.873 — a slow host phase): the wall is the two
    * wire-bounded corpus passes (MG summaries, then the
    * candidate-marked exact count — the second pass re-derives the
    * token projection rather than materializing a corpus-scale token
    * table, deliberately) plus the 7-job floor; the oracle's one
    * vectorized GROUP BY+HAVING over the 31-token fixture vocabulary
    * replays in ~0.07 s, so the bench ratio is the fixture's tiny
    * vocabulary, not a plan gap — at a real heavy-hitter cardinality
    * the plain-groupBy oracle shape is the one that dies (one shuffle
    * row per distinct value), which is the operator's whole point. */
  def heavyHitters(df: DataFrame, valueCol: String, k: Int): DataFrame = {
    require(k >= 2 && k <= 100000, s"k must be in [2, 100000], got $k")
    import df.sparkSession.implicits._
    val vals = df.where(col(valueCol).isNotNull)
      .select(col(valueCol).cast("string").as("v"))
    val cands = vals.as(Encoders.STRING)
      .mapPartitions(misraGries(_, k))(Encoders.STRING)
      .toDF("v").distinct()
    val marked = vals.join(
      broadcast(cands.withColumn("__cand", lit(1))), Seq("v"), "left")
    // two consumers (the total and the HAVING filter) — materialize the
    // <= candidates+1 row aggregate once instead of re-deriving the
    // corpus pass per consumer (same trade as tfIdf's tf table)
    val grouped = marked
      .groupBy(when(col("__cand").isNotNull, col("v")).as("value"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint(eager = false)
    val total = grouped.agg(sum(col("cnt")).as("total"))
    grouped.where(col("value").isNotNull)
      .crossJoin(broadcast(total))
      .where(col("cnt") * k > col("total"))
      .select(col("value"), col("cnt"),
        expr("CAST((10000 * cnt) DIV total AS BIGINT)").as("share_bp"))
  }

  /** Deterministic Bloom-filter membership probe — the incremental-dedup
    * primitive: "which documents of today's batch might already exist in
    * the historical corpus?" At 100 TB the history side cannot be
    * shuffle-anti-joined per batch; a Bloom filter reduces it to a
    * fixed-size bitset built ONCE and broadcast, and the probe is a pure
    * map-side projection over the new batch — zero shuffle on the batch,
    * no join at all.
    *
    * Partitioned Bloom (one stripe of 16^prefixLen bits per seed):
    * position_i(key) = i·B + int(md5("i:"+key)[0, prefixLen)), B =
    * 16^prefixLen. The bit positions are a pure function of the key —
    * any engine with md5 replays them, so the probe (unlike a library
    * Bloom with private hash mixing) is oracle-checkable bit for bit.
    *
    * Guarantees: NO false negatives — a key present in the history always
    * probes all `seeds` bits set (the exactness property incremental
    * dedup needs: "definitely new" is always safe to keep). False
    * positives ≈ (1 − e^(−n/B))^seeds for n distinct history keys; size
    * prefixLen so n/B ≲ 1 (prefixLen 6 = 16.7M bits/stripe = 2 MiB/seed
    * broadcast, good to ~10M keys/batch-partition-of-history at fp≈4%
    * with 3 seeds; shard larger histories into per-range filters).
    *
    * Scale shape: the history pass is one codegen'd projection +
    * map-side-partial DISTINCT whose output is bounded by seeds·B rows
    * (the FILTER'S size, independent of history size) — collected,
    * packed into a long[] bitset, broadcast. The probe side computes its
    * seed positions in codegen and tests the broadcast bitset O(1) per
    * seed; the only non-codegen step is the bitset lookup itself.
    *
    * Output: `newDf` + (bloom_hits, maybe_member); maybe_member ⇔ all
    * `seeds` positions set. NULL keys probe 0 hits (never a member). */
  def bloomProbe(newDf: DataFrame, keyCol: String,
                 history: DataFrame, histKeyCol: String,
                 seeds: Int = 3, prefixLen: Int = 4): DataFrame = {
    require(seeds >= 1 && seeds <= 8, s"seeds must be in [1, 8], got $seeds")
    require(prefixLen >= 1 && prefixLen <= 6,
      s"prefixLen must be in [1, 6], got $prefixLen")
    val stripe = 1L << (4 * prefixLen)
    // first prefixLen hex chars of the seed-tagged md5 = the top
    // 4·prefixLen bits of the fused 48-bit prefix (same number the
    // oracle derives from the hex string; bijection per seed stripe)
    def posIdx(key: org.apache.spark.sql.Column, i: Int) =
      shiftrightunsigned(graft.functions.Md5Functions.md5Prefix48(
        concat(lit(s"$i:"), key.cast("string"))), 48 - 4 * prefixLen) +
        lit(i * stripe)
    val positions = history.where(col(histKeyCol).isNotNull)
      .select(explode(array(
        (0 until seeds).map(i => posIdx(col(histKeyCol), i)): _*)).as("pos"))
      .distinct()
      .select(col("pos")).as(Encoders.scalaLong)
      .collect()
    val words = new Array[Long]((((seeds * stripe) + 63) >>> 6).toInt)
    positions.foreach(p => words((p >>> 6).toInt) |= (1L << (p & 63)))
    val bc = newDf.sparkSession.sparkContext.broadcast(words)
    val hitsOf = udf((ps: Seq[Long]) => ps.count { p =>
      (bc.value((p >>> 6).toInt) & (1L << (p & 63))) != 0L
    }.toLong)
    val probe = when(col(keyCol).isNotNull,
      hitsOf(array((0 until seeds).map(i => posIdx(col(keyCol), i)): _*)))
      .otherwise(lit(0L))
    newDf.withColumn("bloom_hits", probe)
      .withColumn("maybe_member", col("bloom_hits") === seeds)
  }

  /** Count-Min sketch (Cormode & Muthukrishnan '05), built and probed
    * in one query: `d` hash rows × `w` buckets, each cell the count of
    * values hashing into it; a value's frequency estimate is the MIN of
    * its d cells — always >= the true count, since collisions only ADD
    * (an in-data invariant the oracle replays). Scale shape: the build
    * is ONE hash aggregation whose map-side partials bound the wire at
    * d·w cells per partition REGARDLESS of corpus size, and the
    * finished sketch (<= d·w rows) broadcasts to the probe side — the
    * classic mergeable summary (sketches over disjoint corpora add
    * cell-wise, the same contract as the KMV family). Hashing is the
    * engine-replayable 48-bit md5 prefix of "i:value" mod w.
    *
    * `probePred` selects which values to report and must be a
    * deterministic function of `valueCol` (it filters the corpus rows
    * whose values are probed; a row-dependent predicate would make
    * cnt_true a subset count). Output: one row per distinct probe
    * value — (value, cnt_true, est). */
  def countMinEstimates(df: DataFrame, valueCol: String, d: Int, w: Int,
                        probePred: org.apache.spark.sql.Column): DataFrame = {
    require(d >= 1 && d <= 8, s"d must be in [1, 8], got $d")
    require(w >= 2 && w <= (1 << 20), s"w must be in [2, 2^20], got $w")
    def bucketOf(i: Int, v: org.apache.spark.sql.Column) =
      hash48(concat(lit(s"$i:"), v)) % lit(w.toLong)
    val vals = df.where(col(valueCol).isNotNull)
      .select(col(valueCol).cast("string").as("v"))
    val cells = vals
      .select(posexplode(array(
        (0 until d).map(i => bucketOf(i, col("v"))): _*))
        .as(Seq("row_i", "bucket")))
      .groupBy(col("row_i"), col("bucket"))
      .agg(count(lit(1)).as("c"))
    val probes = df.where(col(valueCol).isNotNull).where(probePred)
      .groupBy(col(valueCol).cast("string").as("v"))
      .agg(count(lit(1)).as("cnt_true"))
    probes
      .select(col("v"), col("cnt_true"), posexplode(array(
        (0 until d).map(i => bucketOf(i, col("v"))): _*))
        .as(Seq("row_i", "bucket")))
      // left join: DEFENSIVE only — probes are derived from df itself,
      // so every probed value exists in the corpus (cnt_true >= 1) and
      // its d cells were all touched; the null branch is unreachable
      // today. It is kept so a future external probe list (values not
      // drawn from df) degrades to est=0 on untouched cells instead of
      // silently dropping the row.
      .join(broadcast(cells), Seq("row_i", "bucket"), "left")
      .groupBy(col("v"), col("cnt_true"))
      .agg(min(coalesce(col("c"), lit(0L))).as("est"))
      .select(col("v").as("value"), col("cnt_true"), col("est"))
  }

  /** HyperLogLog registers + the RAW estimator, all-integer (Flajolet
    * et al. '07): the 48-bit value hash splits into a 2^bucketBits-way
    * register index (top bits) and a suffix whose leading-zeros rank
    * (zeros+1 = suffixBits+1 - length(bin(suffix)), an integer both
    * engines compute identically) each register MAXes over — bounded
    * mergeable state (m registers, <= 6 bits each; sketches over
    * disjoint corpora merge register-wise by max, the HLL contract KMV
    * lacks a fixed-size analogue of). The harmonic denominator
    * S = Σ_j 2^(suffixBits+1 − M_j) is EXACT in a long (M_j = 0 for
    * never-touched registers), and the raw estimate α·m²/Σ2^(−M_j) is
    * the integer (709 · ((m²·2^(suffixBits+1)) DIV S)) DIV 1000
    * (α₆₄ ≈ 0.709 in per-mille; truncation order fixed so any 64-bit
    * engine replays it bit-for-bit — m²·2^(suffixBits+1) <= 2^57 at the
    * max bucketBits, and the first quotient <= 2^49, so nothing wraps).
    * The paper's small/large-range corrections are documented out
    * (ADJUDICATED r18, kept): they need float ln, which no integer
    * truncation order pins across engines, and the regime where they
    * matter is far from the gated one — linear counting applies below
    * n ≈ 2.5·m = 160 at m = 64, while the gate cardinalities sit in
    * the thousands (raw-estimator calibrated range; bias there is the
    * paper's ±1.04/√m ≈ ±13% σ, which the oracle replays exactly
    * anyway since both engines run the SAME integer estimator). A
    * consumer needing LC has everything in the output row: est_LC =
    * m·ln(m/(m−filled)) is a pure function of (m, filled). Large-range
    * correction is moot at 48-bit hashes below ~2^45 distincts.
    * Output one row: (m, filled, s, est_distinct). */
  def hllDistinct(df: DataFrame, valueCol: String,
                  bucketBits: Int = 6): DataFrame = {
    require(bucketBits >= 2 && bucketBits <= 8,
      s"bucketBits must be in [2, 8], got $bucketBits")
    val m = 1L << bucketBits
    val suffixBits = HashBits - bucketBits
    val sb1 = suffixBits + 1
    val twoSuf = 1L << suffixBits
    val hv = hash48(col(valueCol))
    val regs = df.where(col(valueCol).isNotNull)
      .select(shiftrightunsigned(hv, suffixBits).as("bucket"),
        (hv % lit(twoSuf)).as("suffix"))
      .select(col("bucket"),
        when(col("suffix") === 0, lit(sb1))
          .otherwise(lit(sb1) - length(bin(col("suffix")))).as("rank"))
      .groupBy(col("bucket")).agg(max(col("rank")).as("mj"))
    regs
      .agg(count(lit(1)).as("filled"),
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), CAST($sb1 - mj AS INT))"))
          .as("sobs"))
      .select(lit(m).as("m"), col("filled"),
        (coalesce(col("sobs"), lit(0L)) +
          (lit(m) - col("filled")) * lit(1L << sb1)).as("s"))
      .select(col("m"), col("filled"), col("s"),
        expr(s"(709 * ((${m * m} * CAST(${1L << sb1} AS BIGINT)) DIV s)) " +
          "DIV 1000").as("est_distinct"))
  }

  /** Fixed-size HLL register buffer for the per-group tier: m bytes,
    * period — unlike [[KmvBuffer]] it never grows with the data, so a
    * billion-group aggregation carries exactly m bytes per group
    * through the hash-agg. */
  final case class HllBuffer(regs: Array[Byte])

  /** Per-group [[hllDistinct]] as a typed Aggregator over pre-hashed
    * 48-bit values ([[hash48Col]] — same input convention as
    * [[kmvGroupAgg]]): registers max in place, partials merge
    * register-wise (the HLL merge), and finish computes the IDENTICAL
    * all-integer raw estimator as the one-shot form (same truncation
    * order, so the two tiers and any external replay agree exactly).
    * Output per group: (filled, s, est_distinct). */
  def hllGroupAgg(bucketBits: Int): org.apache.spark.sql.expressions
      .Aggregator[java.lang.Long, HllBuffer, (Long, Long, Long)] = {
    require(bucketBits >= 2 && bucketBits <= 8,
      s"bucketBits must be in [2, 8], got $bucketBits")
    val m = 1 << bucketBits
    val suffixBits = HashBits - bucketBits
    val sb1 = suffixBits + 1
    val mask = (1L << suffixBits) - 1
    new org.apache.spark.sql.expressions
        .Aggregator[java.lang.Long, HllBuffer, (Long, Long, Long)] {
      override def zero: HllBuffer = HllBuffer(new Array[Byte](m))
      override def reduce(b: HllBuffer, hv: java.lang.Long): HllBuffer = {
        if (hv == null) return b
        val h = hv.longValue()
        val bucket = (h >>> suffixBits).toInt
        val suffix = h & mask
        // rank = leading zeros of the suffix + 1 = sb1 - bitLength;
        // 64 - numberOfLeadingZeros IS bitLength (0 for suffix = 0)
        val rank =
          (sb1 - (64 - java.lang.Long.numberOfLeadingZeros(suffix))).toByte
        if (rank > b.regs(bucket)) b.regs(bucket) = rank
        b
      }
      override def merge(x: HllBuffer, y: HllBuffer): HllBuffer = {
        var i = 0
        while (i < m) {
          if (y.regs(i) > x.regs(i)) x.regs(i) = y.regs(i)
          i += 1
        }
        x
      }
      override def finish(b: HllBuffer): (Long, Long, Long) = {
        var filled = 0L; var s = 0L; var i = 0
        while (i < m) {
          val mj = b.regs(i)
          if (mj > 0) filled += 1
          s += 1L << (sb1 - mj)
          i += 1
        }
        (filled, s, 709L * ((m.toLong * m * (1L << sb1)) / s) / 1000L)
      }
      override def bufferEncoder: org.apache.spark.sql.Encoder[HllBuffer] =
        org.apache.spark.sql.Encoders.product[HllBuffer]
      override def outputEncoder
          : org.apache.spark.sql.Encoder[(Long, Long, Long)] =
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
          Encoders.scalaLong)
    }
  }

  /** Misra-Gries frequent-items summary with k-1 counters: counted
    * values increment; a novel value either takes a free counter or
    * decrements ALL counters (dropping zeros). Each decrement round
    * retires k-1 counts plus the arriving element, so total work is
    * O(n) amortized, O(k) memory. Survivors' true partition counts
    * exceed N_p/k - (undercount), which is all the candidate-superset
    * proof needs. */
  private def misraGries(it: Iterator[String], k: Int): Iterator[String] = {
    val counters = new java.util.HashMap[String, Long]()
    it.foreach { v =>
      val c = counters.getOrDefault(v, 0L)
      if (c != 0L) counters.put(v, c + 1)
      else if (counters.size < k - 1) counters.put(v, 1L)
      else {
        val e = counters.entrySet().iterator()
        while (e.hasNext) {
          val ent = e.next()
          if (ent.getValue == 1L) e.remove() else ent.setValue(ent.getValue - 1)
        }
      }
    }
    import scala.jdk.CollectionConverters._
    counters.keySet().iterator().asScala.toList.iterator
  }

  /** PER-GROUP KMV distinct sketch as a typed [[org.apache.spark.sql
    * .expressions.Aggregator]] — the custom-aggregate extension tier:
    * the GLOBAL sketch ([[kmvDistinct]]) runs as a mapPartitions heap,
    * but "distinct urlkeys per HOST over 100 TB" needs the sketch to
    * live INSIDE a groupBy aggregation buffer so Spark's hash aggregate
    * owns the grouping (map-side partial sketches merge exactly — KMV's
    * union-then-truncate IS its merge). Register with
    * `functions.udaf(kmvGroupAgg(k))`; input is the 48-bit value hash
    * (project [[hash48Col]] first so the crypto work stays in codegen),
    * output the same (n_mins, h_k, est_distinct) struct as the global
    * sketch.
    *
    * Buffer = sorted distinct Array[Long] capped at k: admission is a
    * binary search; the O(k) arraycopy only runs on admission, which
    * after warm-up is rare (the k-th smallest of n hashes admits with
    * probability ~k/n). */
  final case class KmvBuffer(mins: Array[Long])

  def kmvGroupAgg(k: Int): org.apache.spark.sql.expressions
      .Aggregator[java.lang.Long, KmvBuffer, (Long, Long, Long)] = {
    require(k >= 2 && k <= 32768, s"k must be in [2, 32768], got $k")
    new org.apache.spark.sql.expressions
        .Aggregator[java.lang.Long, KmvBuffer, (Long, Long, Long)] {
      override def zero: KmvBuffer = KmvBuffer(Array.empty[Long])
      private def insert(b: KmvBuffer, hv: Long): KmvBuffer = {
        val a = b.mins
        val pos = java.util.Arrays.binarySearch(a, hv)
        if (pos >= 0) return b                       // already present
        if (a.length >= k && hv > a(a.length - 1)) return b
        val ins = -pos - 1
        val n = math.min(a.length + 1, k)
        val out = new Array[Long](n)
        System.arraycopy(a, 0, out, 0, ins)
        out(ins) = hv
        System.arraycopy(a, ins, out, ins + 1, n - ins - 1)
        KmvBuffer(out)
      }
      override def reduce(b: KmvBuffer, hv: java.lang.Long): KmvBuffer =
        if (hv == null) b else insert(b, hv.longValue())
      override def merge(x: KmvBuffer, y: KmvBuffer): KmvBuffer = {
        // both sides are sorted+distinct: one linear merge-and-truncate
        // (an element-wise insert fold would be O(k^2) copies per merge
        // — the hot path of map-side partial combination)
        val a = x.mins; val b = y.mins
        if (a.isEmpty) return y
        if (b.isEmpty) return x
        val out = new Array[Long](math.min(a.length + b.length, k))
        var i = 0; var j = 0; var o = 0
        while (o < out.length && (i < a.length || j < b.length)) {
          val takeA = j >= b.length || (i < a.length && a(i) <= b(j))
          val v = if (takeA) a(i) else b(j)
          if (takeA) i += 1 else j += 1
          if (o == 0 || out(o - 1) != v) { out(o) = v; o += 1 }
        }
        KmvBuffer(if (o == out.length) out
          else java.util.Arrays.copyOf(out, o))
      }
      override def finish(b: KmvBuffer): (Long, Long, Long) = {
        val n = b.mins.length.toLong
        if (n == 0L) (0L, 0L, 0L)
        else {
          val hk = b.mins(b.mins.length - 1)
          val est = if (n < k) n else (k - 1).toLong * (1L << HashBits) / hk
          (n, hk, est)
        }
      }
      override def bufferEncoder: org.apache.spark.sql.Encoder[KmvBuffer] =
        org.apache.spark.sql.Encoders.product[KmvBuffer]
      override def outputEncoder
          : org.apache.spark.sql.Encoder[(Long, Long, Long)] =
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
          Encoders.scalaLong)
    }
  }

  /** The sketch's input hash as a public projection (the same 48-bit
    * md5 prefix as the global sketch — oracle-replayable). */
  def hash48Col(value: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    hash48(value)

  /** Per-group KMV approximate QUANTILES as a typed Aggregator — the
    * missing cell next to q74 (global approx) and q58 (per-group
    * exact): "p50/p99 doc length per source" without sorting whole
    * groups. The buffer is a counting KMV: the group's k smallest
    * distinct values by 48-bit hash, each with its EXACT occurrence
    * count — the same eviction-soundness argument as the global
    * one-pass heap, group-scoped (a value evicted from or refused by a
    * partial had k group-local smaller hashes in that partition, which
    * survive every merge, so it can never be a global survivor and its
    * lost counts never matter). Finish sorts the sample by VALUE and
    * probes the cumulative counts at 2500/5000/9900 bp with the q74
    * convention (smallest v with cum·10⁴ ≥ p·total). Input is the
    * (hash48, value) pair — hash in codegen via [[hash48Col]], never a
    * digest per row inside the buffer. */
  final case class KmvQBuf(hs: Array[Long], vs: Array[Long],
                           cs: Array[Long])

  def kmvQuantilesGroupAgg(k: Int): org.apache.spark.sql.expressions
      .Aggregator[(Long, Long), KmvQBuf, (Long, Long, Long)] = {
    require(k >= 2 && k <= 32768, s"k must be in [2, 32768], got $k")
    new org.apache.spark.sql.expressions
        .Aggregator[(Long, Long), KmvQBuf, (Long, Long, Long)] {
      override def zero: KmvQBuf =
        KmvQBuf(Array.empty, Array.empty, Array.empty)

      override def reduce(b: KmvQBuf, in: (Long, Long)): KmvQBuf = {
        val (hv, v) = in
        val pos = java.util.Arrays.binarySearch(b.hs, hv)
        if (pos >= 0) { b.cs(pos) += 1L; b }        // exact count bump
        else if (b.hs.length >= k && hv > b.hs(b.hs.length - 1)) b
        else {
          val ins = -pos - 1
          val n = math.min(b.hs.length + 1, k)
          val hs = new Array[Long](n); val vs = new Array[Long](n)
          val cs = new Array[Long](n)
          System.arraycopy(b.hs, 0, hs, 0, ins)
          System.arraycopy(b.vs, 0, vs, 0, ins)
          System.arraycopy(b.cs, 0, cs, 0, ins)
          hs(ins) = hv; vs(ins) = v; cs(ins) = 1L
          System.arraycopy(b.hs, ins, hs, ins + 1, n - ins - 1)
          System.arraycopy(b.vs, ins, vs, ins + 1, n - ins - 1)
          System.arraycopy(b.cs, ins, cs, ins + 1, n - ins - 1)
          KmvQBuf(hs, vs, cs)
        }
      }

      override def merge(x: KmvQBuf, y: KmvQBuf): KmvQBuf = {
        if (x.hs.isEmpty) return y
        if (y.hs.isEmpty) return x
        val n = math.min(x.hs.length + y.hs.length, k)
        val hs = new Array[Long](n); val vs = new Array[Long](n)
        val cs = new Array[Long](n)
        var i = 0; var j = 0; var o = 0
        while (o < n && (i < x.hs.length || j < y.hs.length)) {
          val takeX = j >= y.hs.length ||
            (i < x.hs.length && x.hs(i) <= y.hs(j))
          if (takeX && j < y.hs.length && i < x.hs.length &&
              x.hs(i) == y.hs(j)) {
            hs(o) = x.hs(i); vs(o) = x.vs(i); cs(o) = x.cs(i) + y.cs(j)
            i += 1; j += 1; o += 1
          } else if (takeX) {
            hs(o) = x.hs(i); vs(o) = x.vs(i); cs(o) = x.cs(i)
            i += 1; o += 1
          } else {
            hs(o) = y.hs(j); vs(o) = y.vs(j); cs(o) = y.cs(j)
            j += 1; o += 1
          }
        }
        if (o == n) KmvQBuf(hs, vs, cs)
        else KmvQBuf(java.util.Arrays.copyOf(hs, o),
          java.util.Arrays.copyOf(vs, o), java.util.Arrays.copyOf(cs, o))
      }

      override def finish(b: KmvQBuf): (Long, Long, Long) = {
        if (b.hs.isEmpty) return (0L, 0L, 0L)
        val order = b.vs.indices.sortBy(b.vs(_))
        val total = b.cs.sum
        def probe(pBp: Long): Long = {
          var cum = 0L
          var out = b.vs(order.last)
          var found = false
          order.foreach { idx =>
            if (!found) {
              cum += b.cs(idx)
              if (cum * 10000L >= pBp * total) { out = b.vs(idx); found = true }
            }
          }
          out
        }
        (probe(2500L), probe(5000L), probe(9900L))
      }

      override def bufferEncoder: org.apache.spark.sql.Encoder[KmvQBuf] =
        org.apache.spark.sql.Encoders.product[KmvQBuf]
      override def outputEncoder
          : org.apache.spark.sql.Encoder[(Long, Long, Long)] =
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
          Encoders.scalaLong)
    }
  }

  /** Per-group KMV MIN-SET aggregator — identical admission/merge
    * machinery to [[kmvGroupAgg]], but the finish keeps the sorted min
    * ARRAY (wrapped in the buffer struct) instead of reducing it: the
    * carrier for sketch SET OPERATIONS ([[kmvSetOps]]), where the mins
    * themselves are the mergeable summary. Internal-facing — gate
    * queries only ever emit scalar reductions of it. */
  def kmvMinsAgg(k: Int): org.apache.spark.sql.expressions
      .Aggregator[java.lang.Long, KmvBuffer, KmvBuffer] = {
    val inner = kmvGroupAgg(k)
    new org.apache.spark.sql.expressions
        .Aggregator[java.lang.Long, KmvBuffer, KmvBuffer] {
      override def zero: KmvBuffer = inner.zero
      override def reduce(b: KmvBuffer, hv: java.lang.Long): KmvBuffer =
        inner.reduce(b, hv)
      override def merge(x: KmvBuffer, y: KmvBuffer): KmvBuffer =
        inner.merge(x, y)
      override def finish(b: KmvBuffer): KmvBuffer = b
      override def bufferEncoder: org.apache.spark.sql.Encoder[KmvBuffer] =
        org.apache.spark.sql.Encoders.product[KmvBuffer]
      override def outputEncoder: org.apache.spark.sql.Encoder[KmvBuffer] =
        org.apache.spark.sql.Encoders.product[KmvBuffer]
    }
  }

  /** KMV sketch SET OPERATIONS per group — distinct-count estimates for
    * two corpus versions, their union, their intersection, and a Jaccard
    * similarity, from one bounded sketch per (group, side): the
    * version-drift / overlap monitor that at 100 TB replaces an exact
    * distinct-join (whose shuffle is the full key set).
    *
    * Estimator (Beyer et al. 2007 / the theta-sketch rule): the union
    * sketch is the k smallest of the combined mins; intersection counts
    * union-sketch members present in BOTH sides' sketches (each side's
    * sketch is exactly its k smallest distinct hashes, so membership is
    * decidable from the sketches alone); jaccard = overlap / |union
    * sketch|, intersection-est = jaccard x union-est. All integer
    * arithmetic on 48-bit hashes — any engine replays it exactly.
    *
    * Scale shape: each side is ONE map-side-combinable groupBy whose
    * wire volume is <= k longs per group per partition; the join is
    * |groups|-sized; the set arithmetic is a per-row projection over
    * k-length arrays. Returns (groupCol, est_a, est_b, est_union,
    * jaccard_bp, est_intersect). */
  def kmvSetOps(a: DataFrame, b: DataFrame, groupCol: String,
                hvCol: String, k: Int): DataFrame = {
    require(k >= 2 && k <= 32768, s"k must be in [2, 32768], got $k")
    val sk = org.apache.spark.sql.functions.udaf(kmvMinsAgg(k))
    def side(df: DataFrame, out: String): DataFrame =
      df.groupBy(col(groupCol)).agg(sk(col(hvCol)).as(out))
    // SQL-string form so the intersect estimate composes under integer
    // `div` (Column `/` is DOUBLE division — exactness gone)
    def estSql(c: String): String =
      s"CAST(CASE WHEN size($c) < $k THEN size($c) " +
        s"ELSE CAST(${k - 1} AS BIGINT) * ${1L << HashBits} " +
        s"DIV element_at($c, $k) END AS BIGINT)"
    side(a, "__sa").join(side(b, "__sb"), groupCol)
      .select(col(groupCol), col("__sa.mins").as("__ma"),
        col("__sb.mins").as("__mb"))
      .withColumn("__u", expr(
        s"slice(array_sort(array_distinct(concat(__ma, __mb))), 1, $k)"))
      .withColumn("__common", expr(
        "CAST(size(filter(__u, x -> array_contains(__ma, x) " +
          "AND array_contains(__mb, x))) AS BIGINT)"))
      .select(col(groupCol),
        expr(estSql("__ma")).as("est_a"), expr(estSql("__mb")).as("est_b"),
        expr(estSql("__u")).as("est_union"),
        expr("CAST(10000 * __common div size(__u) AS BIGINT)")
          .as("jaccard_bp"),
        expr(s"CAST(__common * ${estSql("__u")} div size(__u) AS BIGINT)")
          .as("est_intersect"))
  }

  /** PER-GROUP bounded top-k as a typed Aggregator — the groupBy-native
    * form of "top k pages per host": a `row_number() over (partition by
    * host order by score)` window SORTS every group's full contents,
    * while this buffer holds at most k (score, id) pairs per group and
    * map-side partials merge in O(k) — the window's shuffle carries
    * whole groups, this one carries k rows per group per partition.
    * Order: score DESC, id ASC on ties (a total order, deterministic
    * cross-engine). Output: the rank-ordered (score, id) pairs. */
  final case class TopKBuffer(scores: Array[Long], ids: Array[Long])

  def topKGroupAgg(k: Int): org.apache.spark.sql.expressions
      .Aggregator[(Long, Long), TopKBuffer, Seq[(Long, Long)]] = {
    require(k >= 1 && k <= 4096, s"k must be in [1, 4096], got $k")
    new org.apache.spark.sql.expressions
        .Aggregator[(Long, Long), TopKBuffer, Seq[(Long, Long)]] {
      // ranksBefore: (s1, i1) outranks (s2, i2)
      private def before(s1: Long, i1: Long, s2: Long, i2: Long): Boolean =
        s1 > s2 || (s1 == s2 && i1 < i2)
      override def zero: TopKBuffer =
        TopKBuffer(Array.empty[Long], Array.empty[Long])
      override def reduce(b: TopKBuffer, in: (Long, Long)): TopKBuffer = {
        val (s, id) = in
        val n = b.scores.length
        if (n >= k && !before(s, id, b.scores(n - 1), b.ids(n - 1))) return b
        var pos = 0
        while (pos < n && before(b.scores(pos), b.ids(pos), s, id)) pos += 1
        val m = math.min(n + 1, k)
        val os = new Array[Long](m); val oi = new Array[Long](m)
        System.arraycopy(b.scores, 0, os, 0, pos)
        System.arraycopy(b.ids, 0, oi, 0, pos)
        os(pos) = s; oi(pos) = id
        val tail = m - pos - 1
        System.arraycopy(b.scores, pos, os, pos + 1, tail)
        System.arraycopy(b.ids, pos, oi, pos + 1, tail)
        TopKBuffer(os, oi)
      }
      override def merge(x: TopKBuffer, y: TopKBuffer): TopKBuffer = {
        if (x.scores.isEmpty) return y
        if (y.scores.isEmpty) return x
        val m = math.min(x.scores.length + y.scores.length, k)
        val os = new Array[Long](m); val oi = new Array[Long](m)
        var i = 0; var j = 0; var o = 0
        while (o < m) {
          val takeX = j >= y.scores.length || (i < x.scores.length &&
            before(x.scores(i), x.ids(i), y.scores(j), y.ids(j)))
          if (takeX) { os(o) = x.scores(i); oi(o) = x.ids(i); i += 1 }
          else { os(o) = y.scores(j); oi(o) = y.ids(j); j += 1 }
          o += 1
        }
        TopKBuffer(os, oi)
      }
      override def finish(b: TopKBuffer): Seq[(Long, Long)] =
        b.scores.toIndexedSeq.zip(b.ids.toIndexedSeq)
      override def bufferEncoder: org.apache.spark.sql.Encoder[TopKBuffer] =
        org.apache.spark.sql.Encoders.product[TopKBuffer]
      override def outputEncoder
          : org.apache.spark.sql.Encoder[Seq[(Long, Long)]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    }
  }

  /** Per-partition bounded bottom-k over DISTINCT elements: a TreeSet
    * holds the partition's <= k smallest (dedup by membership, strict-lt
    * admission so equal elements never evict, poll after add); O(log k)
    * per element, O(k) memory. Shared by both KMV sketches so the
    * admission invariants live in exactly one place. */
  private def bottomK[T](it: Iterator[T], k: Int)
                        (implicit ord: Ordering[T]): Iterator[T] = {
    val heap = new java.util.TreeSet[T](ord)
    it.foreach { e =>
      if (heap.size < k) heap.add(e)
      else if (ord.lt(e, heap.last())) {
        heap.add(e); if (heap.size > k) heap.pollLast()
      }
    }
    import scala.jdk.CollectionConverters._
    heap.iterator().asScala
  }

  /** Bounded heap of the k smallest (hash, value) pairs with exact
    * occurrence counts for the pairs currently held. Re-occurrences of a
    * held pair increment in O(1) (hash lookup, no tree op); admission /
    * eviction touch the tree only. See the kmvQuantiles one-pass plan
    * for why evicted counts are safely discarded. */
  private def bottomKCounting(it: Iterator[(Long, Long)], k: Int)
      : Iterator[(Long, Long, Long)] = {
    val ord = Ordering.Tuple2[Long, Long]
    val heap = new java.util.TreeMap[(Long, Long), Array[Long]](ord)
    val counts = new java.util.HashMap[(Long, Long), Array[Long]]()
    it.foreach { e =>
      val held = counts.get(e)
      if (held != null) held(0) += 1L
      else if (heap.size < k || ord.lt(e, heap.lastKey())) {
        val c = Array(1L)
        heap.put(e, c); counts.put(e, c)
        if (heap.size > k) counts.remove(heap.pollLastEntry().getKey)
      }
    }
    import scala.jdk.CollectionConverters._
    heap.entrySet().iterator().asScala
      .map(en => (en.getKey._1, en.getKey._2, en.getValue()(0)))
  }

  /** Merge stage of the counting heap: same bottom-k order, counts of
    * equal (hash, value) pairs SUMMED across partition summaries. */
  private def bottomKSumming(it: Iterator[(Long, Long, Long)], k: Int)
      : Iterator[(Long, Long, Long)] = {
    val ord = Ordering.Tuple2[Long, Long]
    val heap = new java.util.TreeMap[(Long, Long), Array[Long]](ord)
    it.foreach { case (hv, v, cnt) =>
      val key = (hv, v)
      val held = heap.get(key)
      if (held != null) held(0) += cnt
      else if (heap.size < k || ord.lt(key, heap.lastKey())) {
        heap.put(key, Array(cnt))
        if (heap.size > k) heap.pollLastEntry()
      }
    }
    import scala.jdk.CollectionConverters._
    heap.entrySet().iterator().asScala
      .map(en => (en.getKey._1, en.getKey._2, en.getValue()(0)))
  }
}
