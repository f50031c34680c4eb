package graft.operators.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deterministic spherical k-means (Lloyd) over an embedding column —
 * the codebook TRAINER behind the IVF assignment path
 * ([[AnnOps.ivfTopKWithCodebook]] consumes a codebook; this produces
 * one), and the cluster step of cluster-based curation (SemDeDup-style
 * pipelines: cluster, then prune within clusters).
 *
 * Engine-portable determinism — every quantity either is an exact
 * integer or is the same IEEE-754 double in any engine:
 *  - vectors are integer-quantized (round(x*1000), [[AnnOps.quantize]]);
 *  - a centroid is the exact component-wise Long SUM of its members
 *    (order-independent — no float accumulation, no mean division);
 *  - assignment is argmax of cosine against the sum vector:
 *    dot(x, s) / sqrt(s·s). Numerator and s·s are exact Longs below
 *    2^53, so the double conversion is exact and the divide/sqrt are
 *    correctly rounded — bit-identical in Spark and the DuckDB oracle.
 *    (Cosine is scale-invariant, so scoring against the sum IS scoring
 *    against the mean — the division by the member count cancels.)
 *  - ties take the smallest centroid id; a centroid that loses all
 *    members disappears (standard Lloyd degeneracy; K can shrink).
 *
 * Scale shape (the MLlib KMeans topology): per iteration ONE map-side
 * partially-aggregated groupBy — each task emits at most K×(dim+1)
 * longs, the shuffle is K rows regardless of input size — and a
 * K×dim driver collect, re-broadcast as literals in the next
 * assignment expression (codegen'd [[AnnOps.dot]] against a constant
 * array; no join, no per-row allocation). The input is scanned
 * `iters` times: callers clustering anything bigger than the page
 * cache should persist the projected (id, vec) upstream. Width bound
 * (r19 review correction — the old note claimed "safe past 2^40
 * members per cluster", which only covers the SUM components): the
 * binding constraint is the squared norm s·s of the sum vector, which
 * must fit int64 for the assignment's exact arithmetic — at |q| ≤
 * 2^11 and dim 64 that is ~2^17.5 members per cluster, and the norm
 * computation now checks it LOUDLY (BigInt + require) instead of
 * silently wrapping to a negative ss whose sqrt is NaN. Clusters
 * bigger than that need mean (not sum) centroids — the
 * [[AnnOps.pqTrain]] floorMeans shape — at the cost of a different
 * (still deterministic) assignment definition.
 */
object KMeans {

  /** Train `iters` Lloyd rounds from the rows matching `seedPred`
    * (their quantized vectors are the initial centroids, their ids the
    * cluster ids) and return the final assignment: (idCol, cluster).
    * `iters` counts assignments: iters=3 is assign/update, assign/
    * update, assign-and-emit.
    *
    * `localBelow = n` (opt-in) finishes SMALL inputs in the driver:
    * a single take(n+1) both guards the size and IS the data, so
    * iters × (assign + K-row agg + collect) collapse to one job plus
    * in-driver rounds over the same integer sums and exact-double
    * cosine — labels identical (pinned). The [[ConnectedComponents]]
    * `localBelow` endgame, applied to Lloyd's per-round job overhead;
    * production corpora keep 0 and never pay the probe. */
  def lloyd(emb: DataFrame, idCol: String, vecCol: String,
            seedPred: Column, iters: Int = 3,
            localBelow: Long = 0L): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    require(localBelow < Int.MaxValue, "localBelow must fit an Int take()")
    // the seed flag rides the projection so the small-input probe below
    // yields seeds AND members from ONE take() — no separate seed
    // collect job on the local path
    val e0 = emb.select(col(idCol).cast("long").as("__id"),
      AnnOps.quantize(col(vecCol)).as("__q"), seedPred.as("__seed"))
    val e = e0.select(col("__id"), col("__q"))

    if (localBelow > 0L) {
      val probe = e0.take(localBelow.toInt + 1)
      if (probe.length <= localBelow) {
        val (data, seeds) = probeData(probe)
        val cents = localLloyd(data, seeds, iters)
        val norms = checkedNorms(cents)
        import emb.sparkSession.implicits._
        return data
          .map(d => (d._1, assignLocalWithNorms(cents, norms, d._2))).toSeq
          .toDF(idCol, "cluster")
      }
    }

    var centroids: Seq[(Long, Array[Long])] =
      e0.where(col("__seed")).select(col("__id"), col("__q"))
        .collect()
        .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
        .sortBy(_._1).toSeq
    require(centroids.nonEmpty, "seedPred matched no rows")
    val dim = centroids.head._2.length
    for (_ <- 1 until iters) {
      val sums = (0 until dim).map(i =>
        sum(element_at(col("__q"), i + 1)).as(s"s$i"))
      centroids = e
        .withColumn("__c", assign(centroids))
        .groupBy(col("__c"))
        .agg(sums.head, sums.tail: _*)
        .collect()
        .map(r => (r.getLong(0),
          Array.tabulate(dim)(i => r.getLong(i + 1))))
        .sortBy(_._1).toSeq
    }
    e.select(col("__id").as(idCol), assign(centroids).as("cluster"))
  }

  /** Probe rows → (data, seeds): rows are (id, quantized vec, seed
    * flag). NULL seedPred (nullable column) must read as false,
    * matching the distributed path's where(col("__seed")) — getBoolean
    * on a null cell NPEs. */
  private[llm] def probeData(probe: Array[org.apache.spark.sql.Row])
      : (Array[(Long, Array[Long])], Seq[(Long, Array[Long])]) =
    (probe.map(r => (r.getLong(0), r.getSeq[Long](1).toArray)),
      probe.filter(r => !r.isNullAt(2) && r.getBoolean(2))
        .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
        .sortBy(_._1).toSeq)

  /** Driver-side Lloyd over a probed small input — the shared localBelow
    * endgame body: returns centroids after iters-1 updates. Labels from
    * [[assignLocalWithNorms]] against these centroids are pinned
    * identical to the distributed path's. */
  private def localLloyd(data: Array[(Long, Array[Long])],
                         seeds: Seq[(Long, Array[Long])],
                         iters: Int): Seq[(Long, Array[Long])] = {
    var centroids = seeds
    require(centroids.nonEmpty, "seedPred matched no rows")
    val dim = centroids.head._2.length
    for (_ <- 1 until iters) {
      val norms = checkedNorms(centroids)
      centroids = data
        .groupBy(d => assignLocalWithNorms(centroids, norms, d._2))
        .toSeq.sortBy(_._1)
        .map { case (cid, members) =>
          val s = new Array[Long](dim)
          members.foreach(m =>
            (0 until dim).foreach(i => s(i) += m._2(i)))
          (cid, s)
        }
    }
    centroids
  }

  /** Driver-side [[codebookWithCounts]] over already-probed data — the
    * endgame body shared with [[AnnOps.pqTrain]]'s one-probe path
    * (which slices each subspace's subvectors from ONE full-vector
    * probe): Lloyd rounds, then counts + exact integer sums per FINAL
    * cluster, sorted by cluster id. */
  private[llm] def localCodebookWithCounts(
      data: Array[(Long, Array[Long])], seeds: Seq[(Long, Array[Long])],
      iters: Int): Seq[(Long, Long, Seq[Long])] = {
    val cents = localLloyd(data, seeds, iters)
    val dim = cents.head._2.length
    val norms = checkedNorms(cents)
    data.groupBy(d => assignLocalWithNorms(cents, norms, d._2))
      .toSeq.sortBy(_._1)
      .map { case (cid, members) =>
        val s = new Array[Long](dim)
        members.foreach(m =>
          (0 until dim).foreach(i => s(i) += m._2(i)))
        (cid, members.length.toLong, s.toSeq)
      }
  }

  /** Squared norms of the sum vectors, overflow-CHECKED: a plain Long
    * sum of squares wraps silently once a centroid sum component passes
    * ~2^31.5 (possible well within the old doc's claimed member bound),
    * and a wrapped-negative ss makes sqrt NaN — every comparison false,
    * garbage assignments. BigInt + require turns that into a loud abort
    * with the offending cluster named (r19 review finding). Values in
    * the valid range are bit-identical to the old Long path. */
  private def checkedNorms(centroids: Seq[(Long, Array[Long])]): Array[Double] =
    centroids.map { case (cid, s) =>
      val ss = s.foldLeft(BigInt(0))((acc, v) => acc + BigInt(v) * v)
      require(ss.isValidLong,
        s"cluster $cid: centroid-sum squared norm $ss exceeds int64 — " +
          "cluster too large for exact sum-vector cosine; train with " +
          "mean centroids (pqTrain floorMeans) instead")
      math.sqrt(ss.toLong.toDouble)
    }.toArray

  /** Driver-side twin of [[assign]]: same exact-Long dot, same
    * correctly-rounded double divide/sqrt, same (score, -id) max.
    * Norms are precomputed once per centroid set ([[checkedNorms]]) —
    * never recompute them per row. */
  private def assignLocalWithNorms(centroids: Seq[(Long, Array[Long])],
                                   norms: Array[Double],
                                   q: Array[Long]): Long = {
    var bestScore = Double.NegativeInfinity
    var bestNid = Long.MinValue
    var c = 0
    centroids.foreach { case (cid, s) =>
      var dot = 0L; var i = 0
      while (i < s.length) { dot += q(i) * s(i); i += 1 }
      val score = dot.toDouble / norms(c)
      c += 1
      if (score > bestScore || (score == bestScore && -cid > bestNid)) {
        bestScore = score; bestNid = -cid
      }
    }
    -bestNid
  }

  /** Final centroids as a driver-side codebook (id, sum-vector) — the
    * shape [[AnnOps.ivfTopKWithCodebook]] takes. */
  def codebook(emb: DataFrame, idCol: String, vecCol: String,
               seedPred: Column, iters: Int = 3,
               localBelow: Long = 0L): Seq[(Long, Seq[Long])] =
    codebookWithCounts(emb, idCol, vecCol, seedPred, iters, localBelow)
      .map { case (id, _, s) => (id, s) }

  /** [[codebook]] plus member counts — (cluster id, count, sum-vector);
    * count enables exact integer MEAN centroids ([[AnnOps.pqTrain]]).
    * `localBelow` is [[lloyd]]'s small-input endgame, extended to the
    * codebook stats: the one take(n+1) probe yields seeds, members AND
    * final counts/sums in the driver — training collapses to ONE job
    * (the same labels/sums, pinned by the q80/q126 oracles which replay
    * the distributed rounds). */
  def codebookWithCounts(emb: DataFrame, idCol: String, vecCol: String,
                         seedPred: Column, iters: Int = 3,
                         localBelow: Long = 0L): Seq[(Long, Long, Seq[Long])] = {
    require(localBelow < Int.MaxValue, "localBelow must fit an Int take()")
    if (localBelow > 0L) {
      val probe = emb.select(col(idCol).cast("long").as("__id"),
          AnnOps.quantize(col(vecCol)).as("__q"), seedPred.as("__seed"))
        .take(localBelow.toInt + 1)
      if (probe.length <= localBelow) {
        val (data, seeds) = probeData(probe)
        return localCodebookWithCounts(data, seeds, iters)
      }
    }
    val assigned = lloyd(emb, idCol, vecCol, seedPred, iters)
    val e = emb.select(col(idCol).cast("long").as("__id"),
      AnnOps.quantize(col(vecCol)).as("__q"))
    val dim = e.select(size(col("__q"))).head().getInt(0)
    val sums = (0 until dim).map(i =>
      sum(element_at(col("__q"), i + 1)).as(s"s$i"))
    assigned.join(e, assigned(idCol) === e("__id"))
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("__n"), sums: _*)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        Array.tabulate(dim)(i => r.getLong(i + 2)).toSeq))
      .sortBy(_._1).toSeq
  }

  /** Argmax-cosine assignment against broadcast-literal centroids: one
    * struct per centroid (score, -id), array_max picks max score then
    * max(-id) = min id on ties. */
  private def assign(centroids: Seq[(Long, Array[Long])]): Column = {
    val norms = checkedNorms(centroids)
    val scored = centroids.zipWithIndex.map { case ((cid, s), c) =>
      struct(
        (AnnOps.dot(col("__q"), typedLit(s.toSeq)).cast("double") /
          lit(norms(c))).as("score"),
        lit(-cid).as("nid"))
    }
    (array_max(array(scored: _*)).getField("nid") * lit(-1L)).as("cluster")
  }
}
