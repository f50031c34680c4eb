package graft.operators

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.Partitioner
import org.apache.spark.rdd.RDD

/**
 * Fixed-boundary total-order range partitioner (SURVEY §2 P1/P2) —
 * deterministic sharding from explicit boundaries, unlike Spark's sampled
 * `repartitionByRange`: same input + same boundaries ⇒ byte-identical
 * shards, run after run, which is what lets a new build match an existing
 * cluster's layout.
 *
 * Semantics match AlphaPartitioner.getPartition
 * (/root/reference/src/main/java/org/archive/hadoop/mapreduce/AlphaPartitioner.java:31-41):
 * binary search of the key against sorted boundaries; partition i holds keys
 * in [boundaries(i-1), boundaries(i)), partition 0 everything below
 * boundaries(0), the last partition everything at/above the last boundary.
 * Keys are whole CDX lines — comparing "urlkey ts rest" against a bare
 * "urlkey" boundary is the reference's raw-string compare.
 */
final class BoundaryPartitioner(interior: IndexedSeq[String]) extends Partitioner {
  require(interior == interior.sorted(graft.util.KeyOrder),
    "boundaries must be sorted (byte-wise)")
  override val numPartitions: Int = interior.length + 1

  override def getPartition(key: Any): Int = {
    val k = key.asInstanceOf[String]
    // number of boundaries <= k
    var lo = 0; var hi = interior.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (graft.util.KeyOrder.lteq(interior(mid), k)) lo = mid + 1 else hi = mid
    }
    lo
  }

  override def equals(other: Any): Boolean = other match {
    case b: BoundaryPartitioner => b.interiorBoundaries == interior
    case _ => false
  }
  override def hashCode(): Int = interior.hashCode()
  def interiorBoundaries: IndexedSeq[String] = interior
}

/** Boundary sources, in the reference's preference order: explicit split
  * file (P1), an existing cluster's summary quantiles (P2:
  * ZipNumPartitioner.java:92-135 — "partition new data like the existing
  * cluster"), or a seeded sample of the data (deterministic for a given
  * input, unlike repartitionByRange's per-run sampling). */
object Boundaries {

  /** Split-file loader. Two accepted formats:
    *  - AlphaPartitioner: one boundary string per line, sorted (a leading
    *    empty line — the conventional first-shard boundary — is dropped);
    *  - SplitFile (Q6): `NAME START END` per line → boundaries are the
    *    non-minimal STARTs. */
  def fromSplitFile(path: String, conf: Configuration): IndexedSeq[String] = {
    val p = new Path(path)
    val in = p.getFileSystem(conf).open(p)
    val text = try new String(in.readAllBytes(), "UTF-8") finally in.close()
    val lines = text.split("\n").toIndexedSeq.filter(_.nonEmpty)
    val threeField = lines.headOption.exists(_.split("\t| ", -1).length == 3)
    if (threeField)
      graft.sources.SplitFile.interiorBoundaries(
        graft.sources.SplitFile.parse(lines))
    else {
      require(lines == lines.sorted(graft.util.KeyOrder),
        s"split file $path must be sorted (byte-wise)")
      lines
    }
  }

  /** Interior boundaries as every (total/n)-th key of the concatenated
    * summaries of existing clusters — n output partitions shaped like the
    * clusters' own key distribution. */
  def fromClusterSummaries(dirs: Seq[String], n: Int,
                           conf: Configuration): IndexedSeq[String] = {
    require(n >= 1, "need at least one partition")
    val keys = dirs.flatMap(d =>
      graft.sources.zipnum.ZipNumIndex.load(d, conf).blocks.map(_.firstKey))
      .sorted(graft.util.KeyOrder).toIndexedSeq
    quantiles(keys, n)
  }

  /** Seeded reservoir sample → quantile boundaries; same input ⇒ same
    * boundaries (seed fixed), unlike Spark's RangePartitioner. */
  def sample(lines: RDD[String], n: Int, sampleSize: Int = 20000,
             seed: Long = 42L): IndexedSeq[String] = {
    require(n >= 1, "need at least one partition")
    if (n == 1) return IndexedSeq.empty
    val keys = lines.takeSample(withReplacement = false, sampleSize, seed)
      .sorted(graft.util.KeyOrder).toIndexedSeq
    quantiles(keys, n)
  }

  /** n-1 interior quantile keys out of a sorted key list. */
  def quantiles(sortedKeys: IndexedSeq[String], n: Int): IndexedSeq[String] = {
    if (sortedKeys.isEmpty || n <= 1) return IndexedSeq.empty
    (1 until n).map(i => sortedKeys((i.toLong * sortedKeys.length / n).toInt))
      .distinct
  }
}
