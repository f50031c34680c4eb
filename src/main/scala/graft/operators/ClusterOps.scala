package graft.operators

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession

import graft.sources.zipnum.{ZipNumFormat, ZipNumIndex, ZipNumReader, ZipNumWriter}

/**
 * The three headline cluster pipelines (SURVEY §3.1–§3.3), Spark-first.
 *
 * build  — CDX lines → deterministic range shards → sorted ZipNum cluster
 *          (jobs/BuildCluster.java:71-204): one shuffle, on the boundary
 *          partitioner; sort + write happen inside the same stage.
 * merge  — N sorted clusters → 1 cluster, ZERO shuffle
 *          (jobs/MergeClusters.java:68-152 had a map-side merge; here each
 *          output partition block-prunes its key range from every input,
 *          heap-merges, and streams cleanup state over the sorted run).
 * range  — [start, end) dump, blocks pruned via ALL.summary, k-way merged
 *          driver-side like cdx/CDXClusterRangeDumper.java:39-74.
 */
object ClusterOps {

  /** Build a cluster from CDX text lines. `interior` boundaries (P1 split
    * file or sampled) fix the shard layout deterministically. */
  def build(spark: SparkSession, lines: RDD[String], outDir: String,
            interior: IndexedSeq[String],
            linesPerBlock: Int = ZipNumFormat.DefaultLinesPerBlock,
            surtOutput: Boolean = false,
            overwrite: Boolean = false): Unit = {
    val prepared: RDD[String] =
      if (surtOutput)
        // legacy CDX-9/10 → CDX-11 with fresh SURT keys (O1, CDXMapper)
        lines.flatMap(l =>
          graft.model.Cdx.convertLegacy(l).map(graft.model.Cdx.formatLine))
      else
        lines.filter(l => l.nonEmpty && !l.startsWith(" CDX "))
    implicit val keyOrder: Ordering[String] = graft.util.KeyOrder
    val sorted = prepared
      .map((_, null))
      .repartitionAndSortWithinPartitions(new BoundaryPartitioner(interior))
      .keys
    ZipNumWriter.writeRdd(spark, sorted, outDir, linesPerBlock,
      overwrite = overwrite)
  }

  /** Merge sorted clusters without any shuffle: align every input to shared
    * boundaries (block-pruned range reads), heap-merge aligned partitions,
    * optionally apply the global-CDX rules as streaming state over the
    * sorted run, write. */
  def merge(spark: SparkSession, inputs: Seq[String], outDir: String,
            nShards: Int,
            globalCdx: Boolean = false,
            dayLimit: Int = GlobalCdxCleanup.DefaultDayLimit,
            linesPerBlock: Int = ZipNumFormat.DefaultLinesPerBlock,
            boundaries: Option[IndexedSeq[String]] = None,
            overwrite: Boolean = false): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val given = boundaries.getOrElse(
      Boundaries.fromClusterSummaries(inputs, nShards, conf))
    // Under global-cdx the per-partition day counter is exact ONLY when
    // every partition starts at a urlkey start (fromClusterSummaries
    // guarantees it; see Boundaries.fromClusterSummaries doc). Externally
    // supplied boundaries (--splits, q113-style callers) may carry a
    // "urlkey ts" tail — truncate so a (urlkey, day) group never straddles.
    // Idempotent on already-bare boundaries; only applied when the day
    // counter is in play, so plain merges honor the given layout exactly.
    val interior =
      if (globalCdx)
        given.map(_.takeWhile(_ != ' ')).distinct.toIndexedSeq
      else given
    val aligned = inputs.map(d => ZipNumReader.rangesRdd(spark, d, interior))
    val merged = SortedMerge.merge(aligned)
    val cleaned =
      if (globalCdx)
        merged.mapPartitions(GlobalCdxCleanup.streamingLine(dayLimit),
          preservesPartitioning = true)
      else merged
    ZipNumWriter.writeRdd(spark, cleaned, outDir, linesPerBlock,
      overwrite = overwrite)
  }

  /** Stream [start, end) of one or more clusters, globally sorted: each
    * cluster's partition-ordered pruned scan is k-way merged driver-side —
    * only the requested range ever leaves the executors. */
  def range(spark: SparkSession, start: Option[String], end: Option[String],
            dirs: Seq[String]): Iterator[String] = {
    val streams = dirs.map(d =>
      ZipNumReader.lines(spark, d, start, end).toLocalIterator)
    SortedMerge.mergeIterators(streams)
  }

  // ------------------------------------------------------------------ CLI

  /** cluster-build <splits|-> <input-text> <out> [--shards N]
    *   [--zipnum-lines N] [--surt-output] [--overwrite]
    * `splits` dispatches on suffix like the reference
    * (ZipNumPartitioner.java:164-168): `.json` → JSON splits (P2(c)),
    * else alpha/NAME-START-END text. */
  def buildFromArgs(spark: SparkSession, args: Array[String]): Unit = {
    val (flags, pos) = splitArgs(args, Set("--shards", "--zipnum-lines"))
    require(pos.length == 3,
      "usage: cluster-build <splits|-> <input> <out> [--shards N] " +
        "[--zipnum-lines N] [--surt-output] [--overwrite]")
    val Array(splits, input, out) = pos
    val lines = spark.read.option("lineSep", "\n").textFile(input).rdd
    val nShards = flagValue(flags, "--shards")
      .map(_.toInt).getOrElse(spark.sparkContext.defaultParallelism)
    val interior =
      if (splits == "-") Boundaries.sample(lines, nShards)
      else Boundaries.fromAnySplitFile(splits,
        spark.sparkContext.hadoopConfiguration)
    build(spark, lines, out, interior,
      linesPerBlock = flagValue(flags, "--zipnum-lines").map(_.toInt)
        .getOrElse(ZipNumFormat.DefaultLinesPerBlock),
      surtOutput = flags.contains("--surt-output"),
      overwrite = flags.contains("--overwrite"))
    println(s"built $out")
  }

  /** cluster-merge <out> <in1> <in2...> [--shards N] [--global-cdx]
    *   [--day-limit N] [--zipnum-lines N] [--splits FILE] [--overwrite]
    * `--splits` takes boundaries from a file instead of the inputs' own
    * summary quantiles — `.json` → JSON splits (P2(c),
    * ZipNumPartitioner.java:204-233), else alpha text. */
  def mergeFromArgs(spark: SparkSession, args: Array[String]): Unit = {
    val (flags, pos) = splitArgs(args,
      Set("--shards", "--day-limit", "--zipnum-lines", "--splits"))
    require(pos.length >= 2,
      "usage: cluster-merge <out> <in...> [--shards N] [--global-cdx] " +
        "[--day-limit N] [--zipnum-lines N] [--splits FILE] [--overwrite]")
    merge(spark, pos.tail.toSeq, pos.head,
      nShards = flagValue(flags, "--shards").map(_.toInt)
        .getOrElse(spark.sparkContext.defaultParallelism),
      boundaries = flagValue(flags, "--splits").map(
        Boundaries.fromAnySplitFile(_, spark.sparkContext.hadoopConfiguration)),
      globalCdx = flags.contains("--global-cdx"),
      dayLimit = flagValue(flags, "--day-limit").map(_.toInt)
        .getOrElse(GlobalCdxCleanup.DefaultDayLimit),
      linesPerBlock = flagValue(flags, "--zipnum-lines").map(_.toInt)
        .getOrElse(ZipNumFormat.DefaultLinesPerBlock),
      overwrite = flags.contains("--overwrite"))
    println(s"merged ${pos.tail.mkString(",")} -> ${pos.head}")
  }

  /** cluster-range <start|-> <end|-> <in...> — dump to stdout; block-prune
    * stats to stderr. */
  def rangeFromArgs(spark: SparkSession, args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: cluster-range <start|-> <end|-> <in...>")
    val start = Option(args(0)).filter(_ != "-")
    val end = Option(args(1)).filter(_ != "-")
    val dirs = args.drop(2).toSeq
    val conf = spark.sparkContext.hadoopConfiguration
    dirs.foreach { d =>
      val idx = ZipNumIndex.load(d, conf)
      System.err.println(
        s"$d: ${idx.prune(start, end).size}/${idx.blocks.size} blocks in range")
    }
    val out = new java.io.BufferedWriter(
      new java.io.OutputStreamWriter(System.out, "UTF-8"), 1 << 16)
    range(spark, start, end, dirs).foreach { l => out.write(l); out.write('\n') }
    out.flush()
  }

  private def flagValue(flags: Array[String], name: String): Option[String] =
    flags.collectFirst {
      case f if f.startsWith(name + "=") => f.substring(name.length + 1)
    }

  /** Flags taking a value: accepts both `--flag=v` and `--flag v` (the
    * usage strings advertise the space form). Returns (flags normalized
    * to `--flag=v`, positionals). */
  private[operators] def splitArgs(args: Array[String],
                                   valueFlags: Set[String]): (Array[String], Array[String]) = {
    val flags = Array.newBuilder[String]
    val pos = Array.newBuilder[String]
    var i = 0
    while (i < args.length) {
      val a = args(i)
      if (a.startsWith("--")) {
        val name = a.takeWhile(_ != '=')
        if (a.contains('=') || !valueFlags.contains(name)) flags += a
        else {
          require(i + 1 < args.length, s"$name needs a value")
          flags += s"$name=${args(i + 1)}"
          i += 1
        }
      } else pos += a
      i += 1
    }
    (flags.result(), pos.result())
  }
}
