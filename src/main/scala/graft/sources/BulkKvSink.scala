package graft.sources

import org.apache.hadoop.io.Text
import org.apache.hadoop.mapreduce.lib.output.SequenceFileOutputFormat
import org.apache.spark.sql.Dataset

import graft.operators.BoundaryPartitioner

/**
 * Total-order bulk KV sink — the CONCEPT behind HFileStorage (SURVEY §2
 * K7: feed region start keys to a TotalOrderPartitioner so output shards
 * align with the target store's partitions;
 * /root/reference/src/main/java/org/archive/hadoop/pig/HFileStorage.java:175-262).
 * Store-agnostic here: rows are range-partitioned by EXPLICIT boundaries
 * (e.g. the target system's shard start keys), sorted within shards, and
 * written one SequenceFile per shard plus a `_boundaries` manifest for
 * the downstream bulk-load step.
 */
object BulkKvSink {

  def write(kv: Dataset[(String, String)], outDir: String,
            interior: IndexedSeq[String]): Unit = {
    val spark = kv.sparkSession
    kv.rdd
      .map { case (k, v) => (if (k == null) "" else k, if (v == null) "" else v) }
      .repartitionAndSortWithinPartitions(new BoundaryPartitioner(interior))
      .map { case (k, v) => (new Text(k), new Text(v)) }
      .saveAsNewAPIHadoopFile(outDir, classOf[Text], classOf[Text],
        classOf[SequenceFileOutputFormat[Text, Text]])
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(outDir, "_boundaries")
    val out = p.getFileSystem(conf).create(p, true)
    out.write(interior.mkString("", "\n", "\n").getBytes("UTF-8"))
    out.close()
  }
}
