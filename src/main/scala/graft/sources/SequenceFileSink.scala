package graft.sources

import org.apache.hadoop.io.Text
import org.apache.hadoop.mapreduce.lib.output.SequenceFileOutputFormat
import org.apache.spark.sql.{Dataset, SparkSession}

/**
 * Hadoop SequenceFile sink/source for keyed text records (SURVEY §2 K6;
 * /root/reference/src/main/java/org/archive/hadoop/pig/SequenceFileStorage.java:73-272).
 * Spark-first: a thin wire over saveAsNewAPIHadoopFile — the reference's
 * null-safe Writable plumbing collapses to the Text conversions here
 * (null → empty, matching its nullKey/nullValue defaults).
 */
object SequenceFileSink {

  def write(ds: Dataset[(String, String)], path: String): Unit =
    ds.rdd
      .map { case (k, v) => (new Text(if (k == null) "" else k),
        new Text(if (v == null) "" else v)) }
      .saveAsNewAPIHadoopFile(path, classOf[Text], classOf[Text],
        classOf[SequenceFileOutputFormat[Text, Text]])

  def read(spark: SparkSession, path: String): Dataset[(String, String)] = {
    import spark.implicits._
    spark.sparkContext
      .sequenceFile(path, classOf[Text], classOf[Text])
      .map { case (k, v) => (k.toString, v.toString) }
      .toDS()
  }
}
