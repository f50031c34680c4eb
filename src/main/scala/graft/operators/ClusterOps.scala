package graft.operators

import org.apache.spark.sql.SparkSession

/** Placeholder wired by GraftCli; implemented with the ZipNum source. */
object ClusterOps {
  def buildFromArgs(spark: SparkSession, args: Array[String]): Unit =
    throw new UnsupportedOperationException("cluster-build: implemented in task #3/#4")
  def mergeFromArgs(spark: SparkSession, args: Array[String]): Unit =
    throw new UnsupportedOperationException("cluster-merge: implemented in task #3/#4")
  def rangeFromArgs(spark: SparkSession, args: Array[String]): Unit =
    throw new UnsupportedOperationException("cluster-range: implemented in task #3/#4")
}
