package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * URL-prefix list filter (SURVEY §2 O5) — the reference filters a merged CDX
 * stream by a prefix list loaded from a file, with optional SURT transform
 * of the list (/root/reference/src/main/java/org/archive/hadoop/mapreduce/
 * SortMergeInputFormat.java:278-311, TransformingPrefixStringFilter).
 *
 * Spark-first: small lists compile to an OR-chain of `startsWith` columns —
 * codegen'd, no UDF, no broadcast needed because the predicate itself ships
 * in the plan. Large lists (beyond ~100 prefixes) should pre-sort the list
 * and use a range/broadcast join instead: see [[prefixJoin]].
 */
object PrefixFilter {

  /** Predicate: `c` starts with any of `prefixes` (after optional SURT
    * transform of the list entries, mirroring TransformingPrefixStringFilter). */
  def predicate(c: Column, prefixes: Seq[String], surtList: Boolean = false): Column = {
    val ps = if (surtList) prefixes.map(graft.functions.Surt.surtLenient) else prefixes
    ps.map(p => c.startsWith(p)).reduceOption(_ || _).getOrElse(lit(false))
  }

  def apply(df: DataFrame, column: String, prefixes: Seq[String],
            surtList: Boolean = false): DataFrame =
    df.where(predicate(col(column), prefixes, surtList))

  /**
   * Scale path for big prefix lists: LEFT SEMI broadcast-join with the
   * startsWith predicate in the join condition — a row matching several
   * prefixes still emits exactly once, and pre-existing duplicate rows in
   * the input (legitimate in CDX streams) are preserved. The first-char
   * equi-key keeps it a BroadcastHashJoin (hash probe + residual predicate)
   * instead of a nested-loop scan of the whole list per row. One broadcast,
   * no shuffle of the big side.
   */
  def prefixJoin(df: DataFrame, column: String, prefixes: Seq[String],
                 surtList: Boolean = false): DataFrame = {
    // same surtList transform as predicate(): the class doc sends LARGE
    // lists here, and a big URL prefix list is exactly the case that
    // needs the SURT canonicalization most — without parity a caller
    // following the guidance silently matched zero rows
    val ps = if (surtList) prefixes.map(graft.functions.Surt.surtLenient)
             else prefixes
    // "" matches every row (predicate semantics); the first-char equi-key
    // below would instead match nothing for it — short-circuit
    if (ps.exists(_.isEmpty)) return df
    val spark = df.sparkSession
    import spark.implicits._
    val p = ps.toDF("__prefix").withColumn("__b", substring(col("__prefix"), 1, 1))
    df.join(broadcast(p),
      substring(col(column), 1, 1) === col("__b") &&
        col(column).startsWith(col("__prefix")),
      "left_semi")
  }
}
