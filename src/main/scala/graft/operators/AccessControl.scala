package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Access-control capture filter (SURVEY §2 O7/F6;
 * /root/reference/src/main/java/org/archive/hadoop/pig/udf/AccessControlAllowCapture.java:15-67).
 * The reference pre-fetches policy rules from an external oracle service
 * and blocks rows whose policy is `block`/`block-message`; Spark-first the
 * rule set is a broadcast table of (SURT-prefix → policy) with
 * LONGEST-prefix match — the most specific rule wins, so a narrow `allow`
 * can carve an exception out of a broad `block`.
 */
object AccessControl {

  final case class Rule(prefix: String, policy: String)

  val BlockedPolicies: Set[String] = Set("block", "block-message")

  /** Keep rows whose effective policy allows capture. The rule table is
    * broadcast; the probe side joins on a startsWith predicate and never
    * shuffles (row identity for the per-row argmax is an internal id). */
  def allowCaptures(df: DataFrame, rules: Seq[Rule],
                    keyCol: String = "urlkey"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val r = rules.toDF("__prefix", "__policy")
    val withId = df.withColumn("__rid", monotonically_increasing_id())
    val matched = withId.join(broadcast(r),
      col(keyCol).startsWith(col("__prefix")), "left")
    val w = Window.partitionBy(col("__rid"))
      .orderBy(length(col("__prefix")).desc)
    matched.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .where(!coalesce(col("__policy"), lit("allow")).isin(
        BlockedPolicies.toSeq: _*))
      .select(df.columns.map(col).toIndexedSeq: _*)
  }

  /** F6 — the scalar form: (urlkey) → allowed?, longest-prefix match over
    * a driver-supplied rule list (for UDF/streaming call sites). */
  def isAllowed(rules: Seq[Rule])(key: String): Boolean = {
    if (key == null) return false
    val best = rules.filter(r => key.startsWith(r.prefix))
      .sortBy(-_.prefix.length).headOption
    !best.exists(r => BlockedPolicies.contains(r.policy))
  }
}
