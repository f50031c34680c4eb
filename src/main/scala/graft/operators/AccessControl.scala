package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Effective policy of a key: rules compile to ONE FLAT CaseWhen checked
    * longest-prefix-first — pure codegen'd predicate, so the probe side
    * NEVER shuffles and there is no per-row eval boundary. Flat, not
    * nested: a foldRight of when().otherwise() built one CaseWhen PER
    * RULE nested inside the last, and Catalyst's recursive tree
    * transforms stack-overflow at nesting depths in the low thousands;
    * chaining `.when` appends branches to a single node, which survives
    * far larger lists (codegen splits the generated method; past a few
    * thousand entries a broadcast prefix table + left_semi like
    * PrefixFilter.prefixJoin is still the better shape — the reference
    * pre-fetched its whole rule set driver-side too). */
  def policyCol(key: Column, rules: Seq[Rule]): Column = {
    val sorted = rules.sortBy(r => (-r.prefix.length, r.prefix))
    val chain = sorted match {
      case Seq() => lit("allow")
      case head +: tail =>
        tail.foldLeft(when(key.startsWith(head.prefix), lit(head.policy))) {
          (acc, r) => acc.when(key.startsWith(r.prefix), lit(r.policy))
        }.otherwise(lit("allow"))
    }
    // null keys fail CLOSED (startsWith(null) is null, which would fall
    // through every rule to "allow") — matches the scalar isAllowed
    when(key.isNull, lit("block")).otherwise(chain)
  }

  /** Keep rows whose effective policy allows capture. */
  def allowCaptures(df: DataFrame, rules: Seq[Rule],
                    keyCol: String = "urlkey"): DataFrame =
    df.where(!policyCol(col(keyCol), rules)
      .isin(BlockedPolicies.toSeq: _*))

  /** F6 — the scalar form: (urlkey) → allowed?, longest-prefix match over
    * a driver-supplied rule list (for UDF/streaming call sites). */
  def isAllowed(rules: Seq[Rule])(key: String): Boolean = {
    if (key == null) return false
    val best = rules.filter(r => key.startsWith(r.prefix))
      .sortBy(-_.prefix.length).headOption
    !best.exists(r => BlockedPolicies.contains(r.policy))
  }
}
