package graft.operators.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deterministic, engine-portable sampling/split assignment for corpus
 * curation (beyond-reference surface): every row's fate is a pure
 * function of (salt, id), so the split is reproducible run-over-run,
 * engine-over-engine (no `rand()`, no seed plumbing), stable under
 * repartitioning, and documents keep their assignment when the corpus
 * grows — the properties a train/val/test split must have at 100 TB,
 * where "re-roll the RNG" means re-shuffling the entire training set.
 *
 * Mechanism: the first two hex chars of md5(salt + "|" + id) give 256
 * uniform buckets; labels are assigned by hex-string range so ANY engine
 * with md5 reproduces the assignment with string comparison alone (no
 * hex→int parsing, which SQL dialects disagree on). Pure map-side
 * projection — no shuffle at any scale.
 */
object Sampling {

  /** Assign a split label per row: `bounds` are (label, exclusive upper
    * 2-hex-char prefix) in ascending order — e.g.
    * `Seq("train" -> "cc", "val" -> "e6")` with default "test" is
    * ~79.7% / ~10.2% / ~10.1%. */
  def hashSplit(df: DataFrame, idCol: String, salt: String,
                bounds: Seq[(String, String)],
                defaultLabel: String): DataFrame = {
    require(bounds.nonEmpty, "at least one (label, bound) is required")
    bounds.foreach { case (lbl, hi) => requireHexBound(hi, lbl) }
    require(bounds.map(_._2) == bounds.map(_._2).sorted,
      "bounds must be ascending — a later smaller bound is unreachable")
    val prefix = substring(
      md5(concat(lit(salt + "|"), col(idCol).cast("string"))), 1, 2)
    val label = bounds.foldRight(lit(defaultLabel): Column) {
      case ((lbl, hi), acc) => when(prefix < lit(hi), lit(lbl)).otherwise(acc)
    }
    df.withColumn("split", label)
  }

  /** Deterministic subsample: keep rows whose 2-hex-char prefix falls
    * below `bound` (e.g. "1a" keeps ~26/256 ≈ 10.2%). Same hash family
    * as [[hashSplit]] with a DIFFERENT salt, or the subsample would be
    * nested inside the train split rather than independent of it. */
  def hashSample(df: DataFrame, idCol: String, salt: String,
                 bound: String): DataFrame = {
    requireHexBound(bound, "sample")
    df.where(substring(
      md5(concat(lit(salt + "|"), col(idCol).cast("string"))), 1, 2)
      < lit(bound))
  }

  /** Stratified deterministic subsample: each stratum keeps rows whose
    * hash prefix falls below ITS bound — per-language / per-source
    * rebalancing (downsample the dominant crawl, keep the rare language)
    * as a pure map-side filter with [[hashSample]]'s determinism. Strata
    * not listed in `rates` use `defaultBound` ("00" drops them). */
  def stratifiedHashSample(df: DataFrame, idCol: String, strataCol: String,
                           salt: String, rates: Seq[(String, String)],
                           defaultBound: String): DataFrame = {
    rates.foreach { case (stratum, b) => requireHexBound(b, stratum) }
    requireHexBound(defaultBound, "default")
    val bound = rates.foldRight(lit(defaultBound): Column) {
      case ((stratum, b), acc) =>
        when(col(strataCol) === stratum, lit(b)).otherwise(acc)
    }
    df.where(substring(
      md5(concat(lit(salt + "|"), col(idCol).cast("string"))), 1, 2) < bound)
  }

  /** Bounds compare lexicographically against LOWERCASE md5 hex — an
    * uppercase, non-hex, or wrong-length bound (e.g. "CC", "c") would
    * silently mis-assign every row instead of failing. */
  private def requireHexBound(bound: String, label: String): Unit =
    require(bound.length == 2 && bound.forall(c =>
      (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f')),
      s"bound for '$label' must be exactly 2 lowercase hex chars " +
        s"([0-9a-f]{2}), got '$bound' — anything else compares " +
        "lexicographically against lowercase md5 hex and silently " +
        "mis-assigns rows")
}
