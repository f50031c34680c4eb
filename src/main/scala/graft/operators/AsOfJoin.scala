package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Generalized as-of join (beyond-reference surface; the specialized form
 * is [[RevisitResolve]]): for each left row, attach the payload of the
 * LATEST right row of the same key whose timestamp is <= the left row's —
 * prices at trade time, config at event time, signup at purchase time.
 *
 * Spark-first shape: no range join, no per-row subquery. Both sides are
 * tagged and unioned; ONE window over the key ordered by
 * (ts, side, right tie-breakers) computes `last(payload_struct,
 * ignoreNulls)` up to the current row — right rows sort BEFORE left rows
 * at equal timestamps (inclusive as-of), and the right-side tie columns
 * make the winning payload deterministic when several right rows share a
 * timestamp. The payloads ride ONE struct column (null only on left
 * rows), so the latest right ROW wins even when some of its payload
 * fields are genuinely NULL — those NULLs are carried through, never
 * silently replaced by an older row's values. One shuffle on the key at
 * any scale; the union means the right side is scanned once, never
 * joined per-left-row.
 */
object AsOfJoin {

  /** Left rows + `prefix`-named columns for each of `payloadCols` (from
    * `right`), resolved as-of `left.leftTs` >= `right.rightTs`. Left rows
    * with no prior right row get NULL payloads. `rightTieCols` order
    * same-timestamp right rows (last one wins); pass enough columns to
    * make that total. */
  def latestPrior(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                  leftTs: String, rightTs: String, payloadCols: Seq[String],
                  rightTieCols: Seq[String] = Nil,
                  prefix: String = "asof_"): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column is required")
    require(payloadCols.nonEmpty, "at least one payload column is required")
    // a right row with a NULL timestamp satisfies no `<=` bound, but in
    // the union-window formulation it would sort FIRST (nulls-first
    // ascending) and become the "earliest prior" payload for every left
    // row of its key — drop it up front (r19 review finding; result-
    // identical for well-formed data)
    val rightValid = right.where(col(rightTs).isNotNull)
    val lCols = left.columns.toSeq
    def nullAs(df: DataFrame, c: String, as: String): Column =
      lit(null).cast(df.schema(c).dataType).as(as)
    // all payloads ride one struct, null only on left rows: ignoreNulls
    // skips left rows but always lands on the latest right ROW, even
    // when an individual payload field inside it is NULL
    val pType = org.apache.spark.sql.types.StructType(
      payloadCols.map(c => right.schema(c).copy(name = c, nullable = true)))
    // left rows carry their own columns; right rows carry only the keys,
    // the ordering columns, and the payload — everything else is NULL
    val l = left.select(
      (lCols.map(col) :+ col(leftTs).as("__ts") :+ lit(1).as("__side")) ++
        rightTieCols.map(c => nullAs(right, c, s"__t_$c")) :+
        lit(null).cast(pType).as("__p"): _*)
    val r = rightValid.select(
      (lCols.map(c => if (keyCols.contains(c)) col(c) else nullAs(left, c, c)) :+
        col(rightTs).as("__ts") :+ lit(0).as("__side")) ++
        rightTieCols.map(c => col(c).as(s"__t_$c")) :+
        struct(payloadCols.map(c => col(c).as(c)): _*).as("__p"): _*)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__ts") +: col("__side") +:
        rightTieCols.map(c => col(s"__t_$c")): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__asof", last(col("__p"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(lCols.map(col) ++ payloadCols.map(c =>
        col("__asof")(c).as(s"$prefix$c")): _*)
  }
}
