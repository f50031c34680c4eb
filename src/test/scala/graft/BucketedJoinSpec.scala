package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/**
 * Pins the co-located join story (SCALE.md "cross-cutting"): two tables
 * bucketed on the join key with the same bucket count sort-merge join
 * WITHOUT a shuffle — the layout a production deployment uses for
 * repeated fact-to-fact joins (e.g. cdx-to-crawl-log reconciliation)
 * where neither side broadcasts and re-shuffling 100 TB per join is the
 * dominant avoidable cost. The same join over plain parquet must show
 * the Exchange this layout removes.
 */
class BucketedJoinSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  private def withConf[A](kvs: (String, String)*)(f: => A): A = {
    val prev = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("same-bucketing sort-merge join plans with zero Exchange") {
    val left = (0L until 500L).map(i => (i, s"l-$i")).toDF("k", "lv")
    val right = (0L until 500L).map(i => (i, i * 3)).toDF("k", "rv")
    spark.sql("DROP TABLE IF EXISTS bj_left")
    spark.sql("DROP TABLE IF EXISTS bj_right")
    left.write.bucketBy(4, "k").sortBy("k").saveAsTable("bj_left")
    right.write.bucketBy(4, "k").sortBy("k").saveAsTable("bj_right")
    try {
      // disable broadcast so the plan must be a sort-merge join — the
      // shape under test (bucketing exists for when nothing broadcasts)
      withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
        val joined = spark.table("bj_left")
          .join(spark.table("bj_right"), "k")
        assert(joined.count() == 500)
        val plan = joined.queryExecution.executedPlan.toString
        assert(plan.contains("SortMergeJoin"), plan.take(500))
        assert(!plan.contains("Exchange"), // bucket layout IS the shuffle
          "bucketed join must not re-shuffle:\n" + plan.take(800))

        // contrast: the identical join over non-bucketed data shuffles
        val plain = left.join(right, "k")
        plain.count()
        assert(plain.queryExecution.executedPlan.toString
          .contains("Exchange"))
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS bj_left")
      spark.sql("DROP TABLE IF EXISTS bj_right")
    }
  }
}
