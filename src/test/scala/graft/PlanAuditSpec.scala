package graft

import org.scalatest.funsuite.AnyFunSuite

/** Automated plan audit over EVERY SparkEntry query: the universal
  * red flags that silently destroy scale — a non-broadcast cartesian
  * product (all-pairs shuffle) or a Python eval boundary (breaks
  * whole-stage codegen) — must never appear in any physical plan.
  * (BroadcastNestedLoopJoin is fine: the intended broadcast-side
  * cross-scoring in the ANN baselines.) Also pins the driver contract:
  * queries and oracleSql must cover exactly the same names. */
class PlanAuditSpec extends AnyFunSuite with SparkTestSession {

  private val sfDir = "/root/testdata/sf0.001"

  test("queries and oracleSql cover exactly the same names") {
    assert(SparkEntry.queries.keySet == SparkEntry.oracleSql.keySet)
  }

  test("no query plans a CartesianProduct or a Python eval boundary") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, q) =>
        val plan = q(spark, sfDir).queryExecution.executedPlan.toString
        val bad = Seq("CartesianProduct", "BatchEvalPython")
          .filter(plan.contains)
        if (bad.isEmpty) None else Some(s"$name: ${bad.mkString(",")}")
    }
    assert(offenders.isEmpty, offenders.mkString("; "))
  }
}
