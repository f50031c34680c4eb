package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{AccessControl, PrefixFilter}

/** Edge behaviors of the row-filter operators that the oracle queries
  * (q09/q35) can't exercise: null keys and degenerate prefix lists. */
class FilterEdgeSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  test("access control fails CLOSED on null keys, on both surfaces") {
    val rules = Seq(AccessControl.Rule("org,bad", "block"))
    val df = Seq(Some("org,good)/x"), Some("org,bad)/y"), None)
      .toDF("urlkey")
    val kept = AccessControl.allowCaptures(df, rules)
      .select("urlkey").as[String].collect().toSeq
    assert(kept == Seq("org,good)/x")) // null row blocked, not fail-open
    assert(!AccessControl.isAllowed(rules)(null))
  }

  test("prefixJoin with an empty prefix keeps everything (predicate parity)") {
    val df = Seq("alpha", "beta", "").toDF("k")
    val viaPredicate = PrefixFilter(df, "k", Seq("", "al")).count()
    val viaJoin = PrefixFilter.prefixJoin(df, "k", Seq("", "al")).count()
    assert(viaPredicate == 3 && viaJoin == 3)
    // and without the empty prefix the two paths still agree
    assert(PrefixFilter(df, "k", Seq("al")).count() ==
      PrefixFilter.prefixJoin(df, "k", Seq("al")).count())
  }
}
