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

  test("cleanup keeps a NULL-status warc/ revisit on a live-* file (batch == streaming)") {
    // statuscode NULL is NOT 502/504: bare three-valued isin would
    // NULL-drop the row in the batch form while the streaming form keeps
    // it — both surfaces must agree (and match the reference's parse-then-
    // compare, where a non-numeric status simply fails the comparison)
    val line = "org,x)/p 20120101000000 http://x.org/p warc/revisit xx " +
      "DIGEST - - 10 100 live-20120101-c/live.arc.gz"
    val batch = graft.operators.GlobalCdxCleanup.filters(
      Seq(line).toDF("line")
        .select(expr("split(line, ' ')").as("f"))
        .select(col("f")(0).as("urlkey"), col("f")(1).as("timestamp"),
          col("f")(2).as("original_url"), col("f")(3).as("mimetype"),
          expr("try_cast(f[4] AS INT)").as("statuscode"),
          col("f")(5).as("digest"), lit(null: String).as("redirect_url"),
          lit(null: String).as("meta_flags"), lit(10L).as("compressed_size"),
          lit(100L).as("offset"), col("f")(10).as("filename")))
    assert(batch.count() == 1)
    val streamed = graft.operators.GlobalCdxCleanup
      .streamingLine(dayLimit = 0)(Iterator(line)).toSeq
    assert(streamed.size == 1)
  }
}
