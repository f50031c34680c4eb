package graft

import org.apache.spark.sql.SparkSession

/**
 * Benchmark main — one JSON line with per-query wall times.
 *
 * Measurement discipline (round-2 fixes):
 *  - every query is materialized through the `noop` sink, so ALL columns are
 *    computed — a bare `.count()` would let Catalyst prune the very columns
 *    whose computation is being measured;
 *  - one untimed warmup query absorbs JVM/session/codegen startup, so the
 *    first timed query isn't charged for it;
 *  - each query runs GRAFT_BENCH_REPS times (default 5) and the MIN is
 *    reported: single-shot timings at small SF are dominated by GC/JIT
 *    noise (observed: the same query 5.8s in one run, 0.95s steady-state),
 *    and min-of-reps measures the steady-state plan cost — the quantity
 *    that actually extrapolates to a long-running cluster job; a query
 *    must succeed on EVERY rep to bench at all (any failed rep → -1);
 *  - failures are NOT swallowed: a failed query records `-1` AND the error
 *    is reported in an `errors` map (a broken query must never bench green);
 *  - AQE + UTC session config matches GraftCli.session.
 */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // GRAFT_BENCH_AQE=false is a diagnostic toggle only. Measured
      // (round 9, 10-query subset, min-of-5): AQE OFF is 33% SLOWER
      // (5.24 → 6.96 s; q60 0.60 → 1.61, q21 0.86 → 1.47) — runtime
      // partition coalescing pays for its re-planning jobs even at
      // sf0.1, so the production setting is also the fast local one.
      // only the exact strings "false"/"0" disable; any other value
      // (incl. malformed) keeps the default — the session must never
      // die on a bad env var ("a bench must always emit its report")
      .config("spark.sql.adaptive.enabled",
        (!sys.env.get("GRAFT_BENCH_AQE").map(_.trim.toLowerCase)
          .exists(v => v == "false" || v == "0")).toString)
      // 72 queries × many stages ≫ the default 100-entry generated-class
      // cache; at 100 every cross-query pass recompiles nearly every stage
      // (the round-8 interleave experiment measured +35% total from exactly
      // this). With all passes' classes resident, rep order stops mattering.
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      // Local-mode shuffle blocks are KB-to-low-MB and never cross a
      // network, so lz4 costs more CPU than the page-cache I/O it saves:
      // measured on the then-current full suite (94 queries,
      // pre-q95-q97), OFF 27.7/27.3 s vs ON 28.4/30.8 s (two runs
      // each, interleaved). A multi-host cluster
      // shipping shuffle over the wire keeps the Spark default (ON) —
      // this is a single-host sizing knob, same class as
      // shuffle.partitions=32. GRAFT_BENCH_SHUFFLE_COMPRESS=true
      // restores the default for A/B.
      .config("spark.shuffle.compress",
        sys.env.get("GRAFT_BENCH_SHUFFLE_COMPRESS").map(_.trim.toLowerCase)
          .exists(v => v == "true" || v == "1").toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def materialize(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()

    // Warmup: a cheap scan+agg, untimed. A warmup failure must not kill
    // the report — the timed loop will surface the same error in-band.
    try materialize("q01_agg") catch { case _: Throwable => () }

    // tolerate a malformed env value: a bench must always emit its report.
    // 5 reps: 3 was not enough — the round-7 report showed q21 at 3.17s
    // (4x steady state) surviving min-of-3, and a 3-run diagnosis at 5
    // reps reproduced 0.77-0.79s every time with per-query deltas under
    // ~10% on all non-trivial queries; two extra reps (~50s) buy a report
    // whose per-query numbers are comparable across rounds
    val reps = sys.env.get("GRAFT_BENCH_REPS")
      .flatMap(_.toIntOption).getOrElse(5).max(1)
    // Reps are INTERLEAVED across full passes (all queries once, repeat ×5):
    // the round-8 official run showed 2.6-5.5× spikes on untouched queries in
    // CONTIGUOUS run-order blocks (q45/q46/q47 inflated while their q44/q48
    // neighbors stayed normal; q69/q70 likewise) — a minutes-long host
    // contention burst hits a contiguous wall-clock window, and consecutive
    // reps put all 5 of a query's samples inside it. Spreading each query's
    // samples across the whole run lets min-of-reps reject any burst shorter
    // than the run. Round 8 tried this and measured +35% total — that cost
    // was the 100-entry whole-stage-codegen class cache recompiling every
    // stage each pass, eliminated by raising
    // spark.sql.codegen.cache.maxEntries above (re-measured: interleaved ≈
    // consecutive with the larger cache).
    // first error per query only (duplicate JSON keys would be collapsed
    // arbitrarily by parsers)
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    // GRAFT_BENCH_ONLY=q30_multimodal,q47_pii_scrub — diagnostic isolation
    // runs (suite-order-effect experiments); unset = the official full set.
    val only = sys.env.get("GRAFT_BENCH_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    // same guard as Verify's GRAFT_VERIFY_ONLY: a set-but-empty or typo'd
    // filter must abort loudly, not bench zero queries and emit a clean
    // {"value":0.000,"n_queries":0} summary
    only.foreach { o =>
      require(o.nonEmpty,
        "GRAFT_BENCH_ONLY is set but names no queries — refusing a vacuous green bench")
      val unknown = o -- SparkEntry.queries.keySet
      require(unknown.isEmpty,
        s"GRAFT_BENCH_ONLY names unknown queries: ${unknown.mkString(", ")}")
    }
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
    val names = selected.map(_._1)
    val samples = scala.collection.mutable.LinkedHashMap[String, List[Double]](
      names.map(_ -> List.empty[Double]): _*)
    for (_ <- 1 to reps; name <- names) {
      val t0 = System.nanoTime()
      try {
        materialize(name)
        samples(name) ::= (System.nanoTime() - t0) / 1e9
      } catch { case e: Throwable =>
        errors.getOrElseUpdate(name,
          e.toString.takeWhile(_ != '\n').take(200))
      }
    }
    // EVERY rep must succeed — a query that crashed on any rep benches
    // -1, never green-by-luckiest-rep
    val results = names.map { name =>
      val times = samples(name)
      name -> (if (times.size == reps) times.min else -1.0)
    }

    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
    // Output contract (round-17 fix — all 16 prior committed BENCH artifacts
    // were parsed:null): the driver keeps only a ~2000-char TAIL of the run's
    // output, and a 129-query report line is ~2.9 KB, so its head was ALWAYS
    // cut no matter how clean the teardown. The line printed to stdout is
    // therefore a SHORT summary (<500 chars: total, streaming subtotal,
    // query/error counts, duck total, ratio, detail pointer); the FULL
    // per-query report goes only to the sidecar file, which tools/validate.sh
    // commits into the repo as BENCH_DETAIL.json at close.
    // Locale.ROOT: f"%.3f" localizes the decimal separator (a comma on
    // de/fr JVMs would corrupt the JSON this exists to keep parseable)
    def jnum(v: Double): String =
      if (v < 0) "-1"
      else String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qs = results.map { case (k, v) => s"${jstr(k)}:${jnum(v)}" }.mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }.mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    // Local comparison denominator: only the DuckDB TOTAL inline (the
    // per-query numbers live in DUCK_BENCH.json, committed in the repo).
    val duck = scala.util.Try(
      java.nio.file.Files.readString(java.nio.file.Paths.get(
        sys.env.getOrElse("GRAFT_DUCK_BENCH", "/root/repo/DUCK_BENCH.json"))).trim)
      .toOption.filter(_.nonEmpty)
    val duckTotal = duck.flatMap(d =>
      "\"total_sec\"\\s*:\\s*([0-9.]+)".r.findFirstMatchIn(d).map(_.group(1)))
    val duckField = duck.flatMap { d =>
      val eng = "\"engine\"\\s*:\\s*\"([^\"]+)\"".r.findFirstMatchIn(d).map(_.group(1))
      duckTotal.map(t => s""","duckdb_baseline":{"total_sec":$t${eng.map(e => s""","engine":${jstr(e)}""").getOrElse("")},"detail":"DUCK_BENCH.json"}""")
    }.getOrElse("")
    // Ratio policy, stated in-band: the streaming surfaces measure real
    // Structured Streaming micro-batch MACHINERY (trigger + state store
    // + checkpoint commit; q113 additionally a full index-maintenance
    // cycle) against batch SQL oracles that replay only the final
    // answer — structural floors, kept in the headline total with the
    // ex-streaming decomposition stated in-band rather than footnoted
    // out (STATUS.md §bench).
    val streamingQs = Set("q51_stream_daycap", "q92_stream_dedup",
      "q104_stream_windows", "q110_stream_sessions", "q113_stream_zipnum",
      "q134_stream_hll")
    val streamTotal = results
      .collect { case (n, v) if streamingQs(n) && v >= 0 => v }.sum
    val notes = s"the ${streamingQs.size} streaming surfaces " +
      s"(${streamingQs.toSeq.sorted.mkString(", ")}) total " +
      s"${jnum(streamTotal)}s of real micro-batch machinery vs batch " +
      s"oracle replays - a structural floor, not a plan gap; " +
      s"ex-streaming total ${jnum(total - streamTotal)}s"
    // errors are reported in-band (a failed query benches as -1 + an
    // errors entry) AND fail the process: a bench with any broken query
    // must never be recorded as a clean run (round-10 lesson — rc:0 with
    // AnalysisExceptions in the tail stamped a broken run as success).
    if (errors.nonEmpty)
      System.err.println(s"[bench] ${errors.size} queries failed: " +
        errors.keys.mkString(", "))
    // Teardown happens BEFORE the report line, and the report line is the
    // very last output of the process (round-15 lesson: BENCH_r15.json was
    // unparseable because the harness keeps only the output TAIL, and a
    // post-report StateStore-maintenance thread racing the RpcEnv shutdown
    // dumped a stack trace after the JSON line). Layers:
    //  1. the report is written to a sidecar FILE before teardown begins,
    //     so even a killed process leaves recoverable timings;
    //  2. stop any still-active streaming query (the streaming gates stop
    //     their own, this is belt-and-braces) and the StateStore
    //     maintenance pool — the thread whose logError raced the teardown;
    //  3. log level OFF so any residual teardown message is suppressed;
    //  4. print the JSON line AFTER spark.stop() and exit the (forked)
    //     JVM immediately so no lingering non-daemon thread can print;
    //  5. a daemon WATCHDOG: a wedged spark.stop() is a hang, not an
    //     exception — no catch fires. If teardown exceeds its budget the
    //     watchdog prints the report itself and halt()s, so a hang costs
    //     the dirty tail it used to cost, never the whole report.
    import scala.util.control.NonFatal
    // cpus in-band (r22): the driver benches at two core counts; the
    // report must say which one produced it (additive field).
    val cpusField = cpus.toIntOption.map(c => s""","cpus":$c""").getOrElse("")
    val report = s"""{"metric":"total","value":${jnum(total)},"unit":"sec"$cpusField,"queries":$qs,"errors":$errJson,"notes":${jstr(notes)},"sf":${jstr(sfDir)}$duckField}"""
    // Short stdout line: everything an auditor of the committed tail needs —
    // totals, counts, the duck denominator, the ratio, and where the full
    // per-query map lives. Must stay well under the driver's 2000-char tail.
    // ratio only on a COMPLETE matched pairing, on BOTH sides:
    //  - spark errors: failed queries are excluded from the spark total
    //    (-1) but still inside the duck denominator — the quotient would
    //    flatter a partial run;
    //  - duck errors: duck_bench.py likewise EXCLUDES failed oracles from
    //    its total_sec, so a partial duck denominator would silently skew
    //    the headline the other way (r18 advice);
    //  - query-set mismatch: a GRAFT_BENCH_ONLY subset, or a DUCK_BENCH
    //    .json generated before gates were added, pairs different query
    //    sets — numerator and denominator measure different work.
    // An unparseable duck report also suppresses (unknown provenance).
    // validate.sh regenerates the denominator on the final tree, so the
    // official pairing always carries the ratio.
    val duckJson = duck.flatMap(d => scala.util.Try(
      new com.fasterxml.jackson.databind.ObjectMapper().readTree(d)).toOption)
    val duckClean = duckJson.exists { j =>
      val names = Option(j.get("queries")).map { q =>
        val it = q.fieldNames(); val b = Set.newBuilder[String]
        while (it.hasNext) b += it.next()
        b.result()
      }
      !j.has("errors") && names.exists(_ == results.map(_._1).toSet)
    }
    if (duckTotal.isDefined && !duckClean)
      System.err.println("[bench] ratio suppressed: duck report has " +
        "errors, a different query set, or failed to parse")
    val ratioField = duckTotal.flatMap(_.toDoubleOption).filter(_ > 0)
      .filter(_ => errors.isEmpty && duckClean)
      .map(t => s""","duckdb_total_sec":$t,"ratio":${jnum(total / t)}""")
      .getOrElse("")
    val errNames = if (errors.isEmpty) ""
      else s""","error_names":${jstr(errors.keys.mkString(",").take(300))}"""
    // Compact per-query seconds IN the parseable summary line (r22,
    // PERF-contract fix — the r21 verdict's item 2: the driver's
    // per-query comparator found no per-query data in either round's
    // artifact). The full named map is 3.3 KB — it cannot fit the
    // driver's 2000-char output tail as one parseable line (measured:
    // every committed BENCH_r*.json tail is exactly 2000 chars, and the
    // pre-r17 benches that printed the full map were ALWAYS head-cut to
    // unparseable). So the summary carries the VALUES ONLY, comma-joined
    // in sorted-query-name order (the order of "queries" in the sidecar
    // and of CORRECTNESS_r*.json keys): ~820 chars, keeping the summary
    // line complete inside the tail window. Name list + values pair 1:1
    // by sorted order; n_queries cross-checks the count. Additive field —
    // nothing renamed or removed.
    val qtimes = results.map { case (_, v) => jnum(v) }.mkString(",")
    val summary = s"""{"metric":"total","value":${jnum(total)},"unit":"sec"$cpusField,"sf":${jstr(sfDir)},"n_queries":${results.size},"n_errors":${errors.size}$errNames,"streaming_sec":${jnum(streamTotal)},"ex_streaming_sec":${jnum(total - streamTotal)}$ratioField,"qtimes_order":"sorted_query_names","qtimes":"$qtimes","detail":"BENCH_DETAIL.json"}"""
    val rc = if (errors.nonEmpty) 1 else 0
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get(sys.env.getOrElse(
        "GRAFT_BENCH_REPORT", "/tmp/graft_bench_report.json")), report + "\n")
    catch { case NonFatal(e) =>
      // still pre-teardown, stderr is safe — a silent skip would leave a
      // STALE sidecar for validate.sh / regress_check to read as current
      System.err.println(s"[bench] sidecar report write FAILED: $e")
    }
    // Exactly one printer wins (watchdog vs main): compareAndSet guards the
    // println so a teardown finishing right at the 60 s budget can't produce
    // a duplicated or interleaved tail line.
    val printed = new java.util.concurrent.atomic.AtomicBoolean(false)
    // TWO lines, full report FIRST, summary LAST (r22 PERF-contract fix):
    // a consumer reading the whole stream gets the complete per-query
    // "queries" map from the report line (the driver contract's
    // documented shape); a consumer keeping only the 2000-char tail
    // still ends on the complete summary line exactly as in r18-r21
    // (the report's head is cut there, but the summary — totals + the
    // compact qtimes values — parses as before). Strictly additive:
    // the summary line is unchanged except added fields and stays last.
    def emitSummary(): Unit =
      if (printed.compareAndSet(false, true)) {
        println(report); println(summary); System.out.flush()
      }
    // No `return` in the runnable: inside a lambda it throws
    // NonLocalReturnControl, which escapes the Runnable and makes the dying
    // thread print "Exception in thread bench-report-watchdog ..." to stderr
    // (seen in the r17 tail) — exactly the post-teardown noise this teardown
    // exists to prevent.
    val watchdog = new Thread(() => {
      val interrupted =
        try { Thread.sleep(60000L); false }
        catch { case _: InterruptedException => true }
      if (!interrupted) {
        emitSummary()
        Runtime.getRuntime.halt(rc)
      }
    }, "bench-report-watchdog")
    watchdog.setDaemon(true)
    watchdog.start()
    try spark.streams.active.foreach { q =>
      try { q.stop(); q.awaitTermination(10000) } catch { case NonFatal(_) => () }
    } catch { case NonFatal(_) => () }
    try org.apache.spark.sql.execution.streaming.state.StateStore.stop()
    catch { case NonFatal(_) => () }
    try spark.sparkContext.setLogLevel("OFF") catch { case NonFatal(_) => () }
    try spark.stop() catch { case NonFatal(_) => () }
    watchdog.interrupt()
    System.err.flush()
    emitSummary()
    // halt, not sys.exit: exit runs JVM shutdown hooks (Spark temp-dir
    // cleanup etc.) with the watchdog already interrupted — a wedged hook
    // would hang the process with no guard, and a hook writing to stdout
    // would land AFTER the summary line, corrupting the tail this whole
    // teardown protects. The sidecar is written and stdout flushed; the
    // watchdog path already halts for exactly these reasons.
    Runtime.getRuntime.halt(rc)
  }
}
