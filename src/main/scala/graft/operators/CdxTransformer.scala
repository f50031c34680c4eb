package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}

import graft.functions.Surt

/**
 * O8 — experimental SURT-split CDX layout rewrite
 * (/root/reference/src/main/java/org/archive/hadoop/jobs/CDXTransformer.java:55-139;
 * disabled in the reference's JobDriver at JobDriver.java:46-48 but kept in
 * its tree, so re-expressed here for inventory completeness).
 *
 * Input: legacy CDX-9/10 lines ("N b a m s k r [M] V g"). Per line:
 *  - 10-field rows whose robot-flags contain 'A' (noarchive) are dropped
 *    (CDXTransformer.java:72-76);
 *  - rows whose offset field is non-numeric are dropped (:87-93);
 *  - the original URL is canonicalized and re-keyed into a SPLIT key:
 *    `(` + SURT(public suffix) as one column, canonical path+query as
 *    another — the "domain-major" layout the experiment was exploring —
 *    followed by the capture timestamp, the public PREFIX (subdomain
 *    labels, `-` if none), the scheme (`-` if scheme-less), and the
 *    remaining CDX fields unchanged (:124-137).
 *
 * Spark-first: one `flatMap` projection over a `Dataset[String]`; the
 * canonicalization reuses [[Surt.surtLenient]] so the split key agrees
 * byte-for-byte with every other SURT in the engine.
 */
object CdxTransformer {

  /** Second-level registries under 2-letter ccTLDs (minimal embedded
    * public-suffix heuristic: `a.b.site.co.uk` → suffix `site.co.uk`). */
  private val SecondLevel = Set("co", "com", "org", "net", "ac", "gov", "edu")

  /** Host labels (normal order) → (publicPrefix or "-", publicSuffix).
    * IP-address hosts don't split: there is no registered domain inside an
    * IP, so the whole address is the suffix (keying '(101,78' for
    * 109.123.78.101 would collapse all captures under 2-octet keys). */
  def splitHost(host: String): (String, String) = {
    val labels = host.split('.')
    val isIpv4 = labels.length == 4 && labels.forall(_.forall(_.isDigit))
    if (isIpv4) return ("-", host)
    val n = labels.length
    val suffixLen =
      if (n >= 3 && labels(n - 1).length == 2 && SecondLevel(labels(n - 2))) 3
      else math.min(2, n)
    val prefix = labels.dropRight(suffixLen).mkString(".")
    (if (prefix.isEmpty) "-" else prefix,
      labels.takeRight(suffixLen).mkString("."))
  }

  /** host → SURT form (`site.co.uk` → `uk,co,site`). */
  def hostToSurt(host: String): String = host.split('.').reverse.mkString(",")

  final case class Row(
      suffix_surt: String, path_query: String, timestamp: String,
      public_prefix: String, scheme: String, original_url: String,
      mimetype: String, statuscode: String, digest: String,
      redirect_url: String, offset: Long, filename: String)

  /** One input CDX-9/10 line → Some(split-layout row) or None (dropped). */
  def transformLine(line: String): Option[Row] = {
    val parts = line.split(" ", 11)
    val offsetIdx = parts.length match {
      case 9 => 7
      case 10 if parts(7).contains("A") => return None // noarchive
      case 10 => 8
      case _ => return None // bad format
    }
    val offset = parts(offsetIdx).toLongOption.getOrElse(return None)
    val origUrl = parts(2)
    val surt = Surt.surtLenient(origUrl)
    val i = surt.indexOf(')')
    if (i < 0) return None
    // strip :port for the host split — but only OUTSIDE a bracketed IPv6
    // address, whose colons are address bytes: split(':')(0) collapsed
    // every [2001:...] host onto the "[2001" key, merging distinct hosts
    // (the reference parses the host structurally via URLParser/HandyURL
    // and never colon-splits, so it does not share this hazard)
    val hostPort = surt.take(i)
    val keyHost =
      if (hostPort.startsWith("[")) {
        val close = hostPort.indexOf(']')
        if (close >= 0) hostPort.take(close + 1) else hostPort
      } else {
        val c = hostPort.indexOf(':')
        if (c >= 0) hostPort.take(c) else hostPort
      }
    val hostLabels = keyHost.split(',').reverse.mkString(".")
    val (prefix, suffix) = splitHost(hostLabels)
    val scheme = {
      val j = origUrl.indexOf("://")
      if (j > 0 && origUrl.take(j).forall(c => c.isLetterOrDigit || "+-.".contains(c)))
        origUrl.take(j).toLowerCase
      else "-"
    }
    Some(Row(
      suffix_surt = "(" + hostToSurt(suffix),
      path_query = surt.drop(i + 1),
      timestamp = parts(1),
      public_prefix = prefix,
      scheme = scheme,
      original_url = origUrl,
      mimetype = parts(3),
      statuscode = parts(4),
      digest = parts(5),
      redirect_url = parts(6),
      offset = offset,
      filename = parts(offsetIdx + 1)))
  }

  def apply(lines: Dataset[String]): DataFrame = {
    val spark = lines.sparkSession
    import spark.implicits._
    lines.flatMap(transformLine(_)).toDF()
  }
}
