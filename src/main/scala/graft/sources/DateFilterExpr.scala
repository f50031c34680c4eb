package graft.sources

import java.text.SimpleDateFormat
import java.util.{Locale, TimeZone}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/**
 * The reference's mtime filter-expression frontend, re-derived for the
 * Spark file-listing path (`hadoop/pig/DateFilter.java:139-214` parse,
 * `:46-53` ops, `:55-70` comparison, `:72-86` direction-aware directory
 * skip, `:215-236` date-or-path operands). Accepted forms
 * (whitespace-separated, `OP` ∈ `< > <= >= =`):
 *
 *   - `OP X`                →  `mtime OP X`
 *   - `mtime OP X`          →  upper/lower bound, mtime on the left
 *   - `X OP mtime`          →  bound with the DATE on the left
 *   - `X OP mtime OP2 Y`    →  band: `X OP mtime` and `mtime OP2 Y`
 *
 * Operand `X` is a date (`yyyy-MM-dd'T'HH:mm:ss` — T-separated, since
 * the grammar tokenizes on whitespace — or a 4/6/8/14-digit archive
 * timestamp, both UTC) or a PATH — in which case that file's own
 * modification time is the bound ("newer than file F", the
 * reference's incremental-job idiom). Precedence is date-first (as in
 * the reference): an all-digit name of length 4/6/8/14 always parses
 * as a timestamp; write `path:X` to force path interpretation.
 *
 * Directory semantics match the reference exactly: LOWER bounds
 * (`mtime > X` shapes) are applied to directories — a directory whose
 * mtime fails a lower bound is pruned with its whole subtree — while
 * UPPER bounds skip directories (an old file can live in a recently
 * modified directory, so upper bounds must not prune the walk); `=`
 * applies to directories too.
 *
 * At 100 TB this is a LISTING-time filter: it prunes files (and whole
 * directory subtrees) before any Spark task exists, which is exactly
 * where a date predicate must run — a post-scan filter would still
 * list and plan a million files. For plain bands over files Spark's
 * own `modifiedAfter`/`modifiedBefore` options are equivalent; this
 * frontend adds the reference's expression syntax, `=`, path-valued
 * bounds, and the subtree-pruning walk.
 */
final case class DateFilterExpr(
    lowerMs: Option[(DateFilterExpr.Op, Long)],  // date2 OP mtime (X on left)
    upperMs: Option[(DateFilterExpr.Op, Long)]) { // mtime OP date1

  import DateFilterExpr._

  /** Reference `acceptWhenEnabled` (DateFilter.java:238-287): both
    * bounds must hold; directories bypass a bound iff `dirSkip`. */
  def accept(mtimeMs: Long, isDir: Boolean): Boolean = {
    val okLower = lowerMs.forall { case (op, x) =>
      (isDir && dirSkip(op, dateOnLeft = true)) || compare(op, x, mtimeMs)
    }
    val okUpper = upperMs.forall { case (op, y) =>
      (isDir && dirSkip(op, dateOnLeft = false)) || compare(op, mtimeMs, y)
    }
    okLower && okUpper
  }

  /** Recursive listing with subtree pruning: a directory that fails a
    * lower bound is not descended into. Returns accepted FILE paths.
    *
    * Matches the reference walk's other two contracts too: the ROOT is
    * seeded unfiltered (its own mtime only changes when DIRECT entries
    * change, so filtering it would wrongly empty the listing when the
    * changes sit deeper), and hidden entries (`_`/`.` prefixes —
    * `_temporary`, `_SUCCESS`, dot-files) are excluded the way every
    * Hadoop input walk excludes them (LSRPigLoader's hiddenFileFilter),
    * so in-flight job temp files never reach a loader. */
  def listFiles(fs: FileSystem, root: Path,
                extSuffix: String = ""): Seq[Path] = {
    val out = Seq.newBuilder[Path]
    def hidden(p: Path): Boolean =
      p.getName.startsWith("_") || p.getName.startsWith(".")
    // walk on the FileStatus listStatus already returned — a per-child
    // getFileStatus would double the namenode RPCs of a million-file
    // listing; only the root seed needs its own stat
    def walk(st: org.apache.hadoop.fs.FileStatus, isRoot: Boolean): Unit = {
      val p = st.getPath
      if (st.isDirectory) {
        if (isRoot || accept(st.getModificationTime, isDir = true))
          fs.listStatus(p).filterNot(c => hidden(c.getPath))
            .foreach(c => walk(c, isRoot = false))
      } else if (extSuffix.isEmpty || p.getName.endsWith(extSuffix)) {
        if (accept(st.getModificationTime, isDir = false)) out += p
      }
    }
    walk(fs.getFileStatus(root), isRoot = true)
    out.result()
  }
}

object DateFilterExpr {

  sealed trait Op
  case object Eq extends Op
  case object Lt extends Op
  case object Gt extends Op
  case object GtEq extends Op
  case object LtEq extends Op

  private[sources] def compare(op: Op, a: Long, b: Long): Boolean = op match {
    case Eq => a == b
    case Lt => a < b
    case Gt => a > b
    case GtEq => a >= b
    case LtEq => a <= b
  }

  /** DateFilter.java:72-86: lower bounds apply to dirs, upper bounds
    * skip them. With the date on the left (`X < mtime`), `<`/`<=` are
    * lower bounds; with mtime on the left, `>`/`>=` are. */
  private[sources] def dirSkip(op: Op, dateOnLeft: Boolean): Boolean =
    op match {
      case Lt | LtEq => !dateOnLeft // `mtime < Y`: upper bound, skip dirs
      case Gt | GtEq => dateOnLeft  // `X > mtime`: upper bound, skip dirs
      case Eq => false
    }

  private def parseOp(s: String): Op = s match {
    case "=" => Eq
    case "<" => Lt
    case ">" => Gt
    case ">=" => GtEq
    case "<=" => LtEq
    case other =>
      throw new IllegalArgumentException(s"Illegal comparison op: $other")
  }

  /** Operand → epoch millis: ISO datetime (`2012-01-03T08:45:08` — the
    * grammar tokenizes on whitespace, so a space-separated datetime can
    * never be a single operand; the reference had the same constraint
    * and was used with digit timestamps), archive timestamp (4/6/8/14
    * digits, padded like ArchiveUtils), or a path whose own mtime is
    * the bound. UTC throughout — the reference's locale-defaulted
    * SimpleDateFormat is not portable. */
  private def parseDateMs(s: String, conf: Configuration): Long = {
    // precedence trap (faithful to the reference, but silent): an
    // all-digit operand of length 4/6/8/14 parses as an archive
    // TIMESTAMP, never as a path — a marker file named `2024` becomes
    // "newer than year 2024". `path:X` (or a `./`-qualified name)
    // forces path interpretation.
    if (s.startsWith("path:")) return pathMtime(s.stripPrefix("path:"), conf)
    // full-string parse only: SimpleDateFormat.parse(String) accepts a
    // matching PREFIX and drops the tail, which would silently misread
    // a path operand like `2024-01-01T00:00:00-snapshot/marker` as a
    // date (and accept zone suffixes while ignoring them)
    val fmt = new SimpleDateFormat("yyyy-MM-dd'T'HH:mm:ss", Locale.ROOT)
    fmt.setTimeZone(TimeZone.getTimeZone("UTC"))
    fmt.setLenient(false)
    val pos = new java.text.ParsePosition(0)
    val parsed = fmt.parse(s, pos)
    if (parsed != null && pos.getIndex == s.length) return parsed.getTime
    if (s.nonEmpty && s.length <= 14 && s.forall(_.isDigit) &&
        Set(4, 6, 8, 14).contains(s.length)) {
      val padded = s + "20000101000000".substring(s.length)
      val f14 = new SimpleDateFormat("yyyyMMddHHmmss", Locale.ROOT)
      f14.setTimeZone(TimeZone.getTimeZone("UTC"))
      f14.setLenient(false)
      return f14.parse(padded).getTime
    }
    pathMtime(s, conf)
  }

  // a path operand resolves on ITS OWN scheme's FileSystem — a
  // session-default fs (e.g. HDFS) must not reject or re-anchor a
  // file:/ operand used against a local root
  private def pathMtime(s: String, conf: Configuration): Long = {
    val p = new Path(s)
    p.getFileSystem(conf).getFileStatus(p).getModificationTime
  }

  /** DateFilter.java:138-185 token grammar, verbatim. */
  def parse(expr: String,
            conf: Configuration = new Configuration()): DateFilterExpr = {
    val p = expr.trim.split("\\s+")
    p.length match {
      case 2 => // OP X  →  mtime OP X
        DateFilterExpr(None, Some((parseOp(p(0)), parseDateMs(p(1), conf))))
      case 3 if p(0) == "mtime" =>
        DateFilterExpr(None, Some((parseOp(p(1)), parseDateMs(p(2), conf))))
      case 3 if p(2) == "mtime" =>
        DateFilterExpr(Some((parseOp(p(1)), parseDateMs(p(0), conf))), None)
      case 3 =>
        throw new IllegalArgumentException(
          "Must Specify mtime as param: X < mtime or mtime > X")
      case 5 =>
        if (p(2) != "mtime") throw new IllegalArgumentException(
          "Must Specify mtime as param: X < mtime < Y")
        DateFilterExpr(
          Some((parseOp(p(1)), parseDateMs(p(0), conf))),
          Some((parseOp(p(3)), parseDateMs(p(4), conf))))
      case _ =>
        throw new IllegalArgumentException(
          "Must use form: OP X, X OP mtime, mtime OP X, X OP mtime OP2 Y, " +
            "where OP is one of <, >, <=, >=, =")
    }
  }
}
