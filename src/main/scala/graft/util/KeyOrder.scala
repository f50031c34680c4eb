package graft.util

/**
 * THE key ordering of the engine: UTF-8 byte order (= Unicode code-point
 * order), applied uniformly to cluster sorts, boundary partitioning,
 * summary pruning, range trims, and k-way merges.
 *
 * Why not Java `String` ordering (SURVEY §7 risk 4): `String.compareTo`
 * compares UTF-16 code units, which sorts supplementary characters
 * (surrogate pairs, 0xD800–0xDFFF units) BELOW U+E000–U+FFFF — the
 * opposite of byte order. Spark's `UTF8String` comparison, DuckDB's
 * VARCHAR comparison, `sort(1)`, and Hadoop `Text` (the ordering the
 * reference's MR shuffle ACTUALLY produced on disk — its Java-side
 * `String.compareTo` binary searches were the inconsistent part) are all
 * byte-wise. One ordering everywhere means the DSv2 scan's reported
 * `outputOrdering` is sound for Catalyst, and a cluster built here prunes
 * correctly when queried, for every code point.
 *
 * Implementation: UTF-16 comparison with the standard surrogate fix-up
 * (shift 0xE000+ down, surrogates up) — byte-order results without
 * allocating UTF-8 copies.
 */
object KeyOrder extends Ordering[String] {

  override def compare(a: String, b: String): Int = {
    val lim = math.min(a.length, b.length)
    var i = 0
    while (i < lim) {
      val ca = a.charAt(i)
      val cb = b.charAt(i)
      if (ca != cb) {
        if (ca >= 0xD800 && cb >= 0xD800)
          return (if (ca >= 0xE000) ca - 0x800 else ca + 0x2000) -
            (if (cb >= 0xE000) cb - 0x800 else cb + 0x2000)
        return ca - cb
      }
      i += 1
    }
    a.length - b.length
  }

  override def lt(a: String, b: String): Boolean = compare(a, b) < 0
  override def lteq(a: String, b: String): Boolean = compare(a, b) <= 0
  override def gteq(a: String, b: String): Boolean = compare(a, b) >= 0
}
