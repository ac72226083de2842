package graft.functions

/**
 * Pure, deterministic space-filling-curve math shared by the interpreted and
 * code-generated paths of the clustering expressions. Static (no state) so
 * whole-stage codegen can call straight into it.
 */
object Curves {

  /** Interleave the low `bits` bits of each coordinate (Morton / Z-order).
    * dims * bits must be <= 63. Coordinate order: c(0) owns the MSB. */
  def zValue(coords: Array[Int], bits: Int): Long = {
    var out = 0L
    var b = bits - 1
    while (b >= 0) {
      var d = 0
      while (d < coords.length) {
        out = (out << 1) | ((coords(d) >>> b) & 1L)
        d += 1
      }
      b -= 1
    }
    out
  }

  /**
   * Hilbert-curve index of a point, Skilling's transpose algorithm
   * (J. Skilling, "Programming the Hilbert curve", AIP Conf. Proc. 707, 2004
   * — public domain algorithm). Input coords in [0, 2^bits); returns the
   * curve position as a long (dims*bits <= 63).
   */
  def hilbertValue(coordsIn: Array[Int], bits: Int): Long = {
    val n = coordsIn.length
    val x = new Array[Long](n)
    var i = 0
    while (i < n) { x(i) = coordsIn(i).toLong & ((1L << bits) - 1); i += 1 }

    // Inverse undo: axes -> transposed Hilbert
    var q = 1L << (bits - 1)
    while (q > 1) {
      val p = q - 1
      i = 0
      while (i < n) {
        if ((x(i) & q) != 0) x(0) ^= p // invert
        else { val t = (x(0) ^ x(i)) & p; x(0) ^= t; x(i) ^= t } // exchange
        i += 1
      }
      q >>= 1
    }
    // Gray encode
    i = 1
    while (i < n) { x(i) ^= x(i - 1); i += 1 }
    var t = 0L
    q = 1L << (bits - 1)
    while (q > 1) { if ((x(n - 1) & q) != 0) t ^= q - 1; q >>= 1 }
    i = 0
    while (i < n) { x(i) ^= t; i += 1 }

    // Interleave the transposed form into a single index: bit b of axis i
    // lands at position (bits-1-b)*n + i from the MSB side.
    var out = 0L
    var b = bits - 1
    while (b >= 0) {
      i = 0
      while (i < n) {
        out = (out << 1) | ((x(i) >>> b) & 1L)
        i += 1
      }
      b -= 1
    }
    out
  }

  /** Bucket index of `v` given sorted exclusive upper `bounds` (range
    * partition id): number of bounds strictly less-or-equal below v.
    * Generic binary search over Comparable; bounds length = buckets-1. */
  def bucketOf(v: Comparable[Any], bounds: Array[AnyRef]): Int = {
    var lo = 0
    var hi = bounds.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (v.compareTo(bounds(mid).asInstanceOf[Any]) > 0) lo = mid + 1 else hi = mid
    }
    lo
  }
}
