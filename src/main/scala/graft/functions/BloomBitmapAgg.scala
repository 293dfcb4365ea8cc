package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Bloom-filter bitmap accumulator: input = one bit position per
  * (key, hash-function) pair; buffer/output = the m-bit filter packed
  * into an Array[Long].
  *
  * The build side of a membership PREFILTER at blocklist scale: an
  * exact key set broadcast costs O(n) bytes and stops fitting once the
  * blocklist reaches billions of keys, but the bloom bitmap costs m/8
  * bytes REGARDLESS of n — m is the knob that trades false-positive
  * rate for broadcast size, and false positives are harmless because a
  * confirm equi-join on the candidates restores exactness. OR-merge is
  * associative and commutative, so the aggregation map-side combines
  * to one bitmap per mapper and the shuffle carries at most one m-bit
  * array per input partition, never per-key rows.
  */
class BloomBitmapAgg(nBits: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] {
  require(nBits >= 64 && nBits % 64 == 0,
    s"nBits $nBits must be a positive multiple of 64")

  override def zero: Array[Long] = new Array[Long](nBits / 64)

  override def reduce(buf: Array[Long], pos: Long): Array[Long] = {
    require(pos >= 0 && pos < nBits, s"position $pos outside [0, $nBits)")
    buf((pos >> 6).toInt) |= 1L << (pos & 63)
    buf
  }

  override def merge(a: Array[Long], o: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= o(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
