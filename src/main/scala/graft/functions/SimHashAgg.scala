package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** SimHash vote accumulator: input = one word-hash bit mask per word
  * occurrence; buffer = per-bit vote counters; output = the packed sign
  * fingerprint.
  *
  * This replaces the relational form (explode every word × every bit →
  * two hash aggregations) with one object-hash aggregation whose map
  * side combines per document: the shuffle carries one `bits`-long
  * counter array per (mapper, doc) instead of |words| × bits vote rows —
  * at 100 TB corpus scale that is orders of magnitude less shuffle. The
  * oracle-checked `dedup_simhash` query proves the output identical to
  * the DuckDB relational mirror bit-for-bit.
  */
class SimHashAgg(bits: Int)
    extends Aggregator[Long, Array[Long], Long] {

  override def zero: Array[Long] = new Array[Long](bits)

  override def reduce(buf: Array[Long], mask: Long): Array[Long] = {
    var b = 0
    while (b < bits) {
      buf(b) += (if (((mask >> b) & 1L) == 1L) 1L else -1L)
      b += 1
    }
    buf
  }

  override def merge(a: Array[Long], o: Array[Long]): Array[Long] = {
    var b = 0
    while (b < bits) { a(b) += o(b); b += 1 }
    a
  }

  override def finish(buf: Array[Long]): Long = {
    var m = 0L
    var b = 0
    while (b < bits) { if (buf(b) > 0) m |= 1L << b; b += 1 }
    m
  }

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
