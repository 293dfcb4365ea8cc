package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed Aggregator building the ordered per-block tx-id list in one pass
  * (U4 in SURVEY.md §2.10): the alternative to
  * `sort_array(collect_list(...))` when the ordering guarantee should be
  * enforced by the aggregate itself rather than a post-sort. Emits the
  * same csv encoding as the relational form, so both implementations share
  * one oracle.
  *
  * Merge-friendly: partial buffers are plain Long arrays; sort happens
  * once at finish — so map-side partials stay cheap and the shuffle
  * carries compact arrays, exactly like collect_list.
  */
object SortedTxListAgg extends Aggregator[Long, ArrayBuffer[Long], String] {
  override def zero: ArrayBuffer[Long] = ArrayBuffer.empty[Long]
  override def reduce(b: ArrayBuffer[Long], a: Long): ArrayBuffer[Long] = {
    b += a; b
  }
  override def merge(b1: ArrayBuffer[Long], b2: ArrayBuffer[Long]): ArrayBuffer[Long] = {
    b1 ++= b2; b1
  }
  override def finish(b: ArrayBuffer[Long]): String =
    b.sorted.mkString(",")
  override def bufferEncoder: Encoder[ArrayBuffer[Long]] =
    Encoders.kryo[ArrayBuffer[Long]]
  override def outputEncoder: Encoder[String] = Encoders.STRING
}
