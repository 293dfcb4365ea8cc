package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded bottom-k aggregator over 64-bit hash values: keeps the k
  * SMALLEST longs per group, ascending — a KMV (k-minimum-values)
  * sketch when fed uniform hashes.
  *
  * Unlike `row_number().over(Window.partitionBy(g).orderBy(h)) <= k`,
  * which shuffles every distinct hash and sorts whole partitions, this
  * prunes to k inside each map task (partial aggregation), so a group's
  * sketch costs O(k · #mappers) shuffle bytes no matter how many
  * distinct values the group holds. The result is DETERMINISTIC for a
  * given input set (the k smallest of a set don't depend on merge
  * order), which is what lets `corpus_overlap_kmv` hash-match a DuckDB
  * mirror of the same sketch.
  *
  * Duplicate hashes are collapsed (a KMV sketch is over the distinct
  * set); feed pre-distinct rows when exactness of the "k smallest
  * distinct" contract matters — the aggregator dedups defensively.
  */
class BottomKAgg(k: Int)
    extends Aggregator[Long, ArrayBuffer[Long], Seq[Long]] {
  require(k >= 1, s"need k >= 1, got $k")

  private def prune(b: ArrayBuffer[Long]): ArrayBuffer[Long] = {
    val kept = b.distinct.sorted.take(k)
    b.clear(); b ++= kept; b
  }

  override def zero: ArrayBuffer[Long] = ArrayBuffer.empty
  override def reduce(b: ArrayBuffer[Long], h: Long): ArrayBuffer[Long] = {
    b += h
    if (b.size > 4 * k) prune(b) else b
  }
  override def merge(b1: ArrayBuffer[Long],
      b2: ArrayBuffer[Long]): ArrayBuffer[Long] = prune(b1 ++= b2)
  override def finish(b: ArrayBuffer[Long]): Seq[Long] = prune(b).toSeq
  override def bufferEncoder: Encoder[ArrayBuffer[Long]] =
    Encoders.kryo[ArrayBuffer[Long]]
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
