package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k aggregator: keeps at most k (score, id) pairs per group,
  * ordered by (score desc, id asc).
  *
  * This is the scale-critical alternative to
  * `row_number().over(Window.partitionBy(q).orderBy(...)) <= k`: the
  * window form shuffles EVERY candidate row and sorts whole partitions;
  * this aggregator prunes to k inside each map task (partial aggregation),
  * so only ≤ k·#mappers rows per group ever reach the shuffle. At 100 TB
  * candidate volume that is the difference between a broadcast-sized
  * shuffle and a full-data sort.
  */
class TopKAgg(k: Int)
    extends Aggregator[TopKAgg.ScoredId, ArrayBuffer[TopKAgg.ScoredId],
      Seq[TopKAgg.ScoredId]] {
  import TopKAgg._

  private def prune(b: ArrayBuffer[ScoredId]): ArrayBuffer[ScoredId] = {
    val kept = b.sorted(ord).take(k)
    b.clear(); b ++= kept; b
  }

  override def zero: ArrayBuffer[ScoredId] = ArrayBuffer.empty
  override def reduce(b: ArrayBuffer[ScoredId], a: ScoredId): ArrayBuffer[ScoredId] = {
    b += a
    if (b.size > 4 * k) prune(b) else b
  }
  override def merge(b1: ArrayBuffer[ScoredId],
      b2: ArrayBuffer[ScoredId]): ArrayBuffer[ScoredId] = prune(b1 ++= b2)
  override def finish(b: ArrayBuffer[ScoredId]): Seq[ScoredId] =
    prune(b).toSeq
  override def bufferEncoder: Encoder[ArrayBuffer[ScoredId]] =
    Encoders.kryo[ArrayBuffer[ScoredId]]
  override def outputEncoder: Encoder[Seq[ScoredId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}

object TopKAgg {
  case class ScoredId(cos: Double, id: Long)
  /** (score desc, id asc) — the same deterministic tie-break as the
    * ranking-window form, so both share one oracle. */
  val ord: Ordering[ScoredId] = Ordering.by(s => (-s.cos, s.id))
}
