package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded posting-list head + exact doc frequency in ONE pass: keeps
  * the k smallest ids seen so far plus a running count. Partial-
  * aggregation-safe (map-side prune), so a stopword token's buffer
  * never exceeds 4k ids ANYWHERE in the plan — the agg-state bound an
  * inverted-index build needs at 100 TB. `sort_array(collect_list(...))`
  * + slice bounds only the output row; its aggregation buffer still
  * materializes every id for the token, which is the OOM/skew hazard
  * this aggregator removes ([[TopKAgg]]'s pattern, min-k + count
  * instead of score-ordered top-k). */
class PostingHeadAgg(k: Int)
    extends Aggregator[Long, PostingHeadAgg.Buf, PostingHeadAgg.Out] {
  import PostingHeadAgg._

  private def prune(b: Buf): Buf = {
    if (b.ids.size > k) {
      val kept = b.ids.sorted.take(k)
      b.ids.clear(); b.ids ++= kept
    }
    b
  }

  override def zero: Buf = Buf(0L, ArrayBuffer.empty)
  override def reduce(b: Buf, id: Long): Buf = {
    b.n += 1
    b.ids += id
    if (b.ids.size > 4 * k) prune(b) else b
  }
  override def merge(a: Buf, b: Buf): Buf = {
    a.n += b.n
    a.ids ++= b.ids
    prune(a)
  }
  override def finish(b: Buf): Out = Out(b.n, b.ids.sorted.take(k).toSeq)
  override def bufferEncoder: Encoder[Buf] = Encoders.kryo[Buf]
  override def outputEncoder: Encoder[Out] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}

object PostingHeadAgg {
  case class Buf(var n: Long, ids: ArrayBuffer[Long])
  case class Out(doc_freq: Long, postings: Seq[Long])
}
