package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded Misra-Gries heavy-hitter summary: at most `k` counters per
  * group, mergeable, with the classic frequency guarantee — every item
  * whose true frequency exceeds N/(k+1) is PRESENT in the summary, and
  * each surviving counter undercounts by at most N/(k+1).
  *
  * This is the scale-critical alternative to `GROUP BY token HAVING
  * count(*) > t` for finding frequent items in a 100 TB token stream:
  * the exact form shuffles one row per DISTINCT key (the long tail
  * dominates), while this aggregator carries ≤ k counters per map task
  * through partial aggregation, so the shuffle is O(k · #mappers)
  * regardless of vocabulary size. The candidate set it emits is a
  * guaranteed SUPERSET of the true heavy hitters, so an exact
  * counts-of-candidates-only verify pass (a semi-join) restores exact
  * answers — the candidates-then-verify shape every dedup/ANN operator
  * in this repo uses.
  *
  * The summary CONTENT depends on merge order (Spark task scheduling),
  * but the guarantee does not: callers must treat it as a candidate
  * set, never as final counts. `queries/TextQueries.text_heavy_hitters`
  * filters on exact re-counted frequencies, which makes the final
  * output deterministic.
  *
  * Merge rule (Agarwal et al., "Mergeable Summaries"): sum counters
  * pointwise, then subtract the (k+1)-th largest count from every
  * counter and drop the non-positive ones — the combined summary keeps
  * the same error bound with the same k.
  */
class FreqSketchAgg(k: Int)
    extends Aggregator[String, mutable.HashMap[String, Long],
      Map[String, Long]] {
  require(k >= 1, s"need at least one counter, got k=$k")

  override def zero: mutable.HashMap[String, Long] = mutable.HashMap.empty

  override def reduce(b: mutable.HashMap[String, Long],
      tok: String): mutable.HashMap[String, Long] = {
    b.get(tok) match {
      case Some(c) => b.update(tok, c + 1L)
      case None if b.size < k => b.update(tok, 1L)
      case None =>
        // full and unseen: decrement every counter (the arriving item's
        // implicit counter hits zero immediately), dropping zeros
        val dead = mutable.ArrayBuffer.empty[String]
        b.foreach { case (t, c) =>
          if (c == 1L) dead += t else b.update(t, c - 1L)
        }
        dead.foreach(b.remove)
    }
    b
  }

  override def merge(b1: mutable.HashMap[String, Long],
      b2: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b2.foreach { case (t, c) => b1.update(t, b1.getOrElse(t, 0L) + c) }
    if (b1.size > k) {
      // subtract the (k+1)-th largest count from everything
      val counts = b1.values.toArray
      java.util.Arrays.sort(counts)
      val cut = counts(counts.length - k - 1)
      val dead = mutable.ArrayBuffer.empty[String]
      b1.foreach { case (t, c) =>
        if (c - cut <= 0L) dead += t else b1.update(t, c - cut)
      }
      dead.foreach(b1.remove)
    }
    b1
  }

  override def finish(b: mutable.HashMap[String, Long]): Map[String, Long] =
    b.toMap

  override def bufferEncoder: Encoder[mutable.HashMap[String, Long]] =
    Encoders.kryo[mutable.HashMap[String, Long]]
  override def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
