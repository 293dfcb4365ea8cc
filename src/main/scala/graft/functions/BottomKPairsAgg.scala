package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded bottom-k aggregator over (priority, payload) pairs: keeps the
  * k pairs that are SMALLEST under the total order (priority, payload),
  * ascending — a deterministic fixed-size sample when the priority is a
  * uniform per-row hash, carrying a payload column along with it.
  *
  * This is [[BottomKAgg]]'s contract extended to a payload: the KMV
  * sketch answers "how many distinct", this answers "what do typical
  * rows look like" (quantiles, examples) from the same O(k)-per-group
  * state. Like its sibling it prunes inside each map task (partial
  * aggregation), so a group's sample costs O(k · #mappers) shuffle
  * bytes regardless of group size, and the result is DETERMINISTIC —
  * the k smallest pairs of a set don't depend on merge order or
  * partitioning, which is what lets `events_quantile_sketch` hash-match
  * a DuckDB mirror of the same sample. Ties on priority are broken by
  * the payload (the ordering is over the PAIR), so even hash collisions
  * resolve identically in both engines; duplicate pairs collapse (the
  * sample is over the distinct pair set).
  */
class BottomKPairsAgg(k: Int)
    extends Aggregator[(Long, Double), ArrayBuffer[(Long, Double)],
      Seq[(Long, Double)]] {
  require(k >= 1, s"need k >= 1, got $k")

  private val ord = Ordering.Tuple2[Long, Double]

  /** Payload normalization so JVM pair equality (`distinct`) matches SQL
    * comparison semantics in the oracle engine: -0.0 folds to 0.0 (equal
    * in SQL, unequal under Double.equals), NaN payloads are refused
    * (SQL's NULL-like comparison rules for NaN have no JVM-equality
    * mirror — callers filter them alongside nulls). */
  private def norm(p: (Long, Double)): (Long, Double) = {
    require(!p._2.isNaN, "NaN payload: filter NaN rows before sampling " +
      "(SQL DISTINCT/comparison semantics for NaN diverge from JVM " +
      "equality, so the sample would not be engine-portable)")
    if (p._2 == 0.0) (p._1, 0.0) else p
  }

  private def prune(
      b: ArrayBuffer[(Long, Double)]): ArrayBuffer[(Long, Double)] = {
    val kept = b.distinct.sorted(ord).take(k)
    b.clear(); b ++= kept; b
  }

  override def zero: ArrayBuffer[(Long, Double)] = ArrayBuffer.empty
  override def reduce(b: ArrayBuffer[(Long, Double)],
      p: (Long, Double)): ArrayBuffer[(Long, Double)] = {
    b += norm(p)
    if (b.size > 4 * k) prune(b) else b
  }
  override def merge(b1: ArrayBuffer[(Long, Double)],
      b2: ArrayBuffer[(Long, Double)]): ArrayBuffer[(Long, Double)] =
    prune(b1 ++= b2)
  override def finish(b: ArrayBuffer[(Long, Double)]): Seq[(Long, Double)] =
    prune(b).toSeq
  override def bufferEncoder: Encoder[ArrayBuffer[(Long, Double)]] =
    Encoders.kryo[ArrayBuffer[(Long, Double)]]
  override def outputEncoder: Encoder[Seq[(Long, Double)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
