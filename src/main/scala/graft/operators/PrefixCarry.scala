package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

/** Distributed exclusive carry ("latest non-null payload strictly before
  * me" in `ord` order) with NO single-partition sort at any input size —
  * the scalable replacement for `Window.orderBy(ord)` carry scans.
  *
  * A global-window prefix scan funnels the whole frame through one
  * partition; this operator uses the classic two-phase scan instead:
  *
  *  1. range-partition by `ord` (contiguous, ordered ranges);
  *  2. WITHIN each partition, an ordinary partitioned window computes
  *     the exclusive within-range carry;
  *  3. ACROSS partitions, only each range's latest non-null payload
  *     (ONE row per partition — the same bounded-by-construction
  *     driver set as [[graft.plans.AsOfJoin]]'s range bounds) is
  *     collected, prefix-scanned on the driver, and broadcast back.
  *
  * The cross-partition carry needs no payload comparisons: ranges are
  * ordered, so "latest over preceding ranges" is the payload of the
  * nearest preceding range that has one. Works symmetrically forward
  * ("earliest non-null strictly after me") for next-quote semantics.
  *
  * The range-partitioned frame is pinned (eager localCheckpoint) so the
  * summary job and the result plan see the identical partitioning.
  */
object PrefixCarry {

  /** Append column `carry` = the latest (backward) / earliest (forward)
    * non-null `payload` over rows strictly before / after the current
    * row in `ord` order. `ord` must be non-null; ties within `ord` are
    * not supported (callers pass distinct-keyed summaries). */
  def exclusiveCarry(df: DataFrame, ord: String, payload: String,
      forward: Boolean = false): DataFrame = {
    val s = df.sparkSession
    val ranged = df
      .repartitionByRange(col(ord))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)

    // one row per range: that range's boundary payload (latest for the
    // backward scan, earliest for the forward one)
    val edgeAgg =
      if (forward) min_by(col(payload), col(ord))
      else max_by(col(payload), col(ord))
    val edges = ranged.filter(col(payload).isNotNull)
      .groupBy(col("__pid")).agg(edgeAgg.as("p"))
      .collect().map(r => r.getInt(0) -> r.get(1)).toMap

    // driver-side exclusive scan over the (≤ #partitions) range edges:
    // range i's cross carry = the nearest preceding (following, if
    // forward) range's edge payload
    val nParts = ranged.rdd.getNumPartitions
    val ids = if (forward) (nParts - 1) to 0 by -1 else 0 until nParts
    var latest: Any = null
    val crossRows = ids.map { pid =>
      val row = Row(pid, latest)
      edges.get(pid).foreach(latest = _)
      row
    }
    val payloadField = df.schema(payload).copy(name = "__cross",
      nullable = true)
    val cross = s.createDataFrame(
      s.sparkContext.parallelize(crossRows, 1),
      StructType(Seq(StructField("__pid", IntegerType, nullable = false),
        payloadField)))

    // within-range exclusive carry: a PARTITIONED window over one
    // bounded range — never a global sort
    val wIn = Window.partitionBy(col("__pid"))
      .orderBy(if (forward) col(ord).desc else col(ord).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    ranged
      .withColumn("__in", last(col(payload), ignoreNulls = true).over(wIn))
      .join(broadcast(cross), Seq("__pid"), "left")
      .withColumn("carry", coalesce(col("__in"), col("__cross")))
      .drop("__pid", "__in", "__cross")
  }
}
