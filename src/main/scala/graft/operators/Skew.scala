package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-handling utilities (SCALE.md): explicit key salting for the cases
  * where AQE's runtime skew split isn't available (e.g. aggregations into
  * a hot key, or fixed partitioning requirements).
  */
object Skew {

  /** Equi-join `fact ⋈ dim` on `key`, salted `nSalts` ways: the fact side
    * gets a deterministic salt derived from its row content, the dim side
    * is replicated once per salt. Hot fact keys spread over `nSalts`
    * reducers; dim grows by ×nSalts (use only when dim is small relative
    * to the skew, which is the case salting is for).
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      nSalts: Int): DataFrame = {
    val saltedFact = fact.withColumn("_salt",
      pmod(hash(struct(fact.columns.map(col).toIndexedSeq: _*)), lit(nSalts)))
    val saltedDim = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    saltedFact.join(saltedDim, Seq(key, "_salt")).drop("_salt")
  }

  /** Two-level aggregation for a skewed groupBy: partial-aggregate on
    * (key, salt), then final-aggregate on key. For algebraic aggregates
    * (sum/count/min/max) the result is identical to a direct groupBy.
    */
  def saltedSum(df: DataFrame, key: String, valueCol: String,
      nSalts: Int): DataFrame =
    df.withColumn("_salt",
      pmod(hash(struct(df.columns.map(col).toIndexedSeq: _*)), lit(nSalts)))
      .groupBy(col(key), col("_salt"))
      .agg(sum(col(valueCol)).as("_partial"))
      .groupBy(col(key))
      .agg(sum(col("_partial")).as(s"sum_$valueCol"))
}
