package graft

import org.apache.spark.sql.functions._

import graft.operators.Skew

/** Salted join/aggregation must be result-identical to the direct forms. */
class SkewSpec extends SparkSpec {

  test("AQE splits a skewed shuffle-join partition at runtime") {
    // salting (below) is the planned answer to KNOWN skew; AQE's
    // OptimizeSkewedJoin is the runtime answer to discovered skew. Pin
    // that it actually fires: 90% of left rows share one key, and with
    // the skew thresholds at fixture scale the sort-merge join must
    // read the hot partition as multiple skew-split slices.
    import org.apache.spark.sql.functions._
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled")
      .map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "10KB")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set(
        "spark.sql.adaptive.advisoryPartitionSizeInBytes", "10KB")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      val left = spark.range(200000)
        .select(when(col("id") % 10 < 9, lit(0L)).otherwise(col("id"))
          .as("k"), col("id").as("v"))
      val right = spark.range(1000).select(col("id").as("k"),
        (col("id") * 2).as("w"))
      val q = left.join(right, Seq("k")).agg(count(lit(1)).as("n"))
      q.collect()
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true") && plan.contains("AQEShuffleRead skewed"),
        s"AQE skew-join split did not fire:\n$plan")
    } finally saved.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }
  import spark.implicits._

  test("saltedJoin equals plain join") {
    val dir = sf("sf0.001")
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_extendedprice"))
    // reuse orders keyed like the fact side
    val dim = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderstatus"))
    val plain = li.join(dim, Seq("l_orderkey"))
    val salted = Skew.saltedJoin(li, dim, "l_orderkey", nSalts = 8)
    assert(salted.count() === plain.count())
    // integer sum: order-insensitive, so exact compare is safe
    assert(salted.agg(sum("l_orderkey")).as[Long].head() ===
      plain.agg(sum("l_orderkey")).as[Long].head())
  }

  test("saltedSum equals direct groupBy sum") {
    val df = Seq(("hot", 1L), ("hot", 2L), ("hot", 3L), ("cold", 10L))
      .toDF("k", "v")
    val direct = df.groupBy("k").agg(sum("v").as("sum_v"))
      .as[(String, Long)].collect().toMap
    val salted = Skew.saltedSum(df, "k", "v", nSalts = 4)
      .as[(String, Long)].collect().toMap
    assert(salted === direct)
  }
}
