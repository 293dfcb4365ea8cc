package graft

import org.apache.spark.sql.functions._

import graft.operators.Skew

/** Salted join/aggregation must be result-identical to the direct forms. */
class SkewSpec extends SparkSpec {
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
