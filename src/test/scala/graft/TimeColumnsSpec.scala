package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row

import graft.functions.TimeColumns

/** Pins the precision-agnostic event-time contract: the SAME epoch
  * seconds come out whether `ts` arrives as a nanos LONG (old
  * TIMESTAMP(NANOS) fixtures under nanosAsLong=true), TIMESTAMP_NTZ
  * (current TIMESTAMP(MICROS) fixtures), or zoned TIMESTAMP. */
class TimeColumnsSpec extends SparkSpec {

  private val epochs = Seq(0L, 1L, 1700000000L, 4102444800L)

  private def extract(df: org.apache.spark.sql.DataFrame): Seq[Long] = {
    import spark.implicits._
    df.select(TimeColumns.epochSeconds(df).as("e"))
      .as[Long].collect().toSeq.sorted
  }

  test("nanos LONG, TIMESTAMP_NTZ, and TIMESTAMP all yield identical epoch seconds") {
    import spark.implicits._
    val asLong = epochs.map(_ * 1000000000L).toDF("ts")
    val asNtz = spark.createDataFrame(
      spark.sparkContext.parallelize(epochs.map(e =>
        Row(java.time.LocalDateTime.ofEpochSecond(e, 0, java.time.ZoneOffset.UTC)))),
      StructType(Seq(StructField("ts", TimestampNTZType))))
    val asTz = epochs.toDF("e").select(timestamp_seconds(col("e")).as("ts"))
    assert(extract(asLong) === epochs)
    assert(extract(asNtz) === epochs)
    assert(extract(asTz) === epochs)
  }

  test("nanos division is exact above 2^53 ns") {
    import spark.implicits._
    // 2^53 ns ≈ 104 days; real fixtures are decades past that — a double
    // division here would round the derived second
    val e = 1723500000L
    val df = Seq(e * 1000000000L + 999999999L).toDF("ts")
    assert(extract(df) === Seq(e))
  }

  test("unsupported type fails fast at plan-build") {
    import spark.implicits._
    val df = Seq("2024-01-01").toDF("ts")
    intercept[IllegalArgumentException] { TimeColumns.epochSeconds(df) }
  }

  test("current events fixture resolves through the observed-type branch") {
    val raw = graft.chain.Chain.table(spark, sf("sf0.001"), "events")
    val n = raw.count()
    val viaHelper = raw.select(TimeColumns.epochSeconds(raw).as("e"))
      .filter(col("e") > 0).count()
    assert(n > 0 && viaHelper === n)
  }
}
