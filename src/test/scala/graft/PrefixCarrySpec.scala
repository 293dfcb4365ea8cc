package graft

import org.apache.spark.sql.functions._

import graft.operators.PrefixCarry

/** The two-phase distributed carry must equal the serial prefix scan it
  * replaces — across range-partition boundaries, through null runs
  * longer than a partition, and in both directions. */
class PrefixCarrySpec extends SparkSpec {
  import spark.implicits._

  // sparse payloads: only every 7th ord carries one, so several range
  // partitions (4 in tests) contain no payload at all near the edges
  private def fixture = (0L until 200L).map { i =>
    (i, if (i % 7 == 0) Some(i * 10) else None)
  }.toDF("ord", "pv")
    .withColumn("payload",
      when(col("pv").isNotNull, struct(col("ord"), col("pv"))))
    .drop("pv")

  test("backward carry equals the serial prefix scan") {
    val got = PrefixCarry.exclusiveCarry(fixture, "ord", "payload")
      .select(col("ord"), col("carry").getField("pv").as("c"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    (0L until 200L).foreach { i =>
      val want = (0L until i).filter(_ % 7 == 0).lastOption.map(_ * 10)
      assert(got(i) === want, s"ord $i")
    }
  }

  test("forward carry equals the serial suffix scan") {
    val got = PrefixCarry.exclusiveCarry(fixture, "ord", "payload",
        forward = true)
      .select(col("ord"), col("carry").getField("pv").as("c"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    (0L until 200L).foreach { i =>
      val want = ((i + 1) until 200L).find(_ % 7 == 0).map(_ * 10)
      assert(got(i) === want, s"ord $i")
    }
  }

  test("global rank equals the serial row_number, ties broken by the second key") {
    // many ties on the leading key — the rank must still be a total
    // order because the tie-break column completes it
    val df = (0L until 300L).map(i => (i % 7, i)).toDF("k", "id")
    val got = PrefixCarry.globalRank(df, Seq("k", "id"))
      .select("k", "id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val want = (0L until 300L).map(i => (i % 7, i)).sorted.zipWithIndex
      .map { case (p, i) => p -> (i + 1L) }.toMap
    assert(got === want)
  }

  test("exclusive prefix sum equals the serial cumsum") {
    val df = (0L until 500L).map(i => (i, i % 13)).toDF("ord", "v")
    val got = PrefixCarry.exclusivePrefixSum(df, "ord", "v")
      .select("ord", "prefix_sum").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    var acc = 0L
    (0L until 500L).foreach { i =>
      assert(got(i) === acc, s"ord $i")
      acc += i % 13
    }
  }

  test("all-null payloads carry nothing; original columns survive") {
    val df = (0L until 50L).map(i => (i, s"k$i")).toDF("ord", "tag")
      .withColumn("payload",
        when(lit(false), struct(col("ord"))))
    val out = PrefixCarry.exclusiveCarry(df, "ord", "payload")
    assert(out.columns.toSeq.sorted === Seq("carry", "ord", "payload", "tag"))
    assert(out.filter(col("carry").isNotNull).count() === 0)
    assert(out.count() === 50)
  }
}
