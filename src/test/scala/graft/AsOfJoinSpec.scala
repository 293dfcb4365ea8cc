package graft

import org.apache.spark.sql.functions.floor

import graft.plans.AsOfJoin

/** Edge semantics of the custom as-of operator: boundary equality joins,
  * pre-first-right rows get nulls, right rows never skip. */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("as-of picks latest right <= left, nulls before first right") {
    val left = Seq(5L, 10L, 15L, 20L, 100L).toDF("t")
    val right = Seq((10L, "a"), (15L, "b"), (30L, "c")).toDF("rt", "v")
    val got = AsOfJoin.asof(left, right, "t", "rt")
      .orderBy("t")
      .select("t", "rt", "v")
      .as[(Long, Option[Long], Option[String])].collect().toSeq
    assert(got === Seq(
      (5L, None, None),            // before any right row
      (10L, Some(10L), Some("a")), // boundary: <= includes equality
      (15L, Some(15L), Some("b")),
      (20L, Some(15L), Some("b")), // holds last rate
      (100L, Some(30L), Some("c"))))
  }

  test("empty right side yields all-null right columns") {
    val left = Seq(1L, 2L).toDF("t")
    val right = Seq.empty[(Long, String)].toDF("rt", "v")
    val got = AsOfJoin.asof(left, right, "t", "rt")
    assert(got.count() === 2)
    assert(got.filter($"rt".isNull && $"v".isNull).count() === 2)
  }

  test("custom rule pushes LIMIT below the join's left side") {
    val left = spark.range(0, 1000).select($"id".as("t"))
    val right = Seq((10L, "a")).toDF("rt", "v")
    val limited = AsOfJoin.asof(left, right, "t", "rt").limit(3)
    assert(limited.count() === 3)
    val opt = limited.queryExecution.optimizedPlan.toString
    // the LocalLimit must appear under AsOfJoin, not only above it
    val joinIdx = opt.indexOf("AsOfJoin")
    assert(joinIdx >= 0 &&
      opt.indexOf("LocalLimit", joinIdx) > joinIdx,
      s"limit not pushed:\n$opt")
  }

  test("multi-partition left: no SinglePartition exchange, parallel merge") {
    // 8-partition fact side × sparse rate side; rt = id*100, v = id%7 →
    // the as-of match for any t is floor(t/100), so v must be (t/100)%7
    val left = spark.range(0, 100000, 1, 8).select($"id".as("t"))
    val right = spark.range(0, 1000)
      .select(($"id" * 100).as("rt"), ($"id" % 7).as("v"))
    val df = AsOfJoin.asof(left, right, "t", "rt")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      s"single-partition funnel in plan:\n$plan")
    assert(df.rdd.getNumPartitions > 1, "merge ran in one partition")
    val mismatches = df
      .filter($"v" =!= floor($"t" / 100) % 7 || $"rt" =!= floor($"t" / 100) * 100)
      .count()
    assert(mismatches === 0)
    assert(df.count() === 100000)
    // regression: a downstream coalesce computes many ranges in ONE task;
    // the per-range carry must key off the range index, not the task id
    val coalesced = AsOfJoin.asof(left, right, "t", "rt").coalesce(1)
    assert(coalesced.filter($"rt".isNull).count() === 0)
  }

  test("duplicate right timestamps: the last in order wins") {
    val left = Seq(10L).toDF("t")
    val right = Seq((5L, "x"), (5L, "y")).toDF("rt", "v")
    val got = AsOfJoin.asof(left, right, "t", "rt")
      .select("v").as[String].collect().toSeq
    // merge consumes all right rows <= t; with equal keys the last kept
    // is whichever sorts last — assert a single deterministic row
    assert(got.length === 1 && Set("x", "y").contains(got.head))
  }
}
