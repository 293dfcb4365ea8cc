package graft

import org.apache.spark.sql.functions._

import graft.chain.Chain
import graft.streaming.IncrementalIngest

/** Streaming incremental ingest must agree with the batch path (ST2) and
  * the reorg guard must hold (ST4). */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("stream AvailableNow equals batch filter above watermark") {
    val dir = sf("sf0.001")
    val wm = 1500L
    val streamed = IncrementalIngest.newTxsBeyond(spark, dir, wm)
    val batch = Chain.transactions(spark, dir).filter(col("block_id") > wm)
    assert(streamed.count() === batch.count())
    assert(streamed.agg(sum("tx_id")).as[Long].head() ===
      batch.agg(sum("tx_id")).as[Long].head())
  }

  test("watermarked windowed stream agg equals batch hourly counts") {
    val dir = sf("sf0.001")
    val streamed = IncrementalIngest.hourlyEventCounts(spark, dir)
    val batch = SparkEntry.queries("events_window_agg")(spark, dir)
      .select("hour_ts", "event_type", "n_events")
    assert(streamed.count() === batch.count())
    assert(streamed.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(streamed).count() === 0)
  }

  test("foreachBatch bucket sink is exactly-once under replay") {
    val dir = sf("sf0.001")
    val out = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "ing_").toString
    val wm = 2000L
    IncrementalIngest.ingestToStore(spark, dir, out, wm)
    val once = spark.read.parquet(s"$out/transaction")
    val expect = Chain.transactions(spark, dir).filter(col("block_id") > wm)
    assert(once.count() === expect.count())
    // replay the whole ingest (fresh checkpoint = worst-case full redo):
    // dynamic bucket overwrite must converge to the identical state
    IncrementalIngest.ingestToStore(spark, dir, out, wm)
    val twice = spark.read.parquet(s"$out/transaction")
    assert(twice.count() === expect.count())
    assert(twice.agg(sum("tx_id")).as[Long].head() ===
      expect.agg(sum("tx_id")).as[Long].head())
  }

  test("reorg guard refuses sink ahead of source") {
    IncrementalIngest.reorgGuard(sourceTip = 100L, sinkMax = 100L)
    intercept[IllegalArgumentException] {
      IncrementalIngest.reorgGuard(sourceTip = 100L, sinkMax = 101L)
    }
  }
}
