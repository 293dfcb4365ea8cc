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

  test("reorg guard refuses sink ahead of source") {
    IncrementalIngest.reorgGuard(sourceTip = 100L, sinkMax = 100L)
    intercept[IllegalArgumentException] {
      IncrementalIngest.reorgGuard(sourceTip = 100L, sinkMax = 101L)
    }
  }
}
