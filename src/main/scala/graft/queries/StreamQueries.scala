package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.chain.ChainSql
import graft.chain.ChainSql.withCtes
import graft.streaming.IncrementalIngest

/** Streaming-backed queries: the incremental "--continue" ingest run as a
  * synchronous `Trigger.AvailableNow` Structured Streaming job whose
  * result must agree with the equivalent batch SQL (the oracle). */
object StreamQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Simulated sink watermark (blocks ≤ this are "already ingested"). */
  private val Watermark = 2300L

  val queries: Map[String, Q] = Map(
    "stream_incremental" -> ((s, dir) =>
      IncrementalIngest.newTxsBeyond(s, dir, Watermark)
        .groupBy(col("block_id"))
        .agg(count(lit(1)).as("n_txs"), max(col("tx_id")).as("max_tx_id"))))

  val oracles: Map[String, String] = Map(
    "stream_incremental" -> withCtes(ChainSql.tx)(
      s"""SELECT block_id, CAST(count(*) AS BIGINT) AS n_txs,
         |  max(tx_id) AS max_tx_id
         |FROM tx WHERE block_id > $Watermark
         |GROUP BY block_id""".stripMargin))
}
