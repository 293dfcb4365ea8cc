package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.chain.{Chain, ChainStore}

/** Sink-layer contract: roundtrip, idempotent re-write (ST3), pruned
  * point lookups. */
class StoreSpec extends SparkSpec {
  import spark.implicits._

  private lazy val out =
    Files.createTempDirectory(java.nio.file.Paths.get("target"), "store_")
      .toString

  test("transaction write/read roundtrip + idempotent overwrite") {
    val dir = sf("sf0.001")
    val tx = Chain.transactions(spark, dir)
    ChainStore.writeTransactions(tx, out)
    val once = spark.read.parquet(s"$out/transaction")
    assert(once.count() === tx.count())
    // re-ingesting the same range must converge (last-write-wins analog)
    ChainStore.writeTransactions(tx, out)
    val twice = spark.read.parquet(s"$out/transaction")
    assert(twice.count() === tx.count())
    assert(twice.select(sum("tx_id")).as[Long].head() ===
      tx.select(sum("tx_id")).as[Long].head())
  }

  test("point lookup by tx id prunes to one bucket") {
    val lookup = ChainStore.lookupByTxId(spark, out, 7L)
    assert(lookup.count() === 1)
    val plan = lookup.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") ||
      plan.contains("tx_id_group"), s"no partition pruning in:\n$plan")
  }

  test("hash prefix index lookup returns exactly the target") {
    val dir = sf("sf0.001")
    val tx = Chain.transactions(spark, dir)
    ChainStore.writePrefixIndex(tx, out)
    val h = tx.filter(col("tx_id") === 42L).select("tx_hash").as[String].head()
    val got = ChainStore.lookupByHash(spark, out, h)
    assert(got.select("tx_id").as[Long].collect().toSeq === Seq(42L))
  }
}
