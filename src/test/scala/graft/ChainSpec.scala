package graft

import org.apache.spark.sql.functions._
import graft.chain.Chain

/** Unit tests for the chain data model against hand-built micro-frames
  * (FIXTURES.md §3): bucket boundaries, address-type dispatch, coinbase,
  * last-write-wins dedup. */
class ChainSpec extends SparkSpec {
  import spark.implicits._

  test("bucket math at boundaries (tx 25k, block 100)") {
    val ids = Seq(0L, 99L, 100L, 24999L, 25000L, 49999L, 50000L).toDF("id")
    val got = ids
      .withColumn("txg", floor(col("id") / Chain.TxBucketSize))
      .withColumn("blkg", floor(col("id") / Chain.BlockBucketSize))
      .orderBy("id").as[(Long, Long, Long)].collect()
    assert(got === Seq(
      (0L, 0L, 0L), (99L, 0L, 0L), (100L, 0L, 1L), (24999L, 0L, 249L),
      (25000L, 1L, 250L), (49999L, 1L, 499L), (50000L, 2L, 500L)))
  }

  test("address-type dispatch: multisig lists, null types, singleton") {
    // reference addr_str: multisig → all addresses; nonstandard/nulldata/
    // witness_unknown → NULL; else singleton (blocksci_export.py:318-329)
    val rows = (1 to 10).map(t => (t.toLong, "base", "alt")).toDF(
      "address_type", "base_addr", "alt_addr")
    val got = rows.withColumn("addresses",
      when(col("address_type") === 6, array(col("base_addr"), col("alt_addr")))
        .when(col("address_type").isin(Chain.NullAddressTypes.map(_.toLong): _*),
          lit(null).cast("array<string>"))
        .otherwise(array(col("base_addr"))))
      .orderBy("address_type")
      .select("addresses").as[Option[Seq[String]]].collect()
    assert(got(0).isEmpty)                       // 1 nonstandard
    assert(got(5).contains(Seq("base", "alt")))  // 6 multisig
    assert(got(6).isEmpty)                       // 7 nulldata
    assert(got(9).isEmpty)                       // 10 witness_unknown
    assert(got(1).contains(Seq("base")))         // 2 pubkey
    assert(Chain.AddressTypes.size === 10 &&
      Chain.AddressTypes(3) === "pubkeyhash")
  }

  test("coinbase = first tx of each block") {
    val tx = Seq((10L, 1L), (11L, 1L), (20L, 2L)).toDF("tx_id", "block_id")
    val got = Chain.withCoinbase(tx).orderBy("tx_id")
      .select("tx_id", "coinbase").as[(Long, Boolean)].collect()
    assert(got === Seq((10L, true), (11L, false), (20L, true)))
  }

  test("BIP30 dedup keeps the highest tx_id per duplicated hash") {
    import org.apache.spark.sql.expressions.Window
    // the reference's two known duplicate pairs (blocksci_export.py:471-472)
    val rows = Seq(
      ("e3bf3d07", 142841L), ("e3bf3d07", 91842L),
      ("d5d27987", 142783L), ("d5d27987", 91812L),
      ("unique00", 7L)).toDF("tx_hash", "tx_id")
    val w = Window.partitionBy(col("tx_hash")).orderBy(col("tx_id").desc)
    val got = rows.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).select("tx_hash", "tx_id")
      .as[(String, Long)].collect().toMap
    assert(got === Map(
      "e3bf3d07" -> 142841L, "d5d27987" -> 142783L, "unique00" -> 7L))
  }

  test("derived tables are consistent at sf0.001") {
    val dir = sf("sf0.001")
    val tx = Chain.transactions(spark, dir)
    val blk = Chain.blocks(spark, dir)
    // summary invariant: block tx counts cover all txs exactly once
    val nTx = tx.count()
    val sumCounts = blk.agg(sum("no_transactions")).as[Long].head()
    assert(nTx === sumCounts)
    // every tx's block exists
    assert(tx.join(blk, Seq("block_id"), "left_anti").count() === 0)
  }
}
