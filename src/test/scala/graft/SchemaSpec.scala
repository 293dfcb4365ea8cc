package graft

import graft.chain.Schemas

/** Derived outputs must conform to the declared seven-table contract
  * (SURVEY.md §1.3 / schema.cql). */
class SchemaSpec extends SparkSpec {

  private def schemaOf(name: String) =
    SparkEntry.queries(name)(spark, sf("sf0.001")).schema

  test("block table matches declared schema") {
    assert(Schemas.conforms(schemaOf("block_table"), Schemas.block))
  }

  test("nested transaction table matches declared schema") {
    assert(Schemas.conforms(schemaOf("transaction_table"), Schemas.transaction))
  }

  test("prefix index matches declared schema (blob hash storage)") {
    import org.apache.spark.sql.functions._
    import graft.chain.Chain
    val idx = Chain.withBinaryHash(Chain.transactions(spark, sf("sf0.001")))
      .select(
        substring(col("tx_hash"), 1, Chain.PrefixLen).as("tx_prefix"),
        col("tx_hash"), col("tx_hash_bin"), col("tx_id"))
    assert(Schemas.conforms(idx.schema, Schemas.transactionByTxPrefix))
    assert(idx.schema("tx_hash_bin").dataType ==
      org.apache.spark.sql.types.BinaryType)
  }

  test("exchange_rates map table matches declared schema") {
    assert(Schemas.conforms(schemaOf("exchange_rates_table"),
      Schemas.exchangeRates))
  }

  test("summary_statistics and configuration match declared schemas") {
    assert(Schemas.conforms(schemaOf("summary_statistics"),
      Schemas.summaryStatistics))
    assert(Schemas.conforms(schemaOf("configuration"), Schemas.configuration))
  }
}
