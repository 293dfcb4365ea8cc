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

  test("prefix index matches declared schema") {
    assert(Schemas.conforms(schemaOf("tx_by_prefix"),
      Schemas.transactionByTxPrefix))
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
