package graft.chain

import org.apache.spark.sql.SparkSession

/** SQL surface: registers the derived chain tables as temp views so the
  * whole data model is queryable through `spark.sql` — the engine's
  * analog of the reference's DDL bootstrap (S7, create_keyspace.py:55-70).
  * View names carry a keyspace-style prefix; multi-chain deployments
  * register one prefix per currency (the keyspace-per-coin pattern).
  */
object GraftCatalog {

  val DefaultPrefix = "gs"

  /** Register all seven contract tables (and the io rows) as temp views. */
  def register(s: SparkSession, dir: String,
      prefix: String = DefaultPrefix): Unit = {
    Chain.transactions(s, dir).createOrReplaceTempView(s"${prefix}_tx")
    Chain.io(s, dir).createOrReplaceTempView(s"${prefix}_io")
    Chain.blocks(s, dir).createOrReplaceTempView(s"${prefix}_block")
    Chain.rates(s, dir).createOrReplaceTempView(s"${prefix}_exchange_rates")
    Chain.txIoStats(s, dir).createOrReplaceTempView(s"${prefix}_tx_io_stats")
    // the typed nested face — the SQL surface exposes the contract
    // ArrayType(StructType) shape, not the hasher-friendly serialization
    graft.queries.RefQueries.transactionTable(s, dir)
      .createOrReplaceTempView(s"${prefix}_transaction")
    graft.queries.RefQueries.queries("tx_by_prefix")(s, dir)
      .createOrReplaceTempView(s"${prefix}_transaction_by_tx_prefix")
    graft.queries.RefQueries.queries("summary_statistics")(s, dir)
      .createOrReplaceTempView(s"${prefix}_summary_statistics")
    graft.queries.RefQueries.queries("configuration")(s, dir)
      .createOrReplaceTempView(s"${prefix}_configuration")
    graft.functions.VectorFunctions.register(s)
  }
}
