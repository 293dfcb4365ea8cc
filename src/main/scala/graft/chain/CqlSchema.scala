package graft.chain

import org.apache.spark.sql.types._

/** The exportable CQL contract: the reference keyspace DDL
  * (/root/reference/scripts/schema.cql:1-75) re-emitted from this
  * engine's declared schemas, so any drift between what we compute and
  * what the reference's store expects fails a test instead of surfacing
  * at export time. Each exported column records the ENGINE field it is
  * written from plus its narrowed CQL storage type (the engine keeps
  * analysis-friendly widths — bigint ids, epoch-second longs, hex
  * strings with binary siblings; the store narrows at the edge).
  */
object CqlSchema {

  /** One exported column: `engine` = the engine-side field name (empty
    * for export-time constants with no engine column, e.g. the fixed
    * `id` of summary_statistics), `cql` = the column name in the store,
    * `cqlType` = the CQL storage type. */
  case class Col(engine: String, cql: String, cqlType: String)

  /** A user-defined type of the keyspace, tied to the engine struct it
    * serializes. */
  case class Udt(name: String, cols: Seq[Col], spark: StructType)

  /** A table of the keyspace: `spark` is the declared engine schema the
    * export reads, `pk` the CQL primary-key clause (None = inline
    * `PRIMARY KEY` on the first column), `clusteringOrder` the optional
    * CLUSTERING ORDER BY clause body. */
  case class Table(name: String, spark: StructType, cols: Seq[Col],
      pk: Option[String], clusteringOrder: Option[String] = None)

  /** UDTs in keyspace declaration order (schema.cql:15-19, 43-49). */
  val udts: Seq[Udt] = Seq(
    Udt("tx_input_output", Seq(
      Col("address", "address", "list<text>"),
      Col("value", "value", "bigint"),
      Col("address_type", "address_type", "smallint")),
      Schemas.txInputOutput),
    Udt("tx_summary", Seq(
      Col("tx_id", "tx_id", "bigint"),
      Col("no_inputs", "no_inputs", "int"),
      Col("no_outputs", "no_outputs", "int"),
      Col("total_input", "total_input", "bigint"),
      Col("total_output", "total_output", "bigint")),
      Schemas.txSummary))

  /** The seven tables (schema.cql:6-75). */
  val tables: Seq[Table] = Seq(
    Table("block", Schemas.block, Seq(
      Col("block_id_group", "block_id_group", "int"),
      Col("block_id", "block_id", "int"),
      Col("block_hash", "block_hash", "blob"),
      Col("ts", "timestamp", "int"),
      Col("no_transactions", "no_transactions", "int")),
      Some("PRIMARY KEY(block_id_group, block_id)"),
      Some("block_id DESC")),
    Table("transaction", Schemas.transaction, Seq(
      Col("tx_id_group", "tx_id_group", "int"),
      Col("tx_id", "tx_id", "bigint"),
      Col("tx_hash", "tx_hash", "blob"),
      Col("block_id", "block_id", "int"),
      Col("ts", "timestamp", "int"),
      Col("coinbase", "coinbase", "boolean"),
      Col("total_input", "total_input", "bigint"),
      Col("total_output", "total_output", "bigint"),
      Col("inputs", "inputs", "list<FROZEN<tx_input_output>>"),
      Col("outputs", "outputs", "list<FROZEN<tx_input_output>>"),
      Col("coinjoin", "coinjoin", "boolean")),
      Some("PRIMARY KEY (tx_id_group, tx_id)")),
    Table("transaction_by_tx_prefix", Schemas.transactionByTxPrefix, Seq(
      Col("tx_prefix", "tx_prefix", "text"),
      Col("tx_hash_bin", "tx_hash", "blob"),
      Col("tx_id", "tx_id", "bigint")),
      Some("PRIMARY KEY (tx_prefix, tx_hash)")),
    Table("block_transactions", Schemas.blockTransactions, Seq(
      Col("block_id_group", "block_id_group", "int"),
      Col("block_id", "block_id", "int"),
      Col("txs", "txs", "list<FROZEN<tx_summary>>")),
      Some("PRIMARY KEY (block_id_group, block_id)"),
      Some("block_id DESC")),
    Table("exchange_rates", Schemas.exchangeRates, Seq(
      Col("date", "date", "text"),
      Col("fiat_values", "fiat_values", "map<text, float>")),
      pk = None),
    Table("summary_statistics", Schemas.summaryStatistics, Seq(
      Col("", "id", "text"),
      Col("no_blocks", "no_blocks", "int"),
      Col("no_txs", "no_txs", "bigint"),
      Col("ts", "timestamp", "int")),
      pk = None),
    Table("configuration", Schemas.configuration, Seq(
      Col("id", "id", "text"),
      Col("block_bucket_size", "block_bucket_size", "int"),
      Col("tx_prefix_length", "tx_prefix_length", "int"),
      Col("tx_bucket_size", "tx_bucket_size", "int")),
      pk = None))

  private def typeDdl(u: Udt): String =
    s"CREATE TYPE ${u.name} (\n" +
      u.cols.map(c => s"    ${c.cql} ${c.cqlType}").mkString(",\n") + "\n);"

  private def tableDdl(t: Table): String = {
    val colLines = t.cols.zipWithIndex.map { case (c, i) =>
      val inlinePk = if (t.pk.isEmpty && i == 0) " PRIMARY KEY" else ""
      s"    ${c.cql} ${c.cqlType}$inlinePk"
    }
    val lines = colLines ++ t.pk.map(p => s"    $p").toSeq
    s"CREATE TABLE ${t.name} (\n" + lines.mkString(",\n") + "\n)" +
      t.clusteringOrder.fold(";")(o => s" WITH CLUSTERING ORDER BY ($o);")
  }

  /** Statements in the reference file's declaration order: keyspace,
    * use, then each type immediately before its first consuming table. */
  def statements: Seq[String] = Seq(
    "CREATE KEYSPACE IF NOT EXISTS graphsense\n" +
      "    WITH replication = {'class': 'SimpleStrategy', " +
      "'replication_factor': 1};",
    "USE graphsense;",
    tableDdl(tables(0)),
    typeDdl(udts(0)),
    tableDdl(tables(1)),
    tableDdl(tables(2)),
    typeDdl(udts(1))) ++ tables.drop(3).map(tableDdl)

  /** The full keyspace DDL as one script. */
  def ddl: String = statements.mkString("\n\n") + "\n"
}
