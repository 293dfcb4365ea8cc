package graft.chain

import org.apache.spark.sql.types._

/** Declared target schemas — the seven-table contract of the reference
  * keyspace (scripts/schema.cql:1-75, SURVEY.md §1.3), as explicit
  * StructTypes plus the two UDTs as case classes (Encoders.product gives
  * the identical struct shape). Satoshi values stay LongType; timestamps
  * are epoch-second longs (`ts`), converted only at presentation edges.
  */
object Schemas {

  /** UDT tx_input_output (schema.cql:15-19). */
  case class TxInputOutput(address: Seq[String], value: Long,
      address_type: Long)

  /** UDT tx_summary (schema.cql:43-49). */
  case class TxSummary(tx_id: Long, no_inputs: Long, no_outputs: Long,
      total_input: Long, total_output: Long)

  val txInputOutput: StructType = StructType(Seq(
    StructField("address", ArrayType(StringType)),
    StructField("value", LongType),
    StructField("address_type", LongType)))

  val txSummary: StructType = StructType(Seq(
    StructField("tx_id", LongType),
    StructField("no_inputs", LongType),
    StructField("no_outputs", LongType),
    StructField("total_input", LongType),
    StructField("total_output", LongType)))

  /** block_transactions (schema.cql:51-56): the per-block ordered
    * tx_summary list. The oracle-checked projection carries the ordered
    * tx ids as a joined string (hashable by the driver); this is the
    * full contract shape the export writes. */
  val blockTransactions: StructType = StructType(Seq(
    StructField("block_id_group", LongType, nullable = false),
    StructField("block_id", LongType, nullable = false),
    StructField("txs", ArrayType(txSummary))))

  /** block (schema.cql:6-13). */
  val block: StructType = StructType(Seq(
    StructField("block_id_group", LongType, nullable = false),
    StructField("block_id", LongType, nullable = false),
    StructField("block_hash", StringType),
    StructField("ts", LongType),
    StructField("no_transactions", LongType)))

  /** transaction (schema.cql:21-34). */
  val transaction: StructType = StructType(Seq(
    StructField("tx_id_group", LongType, nullable = false),
    StructField("tx_id", LongType, nullable = false),
    StructField("tx_hash", StringType),
    StructField("block_id", LongType),
    StructField("ts", LongType),
    StructField("coinbase", BooleanType),
    StructField("total_input", LongType),
    StructField("total_output", LongType),
    StructField("inputs", ArrayType(txInputOutput)),
    StructField("outputs", ArrayType(txInputOutput)),
    StructField("coinjoin", BooleanType)))

  /** transaction_by_tx_prefix (schema.cql:36-41). The reference keys the
    * table on a text prefix but stores the full hash as `blob`
    * (schema.cql:38): `tx_hash_bin` carries that storage-fidelity binary
    * form, `tx_hash` the hex presentation. */
  val transactionByTxPrefix: StructType = StructType(Seq(
    StructField("tx_prefix", StringType, nullable = false),
    StructField("tx_hash", StringType, nullable = false),
    StructField("tx_hash_bin", BinaryType),
    StructField("tx_id", LongType)))

  /** exchange_rates (schema.cql:58-61). */
  val exchangeRates: StructType = StructType(Seq(
    StructField("date", StringType, nullable = false),
    StructField("fiat_values", MapType(StringType, FloatType))))

  /** summary_statistics (schema.cql:63-68). */
  val summaryStatistics: StructType = StructType(Seq(
    StructField("no_blocks", LongType),
    StructField("no_txs", LongType),
    StructField("ts", LongType)))

  /** configuration (schema.cql:70-75). */
  val configuration: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("block_bucket_size", LongType),
    StructField("tx_prefix_length", LongType),
    StructField("tx_bucket_size", LongType)))

  /** Compare names+types, ignoring nullability (parquet roundtrips relax
    * it) and struct-field nullability depth. */
  def conforms(actual: StructType, declared: StructType): Boolean = {
    def norm(dt: DataType): DataType = dt match {
      case s: StructType =>
        StructType(s.fields.map(f => f.copy(dataType = norm(f.dataType),
          nullable = true)))
      case a: ArrayType => a.copy(elementType = norm(a.elementType),
        containsNull = true)
      case m: MapType => m.copy(valueType = norm(m.valueType),
        valueContainsNull = true)
      case other => other
    }
    norm(StructType(actual.fields.map(_.copy(nullable = true)))) ==
      norm(StructType(declared.fields.map(_.copy(nullable = true))))
  }
}
