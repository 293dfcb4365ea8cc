package graft

/** Typed row models for the chain tables — the `Dataset[T]` face of the
  * same frames [[graft.chain.Chain]] derives (field names/types match the
  * DataFrame columns exactly, so `.as[T]` is a zero-copy encoder bind,
  * not a conversion). Use these where compile-time field safety matters
  * (library consumers composing their own logic); the `DataFrame`
  * surface stays primary for dynamic-schema work. All scalars are the
  * oracle-facing BIGINT/string shapes, so a typed pipeline and a SQL
  * pipeline agree bit-for-bit.
  */
object model {
  /** One transaction scalar row (schema.cql:21-34 shape). */
  final case class Tx(tx_id: Long, tx_hash: String, block_id: Long,
      ts: Long, tx_id_group: Long)

  /** Per-block summary (schema.cql:6-13 shape). */
  final case class BlockSummary(block_id: Long, no_transactions: Long,
      ts: Long, block_id_group: Long, block_hash: String)

  /** One io row; `addresses` is null for the reference's null-list
    * address types (nonstandard/nulldata/witness_unknown). */
  final case class IoEntry(tx_id: Long, idx: Long, is_input: Boolean,
      value: Long, address_type: Long, base_addr: String,
      alt_addr: String, addresses: Seq[String])
}
