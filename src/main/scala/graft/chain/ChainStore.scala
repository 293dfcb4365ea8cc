package graft.chain

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The sink side of the reference contract: partitioned, ordered,
  * idempotently-overwritable table storage (S5/ST3, schema.cql PK design).
  *
  * Cassandra's `(bucket, id)` primary keys become Hive-style partition
  * directories on the bucket column + `sortWithinPartitions` on the
  * clustering column — a point lookup prunes to one bucket directory and
  * one parquet row group (min/max stats on the sorted id column).
  *
  * Idempotence (the reference's INSERT-by-PK last-write-wins, ST3) is
  * dynamic partition overwrite: re-ingesting a block range rewrites only
  * the touched buckets, so replays converge to the same state.
  *
  * 100 TB partition math: tx buckets are 25k txs ≈ a few MB of scalars —
  * at full history (~1e9 txs) that is ~40k directories, fine for a real
  * metastore; the nested-io transaction table at ~1 KB/tx makes a bucket
  * ~25 MB ≈ one comfortable parquet row group per bucket.
  */
object ChainStore extends ChainSink {

  private def dynamicOverwrite(s: SparkSession): Unit =
    s.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

  /** transaction table: partition dirs by tx_id_group, rows ordered by
    * tx_id inside each bucket. */
  def writeTransactions(tx: DataFrame, out: String): Unit = {
    dynamicOverwrite(tx.sparkSession)
    tx.repartition(col("tx_id_group"))
      .sortWithinPartitions(col("tx_id"))
      .write.mode("overwrite")
      .partitionBy("tx_id_group")
      .parquet(s"$out/transaction")
  }

  /** Streaming-epoch variant of [[writeTransactions]]: partitions on
    * (tx_id_group, ingest_epoch) so successive micro-batches that touch
    * the SAME tx bucket stay additive — dynamic overwrite rewrites only
    * this epoch's sub-partitions, so replaying an epoch after a failure
    * is still idempotent, while other epochs' rows in a shared bucket
    * survive (a plain bucket-keyed overwrite would wipe them; at 100 TB
    * an epoch almost never covers whole buckets). Read the store back
    * through [[readTransactions]], which hides the epoch column. */
  def writeTransactionsEpoch(tx: DataFrame, out: String, epoch: Long): Unit = {
    dynamicOverwrite(tx.sparkSession)
    tx.withColumn("ingest_epoch", lit(epoch))
      .repartition(col("tx_id_group"))
      .sortWithinPartitions(col("tx_id"))
      .write.mode("overwrite")
      .partitionBy("tx_id_group", "ingest_epoch")
      .parquet(s"$out/transaction")
  }

  /** Transaction store reader that works against both layouts: the batch
    * bucket-only layout and the epoch-keyed streaming layout. */
  def readTransactions(s: SparkSession, out: String): DataFrame = {
    val df = s.read.parquet(s"$out/transaction")
    if (df.schema.fieldNames.contains("ingest_epoch")) df.drop("ingest_epoch")
    else df
  }

  /** Time-travel read of the epoch-keyed store: the table as it stood
    * after batch `epoch` landed. `ingest_epoch` is a PARTITION column,
    * so the as-of predicate prunes whole epoch directories at file
    * listing — a snapshot read costs the snapshot's size, never the
    * store's full history, and no data is ever rewritten to serve it
    * (the epoch layout IS the version log, the way a log-structured
    * table format keeps snapshots). */
  def readTransactionsAsOf(s: SparkSession, out: String,
      epoch: Long): DataFrame = {
    val df = s.read.parquet(s"$out/transaction")
    // layout check, not an afterthought: a compacted (or batch-written)
    // store has collapsed its epoch history — an as-of read against it
    // has no snapshot to serve, and must say so rather than surface a
    // generic unresolved-column error (or, worse, a full-table read if
    // a future refactor made the filter optional).
    require(df.schema.fieldNames.contains("ingest_epoch"),
      s"store at $out/transaction is not epoch-keyed (batch layout or " +
        "already compacted): its version history is gone, so a time-" +
        "travel read cannot be served. Read it with readTransactions, " +
        "or keep the epoch layout (skip compaction) where as-of reads " +
        "are needed.")
    // expired-snapshot guard: after a history vacuum the earliest
    // serveable snapshot is the fold epoch — a request below it would
    // silently return a partial table. The floor comes from the marker
    // [[vacuumTransactionsBelow]] records, NOT from the minimum epoch
    // present: a store whose epoch numbering simply starts above 0 has
    // never vacuumed anything, and an as-of read below its first epoch
    // is a valid (empty) snapshot, not an error.
    vacuumFloor(s, out).foreach { floor =>
      require(epoch >= floor,
        s"snapshot $epoch expired: history below epoch $floor was " +
          "vacuumed from the store — the oldest serveable snapshot is " +
          s"$floor")
    }
    df.filter(col("ingest_epoch") <= epoch)
      .drop("ingest_epoch")
  }

  private def vacuumFloorPath(out: String) =
    new org.apache.hadoop.fs.Path(s"$out/transaction_vacuum_floor")

  /** The recorded vacuum floor: the oldest epoch whose snapshot is
    * still serveable, None when the store has never been vacuumed.
    *
    * MIGRATION — stores vacuumed before the marker existed: such a
    * store has folded history but no marker, so the expired-snapshot
    * guard in [[readTransactionsAsOf]] is silently absent until its
    * next [[vacuumTransactionsBelow]] (which records the new floor
    * monotonically). The min epoch present CANNOT be auto-backfilled
    * as the floor — a never-vacuumed store whose epoch numbering
    * starts above 0 is indistinguishable from a folded one, and its
    * below-min as-of reads are valid empty snapshots, not errors. An
    * operator who KNOWS the store was vacuumed pre-upgrade runs
    * [[backfillVacuumFloor]] once as the migration step. */
  def vacuumFloor(s: SparkSession, out: String): Option[Long] = {
    val p = vacuumFloorPath(out)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8).trim.toLong)
      finally in.close()
    }
  }

  private def writeVacuumFloor(s: SparkSession, out: String,
      floor: Long): Unit = {
    val p = vacuumFloorPath(out)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    val o = fs.create(p, true)
    try o.write(floor.toString.getBytes(
      java.nio.charset.StandardCharsets.UTF_8))
    finally o.close()
  }

  /** Migration step for stores vacuumed BEFORE the floor marker
    * existed (see [[vacuumFloor]]'s scaladoc): records the observed
    * minimum ingest epoch as the floor, restoring the expired-snapshot
    * guard. Deliberately explicit — only the operator knows whether
    * the store's min epoch is a fold epoch (pre-marker vacuum) or just
    * a numbering that starts high (never vacuumed, below-min as-of
    * reads valid and empty) — and monotone: a marker already present
    * and higher is kept. No-op on an empty or batch-layout store. */
  def backfillVacuumFloor(s: SparkSession, out: String): Option[Long] = {
    val txPath = new org.apache.hadoop.fs.Path(s"$out/transaction")
    val fs = txPath.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(txPath)) return None
    val df = s.read.parquet(s"$out/transaction")
    if (!df.schema.fieldNames.contains("ingest_epoch")) None
    else {
      val r = df.agg(min(col("ingest_epoch").cast("long"))).head()
      if (r.isNullAt(0)) None
      else {
        val floor = math.max(r.getLong(0),
          vacuumFloor(s, out).getOrElse(Long.MinValue))
        writeVacuumFloor(s, out, floor)
        Some(floor)
      }
    }
  }

  /** Maintenance: compact a transaction store into the sealed batch
    * layout — epoch sub-partitions (and any small-file accumulation from
    * many micro-batches) collapse to one sorted file per bucket. A long-
    * running ingest at 100 TB accretes one file per (bucket, epoch);
    * reads stay correct but degrade with file count, so compaction is
    * the periodic maintenance step, exactly as Cassandra compacts the
    * reference keyspace's SSTables. Staged + swapped through the Hadoop
    * FileSystem API (never an in-place overwrite of a path being read);
    * a crash anywhere is recoverable: the next call restores the
    * swapped-out copy if the swap died between renames, and incomplete
    * staging is always discarded. Requires the ingest QUIESCED — a
    * changed partition listing between read and swap aborts before any
    * rename (a concurrent epoch would otherwise be dropped). The result
    * is the batch layout: "sealed" — `resumeGuard` refuses further
    * epoch ingest into it by design. */
  def compactTransactions(s: SparkSession, out: String): Unit =
    stagedRewrite(s, out) { (df, staged) =>
      df.drop("ingest_epoch")
        .repartition(col("tx_id_group"))
        .sortWithinPartitions(col("tx_id"))
        .write.mode("overwrite")
        .partitionBy("tx_id_group")
        .parquet(staged)
    }

  /** Maintenance: expire time-travel history below `floor` — every
    * epoch ≤ floor folds into epoch `floor` in one staged rewrite;
    * epochs above it are carried through intact. As-of reads for
    * e ≥ floor are unchanged (the fold performs exactly the union the
    * ≤-filter used to), snapshots below the floor are gone, and
    * [[readTransactionsAsOf]] refuses them loudly via its min-epoch
    * guard instead of serving a silently partial table. This is the
    * retention knob a long-running ingest needs: with compaction the
    * history is all-or-nothing, with vacuum it is a sliding window —
    * store cost O(retained epochs), not O(every epoch ever landed) —
    * and the store stays epoch-keyed, so ingest resume and future
    * vacuums keep working. */
  def vacuumTransactionsBelow(s: SparkSession, out: String,
      floor: Long): Unit = {
    // the floor marker is recorded BEFORE the rewrite and is monotone
    // (repeat vacuums never lower it): a crash mid-rewrite then refuses
    // below-floor reads conservatively — history may still be intact,
    // but a partial snapshot is never served
    require(s.read.parquet(s"$out/transaction").schema.fieldNames
        .contains("ingest_epoch"),
      s"store at $out/transaction is not epoch-keyed: nothing to vacuum")
    val recorded = math.max(vacuumFloor(s, out).getOrElse(Long.MinValue),
      floor)
    writeVacuumFloor(s, out, recorded)
    stagedRewrite(s, out) { (df, staged) =>
      require(df.schema.fieldNames.contains("ingest_epoch"),
        s"store at $out/transaction is not epoch-keyed: nothing to vacuum")
      df.withColumn("ingest_epoch",
          greatest(col("ingest_epoch").cast("long"), lit(floor)))
        .repartition(col("tx_id_group"))
        .sortWithinPartitions(col("tx_id"))
        .write.mode("overwrite")
        .partitionBy("tx_id_group", "ingest_epoch")
        .parquet(staged)
    }
  }

  /** Shared staged-swap protocol for store maintenance (compaction and
    * history vacuum): read the live table, rewrite through `rewrite`
    * into a staging dir, then swap via two renames. Crash-safe BEFORE
    * any destructive step — a crash between the renames leaves `old`
    * holding the only copy, restored on the next call; leftover staged
    * dirs are always incomplete work and discarded. Requires the
    * ingest QUIESCED: a changed partition listing between read and
    * swap aborts before any rename (a concurrent epoch would otherwise
    * be dropped silently). */
  private def stagedRewrite(s: SparkSession, out: String)(
      rewrite: (DataFrame, String) => Unit): Unit = {
    val root = new org.apache.hadoop.fs.Path(out)
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    val live = new org.apache.hadoop.fs.Path(root, "transaction")
    val staged = new org.apache.hadoop.fs.Path(root, "transaction__compacting")
    val old = new org.apache.hadoop.fs.Path(root, "transaction__old")
    if (!fs.exists(live)) {
      require(fs.exists(old),
        s"store rewrite: no store at $live and no $old to recover from")
      require(fs.rename(old, live), s"store rewrite: cannot recover $old")
    }
    fs.delete(staged, true); fs.delete(old, true)
    def snapshot(): Set[String] =
      fs.globStatus(new org.apache.hadoop.fs.Path(live, "*/*"))
        .map(_.getPath.toString).toSet
    val seen = snapshot()
    rewrite(s.read.parquet(live.toString), staged.toString)
    require(snapshot() == seen,
      s"store rewrite: store at $live changed while rewriting — quiesce " +
        "the ingest and re-run (nothing was swapped; staged output kept " +
        s"at $staged until the next run)")
    require(fs.rename(live, old), s"store rewrite: cannot stage out $live")
    require(fs.rename(staged, live), s"store rewrite: cannot swap in $staged")
    fs.delete(old, true)
    ()
  }

  /** block table: clustering ORDER BY (block_id DESC) of schema.cql:13 →
    * descending sort inside each bucket. */
  def writeBlocks(blocks: DataFrame, out: String): Unit = {
    dynamicOverwrite(blocks.sparkSession)
    blocks.repartition(col("block_id_group"))
      .sortWithinPartitions(col("block_id").desc)
      .write.mode("overwrite")
      .partitionBy("block_id_group")
      .parquet(s"$out/block")
  }

  /** hash→id index: the reference fans out to 16^5 prefix partitions
    * (schema.cql:36-41); as directories that would be 1M tiny dirs, so we
    * bucket dirs on the first 2 hex chars (256 dirs) and keep the full
    * 5-char prefix as a sorted column — same pruning, saner file counts. */
  def writePrefixIndex(tx: DataFrame, out: String): Unit = {
    dynamicOverwrite(tx.sparkSession)
    tx.select(
      substring(col("tx_hash"), 1, 2).as("p2"),
      substring(col("tx_hash"), 1, Chain.PrefixLen).as("tx_prefix"),
      col("tx_hash"),
      // storage-fidelity blob form (schema.cql:38): 32 bytes vs 64 hex
      // chars — halves the hash storage at 100 TB
      unhex(col("tx_hash")).as("tx_hash_bin"),
      col("tx_id"))
      .repartition(col("p2"))
      .sortWithinPartitions(col("tx_prefix"), col("tx_hash"))
      .write.mode("overwrite")
      .partitionBy("p2")
      .parquet(s"$out/transaction_by_tx_prefix")
  }

  /** block_transactions table: same layout as block (bucketed dirs,
    * block_id DESC inside, schema.cql:51-56). */
  def writeBlockTransactions(bt: DataFrame, out: String): Unit = {
    dynamicOverwrite(bt.sparkSession)
    bt.repartition(col("block_id_group"))
      .sortWithinPartitions(col("block_id").desc)
      .write.mode("overwrite")
      .partitionBy("block_id_group")
      .parquet(s"$out/block_transactions")
  }

  /** exchange_rates: one row per day — a single file regardless of
    * history length (a century is ~37k rows). */
  def writeExchangeRates(rates: DataFrame, out: String): Unit =
    rates.coalesce(1).write.mode("overwrite")
      .parquet(s"$out/exchange_rates")

  /** summary_statistics: the 1-row keyspace summary. */
  def writeSummaryStatistics(stats: DataFrame, out: String): Unit =
    stats.coalesce(1).write.mode("overwrite")
      .parquet(s"$out/summary_statistics")

  /** configuration: the 1-row bucket/prefix parameter record. */
  def writeConfiguration(conf: DataFrame, out: String): Unit =
    conf.coalesce(1).write.mode("overwrite")
      .parquet(s"$out/configuration")

  /** Point lookup by full hash: prunes to one p2 directory, row-group
    * skips on the sorted tx_prefix column, final equality on the binary
    * hash (F1's unhex direction in the lookup path). Indexes written
    * before the binary column existed fall back to hex-string equality —
    * same pruning, same result, 2× the hash-column bytes scanned. */
  def lookupByHash(s: SparkSession, out: String, hashHex: String): DataFrame = {
    val idx = s.read.parquet(s"$out/transaction_by_tx_prefix")
    val finalEq =
      if (idx.schema.fieldNames.contains("tx_hash_bin"))
        col("tx_hash_bin") === unhex(lit(hashHex))
      else col("tx_hash") === lit(hashHex)
    idx.filter(col("p2") === hashHex.substring(0, 2) &&
      col("tx_prefix") === hashHex.substring(0, Chain.PrefixLen) && finalEq)
  }

  /** Point lookup by tx id: partition-pruned on the bucket column. */
  def lookupByTxId(s: SparkSession, out: String, txId: Long): DataFrame =
    s.read.parquet(s"$out/transaction")
      .filter(col("tx_id_group") === txId / Chain.TxBucketSize &&
        col("tx_id") === txId)

  /** Multi-chain keyspace: one currency partition per chain (the
    * reference's keyspace-per-coin, §2.7), unioned with a `currency`
    * column so cross-chain queries are a partition-pruned scan. */
  def writeMultiChain(chains: Map[String, DataFrame], out: String): Unit = {
    val tagged = chains.map { case (cur, df) =>
      df.withColumn("currency", lit(cur))
    }.reduce(_ unionByName _)
    dynamicOverwrite(tagged.sparkSession)
    tagged.repartition(col("currency"), col("tx_id_group"))
      .sortWithinPartitions(col("tx_id"))
      .write.mode("overwrite")
      .partitionBy("currency", "tx_id_group")
      .parquet(s"$out/multichain_transaction")
  }

  /** Spark-bucketed (CLUSTERED BY) tables for co-located joins: both
    * sides bucketed on the join key join WITHOUT a shuffle — the
    * pre-partitioning strategy for repeated large-fact joins at 100 TB.
    * Requires saveAsTable (bucket metadata lives in the catalog);
    * `path` makes the table external at an explicit location (keeps
    * data under target/ instead of the session warehouse). */
  def writeBucketed(df: DataFrame, tableName: String, key: String,
      nBuckets: Int, path: Option[String] = None): Unit = {
    val w = df.write.mode("overwrite")
      .bucketBy(nBuckets, key)
      .sortBy(key)
      .format("parquet")
    path.fold(w)(p => w.option("path", p)).saveAsTable(tableName)
  }
}
