package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.ops.DedupMaterialize

/** Streaming corpus ingest with LSH dedup at the door: arriving
  * documents are minhash-banded per micro-batch and probed against the
  * PARKED band tier ([[graft.api.Dedup.probePairs]]); only docs that
  * collide with no tier bucket land. This is the batch
  * `dedup_incremental` operator run as a continuous fact — the tier is
  * the index, each epoch costs batch × bucket work, and the corpus
  * stays deduplicated as it grows without ever re-touching old×old.
  *
  * Same production sink shape as [[IncrementalIngest]]: foreachBatch →
  * epoch-partitioned dynamic overwrite, so epoch replays are idempotent
  * and no memory sink or driver collect appears anywhere.
  */
object CorpusIngest {

  /** The simulated arriving batch (lockstep with the parked tiers). */
  private val BatchMod = DedupMaterialize.IncrementalBatchMod

  /** Batch rule for the streaming all-pairs maintenance — a SMALLER
    * modulus than the house 97, chosen so the fixture's arriving docs
    * actually carry qualifying pairs (the %97 slice of sf0.01 touches
    * none, which would leave the streamed path unexercised by the
    * oracle). */
  val AllPairsBatchMod = 13

  /** Run the deduped ingest over `dir`'s documents with AvailableNow
    * (catch-up semantics); kept doc ids land under `out` partitioned by
    * ingest epoch. */
  def dedupedCorpusIngest(s: SparkSession, dir: String, out: String,
      checkpoint: Option[String] = None): Unit = {
    val schema = s.read.parquet(s"$dir/documents.parquet").schema
    val stream = s.readStream.schema(schema)
      .parquet(s"$dir/documents*.parquet")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    // the dup-injected corpus view of the stream (same rows the batch
    // queries see), restricted to the arriving batch
    val corpusStream = stream.unionByName(
      stream.filter(col("doc_id") % 50 === 0)
        .select((col("doc_id") + graft.ops.TextCorpus.DupOffset)
          .as("doc_id"), col("text")))
      .filter(col("doc_id") % BatchMod === 0)
    // static probe side: the parked band tier EXCLUDING the batch — the
    // index a deployed pipeline holds from its previous ingests
    val tierBands = DedupMaterialize.bandTable(s, dir)
      .filter(col("doc_id") % BatchMod =!= 0)
    val name = s"cd_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val ckpt = checkpoint.getOrElse(s"target/tmp/ckpt_$name")
    val q = corpusStream.writeStream
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
         epoch: Long) =>
          val b = batch.toDF()
          val bands = graft.api.Dedup.lshBands(
            graft.api.Dedup.minhashSignatures(
              graft.ops.TextCorpus.shingles(
                graft.ops.TextCorpus.words(b))))
          val dupIds = graft.api.Dedup.probePairs(bands, tierBands)
            .select(col("new_id").as("doc_id")).distinct()
          val kept = b.select(col("doc_id"))
            .join(dupIds, Seq("doc_id"), "left_anti")
            .withColumn("ingest_epoch", lit(epoch))
          // conf on the BATCH frame's (cloned) session — see
          // heavyHitterIngest below; the outer session's conf never
          // reaches a foreachBatch write
          kept.sparkSession.conf.set(
            "spark.sql.sources.partitionOverwriteMode", "dynamic")
          kept.write.mode("overwrite").partitionBy("ingest_epoch")
            .parquet(out)
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    try { q.processAllAvailable() } finally { q.stop() }
  }

  /** Kept doc ids from the landed store. */
  def readKept(s: SparkSession, out: String): DataFrame =
    s.read.parquet(out).select(col("doc_id"))

  /** Continuously-maintained EXACT similarity pairs (the streaming twin
    * of text_allpairs_cosine_incremental): each arriving micro-batch
    * ranks its shingles under the FROZEN bootstrap order, probes the
    * parked pre-batch prefix tier ∪ everything previously landed ∪
    * itself, and lands its qualifying pairs plus its own prefix rows
    * and postings — all epoch-keyed dynamic overwrites, so replays are
    * idempotent and pairs between docs of DIFFERENT micro-batches are
    * generated exactly once (by the later batch, whose probe sees the
    * earlier one's landed prefix marked old). The frozen order is
    * correct forever — the prefix/positional lemmas need a shared
    * total order, not current frequencies; staleness only degrades the
    * rarity heuristic's candidate counts, never results. After any
    * run, parked base ∪ landed pairs equals the one-shot join over the
    * whole corpus (stream == batch, proven by the shared brute-force
    * oracle). */
  def allPairsIngest(s: SparkSession, dir: String, out: String,
      checkpoint: Option[String] = None): Unit = {
    val schema = s.read.parquet(s"$dir/documents.parquet").schema
    val stream = s.readStream.schema(schema)
      .parquet(s"$dir/documents*.parquet")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
      .filter(col("doc_id") % AllPairsBatchMod === 0)
    val name = s"ap_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val ckpt = checkpoint.getOrElse(s"target/tmp/ckpt_$name")
    val q = stream.writeStream
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
         epoch: Long) =>
          applyAllPairsBatch(s, dir, out, batch.toDF(), epoch)
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    try { q.processAllAvailable() } finally { q.stop() }
  }

  /** One micro-batch of [[allPairsIngest]], factored out so the spec
    * can drive multi-batch scenarios directly (the fixture is one
    * file, so AvailableNow lands a single epoch). */
  def applyAllPairsBatch(s: SparkSession, dir: String, out: String,
      batch: DataFrame, epoch: Long): Unit = {
    import graft.api.Text
    val batchSh = graft.ops.TextCorpus.shingles(
      graft.ops.TextCorpus.words(batch)).distinct()
    val batchPrefix = Text.allPairsPrefix(
      batchSh.withColumn("nw", lit(true)),
      DedupMaterialize.allPairsDfBaseTable(s, dir, AllPairsBatchMod))
    // previously landed state reads as OLD (nw=false): pairs between
    // two streamed batches belong to the later one. STRICTLY prior
    // epochs only — a replayed epoch must not see its own failed
    // attempt's rows as old, or the posting union would double-count
    // this batch's shingles and verify wrong overlaps
    def landedOr(sub: String, empty: DataFrame): DataFrame =
      try s.read.parquet(s"$out/$sub")
        .filter(col("ingest_epoch").cast("long") < epoch)
      catch {
        case _: org.apache.spark.sql.AnalysisException => empty
      }
    val prevPrefix = landedOr("prefix", batchPrefix.limit(0))
      .select(col("shingle"), col("doc_id"), col("n"), col("rk"))
      .withColumn("nw", lit(false))
    val prefix = DedupMaterialize
      .allPairsPrefixBaseTable(s, dir, AllPairsBatchMod)
      .unionByName(prevPrefix).unionByName(batchPrefix)
    val oldSh = graft.ops.TextCorpus.docShingles(s, dir)
      .filter(col("doc_id") % AllPairsBatchMod =!= 0)
    val prevSh = landedOr("postings", batchSh.limit(0))
      .select(col("doc_id"), col("shingle"))
    val sh = oldSh.unionByName(prevSh).unionByName(batchSh)
    val pairs = Text.allPairsFromPrefix(prefix, sh,
      col("a.nw") || col("b.nw"))
    def land(df: DataFrame, sub: String): Unit = {
      val keyed = df.withColumn("ingest_epoch", lit(epoch))
      // conf on the BATCH frame's (cloned) session — see
      // heavyHitterIngest; the outer session's conf never reaches a
      // foreachBatch write
      keyed.sparkSession.conf.set(
        "spark.sql.sources.partitionOverwriteMode", "dynamic")
      keyed.write.mode("overwrite").partitionBy("ingest_epoch")
        .parquet(s"$out/$sub")
    }
    land(pairs, "pairs")
    land(batchPrefix.drop("nw"), "prefix")
    land(batchSh, "postings")
  }

  /** Streaming heavy-hitter candidate ingest: each micro-batch lands
    * its own bounded Misra-Gries candidate set (≤ k tokens per epoch,
    * via [[graft.queries.TextQueries.mgCandidates]]) under an
    * epoch-partitioned dynamic overwrite — idempotent on replay, no
    * memory sink. The union over epochs is a guaranteed superset of
    * the GLOBAL heavy hitters: a token with overall frequency above
    * N/(k+1) must exceed the threshold in at least one batch (the
    * mediant inequality — Σf_b/ΣN_b > t implies some f_b/N_b > t), so
    * it survives that batch's summary. A final exact re-count of the
    * landed candidates (batch side) then yields the same deterministic
    * answer as the one-pass batch query — which is why
    * stream_heavy_hitters shares text_heavy_hitters' oracle. */
  /** STREAMING IVF index maintenance — embed_ivf_incremental run
    * continuously: each micro-batch of vectors (with the batch
    * corpus's per-row dup injection, which is batch-local by
    * construction) quantizes, assigns against the PARKED frozen
    * centroids (a broadcast 16-row dim), and lands its
    * (vec_id, cent_id) list rows under an epoch-partitioned dynamic
    * overwrite — idempotent on replay, batch-sized work per batch,
    * the old corpus never re-scanned. List assignment is per-vector
    * independent under frozen centroids, so the union over epochs IS
    * the maintained inverted-list table and equals the from-scratch
    * assignment — stream_ivf_ingest shares embed_ivf_incremental's
    * full-rebuild oracle to prove it every run. */
  def ivfIngest(s: SparkSession, dir: String, out: String,
      checkpoint: Option[String] = None): Unit = {
    val schema = s.read.parquet(s"$dir/embeddings.parquet").schema
    val stream = s.readStream.schema(schema)
      .parquet(s"$dir/embeddings*.parquet")
      .select(col("vec_id").cast("long").as("vec_id"), col("embedding"))
    val cents = graft.ops.AnnMaterialize.ivfCentroidTable(s, dir)
    val name = s"iv_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val ckpt = checkpoint.getOrElse(s"target/tmp/ckpt_$name")
    val q = stream.writeStream
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
         epoch: Long) =>
          val b = batch.toDF()
          val corpus = b.unionByName(b.filter(col("vec_id") % 100 === 0)
            .select((col("vec_id") + 1000000L).as("vec_id"),
              col("embedding")))
          val lists = graft.api.Similarity.assignLists(
            graft.api.Similarity.quantize(corpus), cents)
            .withColumn("ingest_epoch", lit(epoch))
          // conf on the BATCH frame's session (cloned per batch — see
          // heavyHitterIngest)
          lists.sparkSession.conf.set(
            "spark.sql.sources.partitionOverwriteMode", "dynamic")
          lists.write.mode("overwrite").partitionBy("ingest_epoch")
            .parquet(out)
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    try { q.processAllAvailable() } finally { q.stop() }
  }

  /** STREAMING PQ code-tier maintenance (twin of embed_pq_incremental,
    * shared oracle): each micro-batch of vectors encodes against the
    * parked FROZEN codebooks and lands epoch-keyed code rows through
    * the idempotent dynamic-overwrite epoch sink — encoding is
    * per-vector deterministic given frozen codebooks, so the landed
    * union equals the from-scratch full-corpus encode however the
    * stream was chopped into batches. */
  def pqIngest(s: SparkSession, dir: String, out: String,
      checkpoint: Option[String] = None): Unit = {
    val schema = s.read.parquet(s"$dir/embeddings.parquet").schema
    val stream = s.readStream.schema(schema)
      .parquet(s"$dir/embeddings*.parquet")
      .select(col("vec_id").cast("long").as("vec_id"), col("embedding"))
    val cents = graft.ops.AnnMaterialize.pqCodebookTable(s, dir)
    val name = s"pq_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val ckpt = checkpoint.getOrElse(s"target/tmp/ckpt_$name")
    val q = stream.writeStream
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
         epoch: Long) =>
          val b = batch.toDF()
          val corpus = b.unionByName(b.filter(col("vec_id") % 100 === 0)
            .select((col("vec_id") + 1000000L).as("vec_id"),
              col("embedding")))
          val codes = graft.api.Similarity.pqCodes(
            graft.api.Similarity.quantize(corpus), cents,
            graft.queries.SimilarityQueries.PqRM,
            graft.queries.SimilarityQueries.PqRSubDim)
            .withColumn("ingest_epoch", lit(epoch))
          codes.sparkSession.conf.set(
            "spark.sql.sources.partitionOverwriteMode", "dynamic")
          codes.write.mode("overwrite").partitionBy("ingest_epoch")
            .parquet(out)
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    try { q.processAllAvailable() } finally { q.stop() }
  }

  def heavyHitterIngest(s: SparkSession, dir: String, out: String,
      checkpoint: Option[String] = None): Unit = {
    val schema = s.read.parquet(s"$dir/documents.parquet").schema
    val stream = s.readStream.schema(schema)
      .parquet(s"$dir/documents*.parquet")
      .select(col("text"))
    val name = s"hh_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val ckpt = checkpoint.getOrElse(s"target/tmp/ckpt_$name")
    val q = stream.writeStream
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
         epoch: Long) =>
          val toks = batch.toDF().select(
            explode(expr(
              "filter(split(text, '[^a-z0-9]+'), x -> x != '')"))
              .as("token"))
          val cand = graft.queries.TextQueries.mgCandidates(s, toks)
            .withColumn("ingest_epoch", lit(epoch))
          // conf on the BATCH frame's session — streaming batches run
          // on a cloned session with a detached SQLConf, so the outer
          // session's conf would leave this write static-overwrite and
          // every epoch would wipe its predecessors (latent until a
          // multi-file source split the stream into several epochs)
          cand.sparkSession.conf.set(
            "spark.sql.sources.partitionOverwriteMode", "dynamic")
          cand.write.mode("overwrite").partitionBy("ingest_epoch")
            .parquet(out)
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    try { q.processAllAvailable() } finally { q.stop() }
  }
}
