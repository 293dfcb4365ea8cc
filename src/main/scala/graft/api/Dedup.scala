package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Frame-based deduplication API — the library entry points a pipeline
  * calls directly (the oracle-checked queries in graft.queries are thin
  * adapters over these).
  *
  * Input contracts:
  *  - `docs`: (doc_id bigint, text string)
  *  - `shingles`: (doc_id, shingle string) — from
  *    [[graft.ops.TextCorpus.shingles]]
  *  - `words`: (doc_id, w array<string>)
  */
object Dedup {

  /** Exact dedup by content hash: one row per distinct text with the
    * canonical (minimum) doc_id and copy count. Only 16-byte digests
    * shuffle — never the text. */
  def exact(docs: DataFrame): DataFrame =
    docs.groupBy(md5(col("text")).as("fingerprint"))
      .agg(min(col("doc_id")).as("canonical_id"),
        count(lit(1)).as("n_copies"))

  /** MinHash signatures: `seeds` permutations approximated by
    * min(md5(seed || shingle)) per doc (hex-string min is
    * order-isomorphic to a 128-bit hash min). */
  def minhashSignatures(shingles: DataFrame, seeds: Int = 8): DataFrame = {
    val aggCols = (0 until seeds).map(k =>
      min(md5(concat(lit(s"$k|"), col("shingle")))).as(s"s$k"))
    shingles.groupBy(col("doc_id")).agg(aggCols.head, aggCols.tail: _*)
  }

  /** LSH band keys (2 bands × 4 rows over 8 signatures). */
  def lshBands(sigs: DataFrame): DataFrame =
    sigs.select(col("doc_id"),
      md5(concat(col("s0"), col("s1"), col("s2"), col("s3"))).as("band0"),
      md5(concat(col("s4"), col("s5"), col("s6"), col("s7"))).as("band1"))

  /** Candidate pairs: docs sharing either band key (doc_a < doc_b).
    * Cost ∝ bucket occupancy; cap or AQE-split pathological buckets at
    * web scale. */
  def candidatePairs(bands: DataFrame): DataFrame = {
    def joinOn(band: String): DataFrame = {
      val l = bands.select(col("doc_id").as("doc_a"), col(band).as("bk"))
      val r = bands.select(col("doc_id").as("doc_b"), col(band).as("bk"))
      l.join(r, Seq("bk")).filter(col("doc_a") < col("doc_b"))
        .select("doc_a", "doc_b")
    }
    joinOn("band0").union(joinOn("band1")).distinct()
  }

  /** Exact n-gram Jaccard for candidate pairs (the verify stage of
    * MinHash-LSH). `shingles` may contain duplicates; they are
    * de-duplicated here. */
  def jaccardVerify(shingles: DataFrame, pairs: DataFrame): DataFrame = {
    val ds = shingles.distinct()
    val cnt = ds.groupBy(col("doc_id")).agg(count(lit(1)).as("c"))
    val inter = pairs
      .join(ds.select(col("doc_id").as("doc_a"), col("shingle")), Seq("doc_a"))
      .join(ds.select(col("doc_id").as("doc_b"), col("shingle")),
        Seq("doc_b", "shingle"))
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("i"))
    inter
      .join(cnt.select(col("doc_id").as("doc_a"), col("c").as("ca")), Seq("doc_a"))
      .join(cnt.select(col("doc_id").as("doc_b"), col("c").as("cb")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        col("i").as("intersection"),
        (col("ca") + col("cb") - col("i")).as("union_size"),
        (col("i").cast("double") / (col("ca") + col("cb") - col("i")))
          .as("jaccard"))
  }

  /** 16-bit SimHash over a words frame: per-word md5 nibble bits vote
    * ±1 per bit position; the sign vector packs into a bigint. */
  def simhash16(words: DataFrame): DataFrame =
    words
      .select(col("doc_id"), explode(col("w")).as("word"))
      .select(col("doc_id"), col("word"),
        explode(expr("sequence(0, 15)")).as("b"))
      .withColumn("v", expr(
        """CASE WHEN CAST(floor(
          |  (instr('0123456789abcdef',
          |         substr(md5(word), CAST(floor(b / 4) AS INT) + 1, 1)) - 1)
          |  / (CASE CAST(b % 4 AS INT) WHEN 0 THEN 1 WHEN 1 THEN 2
          |          WHEN 2 THEN 4 ELSE 8 END)) AS BIGINT) % 2 = 1
          |THEN 1 ELSE -1 END""".stripMargin))
      .groupBy(col("doc_id"), col("b")).agg(sum(col("v")).as("bsum"))
      .groupBy(col("doc_id"))
      .agg(sum(when(col("bsum") > 0, expr("CAST(shiftleft(1, b) AS BIGINT)"))
        .otherwise(lit(0L))).as("simhash"))
}
