package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Frame-based text-analysis API. Input contract: `docWords` is
  * (doc_id bigint, text string, lang string, source string,
  * w array<string>) — documents with a pre-split words column.
  */
object Text {

  val Stops: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in"),
    "de" -> Seq("der", "und", "die", "das", "nicht"),
    "fr" -> Seq("le", "et", "les", "des", "une"),
    "es" -> Seq("el", "los", "que", "por", "una"))

  private def inList(ws: Seq[String]): String =
    ws.map(w => s"'$w'").mkString("(", ", ", ")")

  /** Stopword hits for one language as a column expression. */
  def hits(lang: String): String =
    s"CAST(size(filter(w, x -> x IN ${inList(Stops(lang))})) AS BIGINT)"

  /** Deterministic argmax with fixed precedence en>de>fr>es, zh fallback
    * when nothing hits. */
  val predLangCase: String =
    """CASE WHEN en_hits + de_hits + fr_hits + es_hits = 0 THEN 'zh'
      |     WHEN en_hits >= de_hits AND en_hits >= fr_hits
      |          AND en_hits >= es_hits THEN 'en'
      |     WHEN de_hits >= fr_hits AND de_hits >= es_hits THEN 'de'
      |     WHEN fr_hits >= es_hits THEN 'fr'
      |     ELSE 'es' END""".stripMargin

  /** Characteristic character n-grams per language (the classic
    * profile-based heuristic; disjoint sets keep the argmax sharp). */
  val Grams: Map[String, Seq[String]] = Map(
    "en" -> Seq("th", "ing", "he "),
    "de" -> Seq("sch", "ich", "ein"),
    "fr" -> Seq("les", "ais", "oux"),
    "es" -> Seq("los", "ado", "nto"))

  /** Occurrence count of language `lang`'s n-grams in `text`:
    * Σ (len(text) − len(replace(text, g, ''))) / len(g) — substring
    * counting with no explode, codegen-friendly in both engines. */
  def gramHits(lang: String): String =
    Grams(lang).map(g =>
      s"(length(text) - length(replace(text, '$g', ''))) / ${g.length}")
      .mkString("CAST(", " + ", " AS BIGINT)")

  /** Language-ID from character n-gram profiles (no tokenization). */
  def langIdNgram(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), col("lang"),
        expr(gramHits("en")).as("en_hits"), expr(gramHits("de")).as("de_hits"),
        expr(gramHits("fr")).as("fr_hits"), expr(gramHits("es")).as("es_hits"))
      .withColumn("pred_lang", expr(predLangCase))
      .withColumn("match", col("pred_lang") === col("lang"))

  /** Language-ID scores + prediction per doc. */
  def langId(docWords: DataFrame): DataFrame =
    docWords
      .select(col("doc_id"), col("lang"),
        expr(hits("en")).as("en_hits"), expr(hits("de")).as("de_hits"),
        expr(hits("fr")).as("fr_hits"), expr(hits("es")).as("es_hits"))
      .withColumn("pred_lang", expr(predLangCase))
      .withColumn("match", col("pred_lang") === col("lang"))

  /** Average word length (one exact-integer division) — ONE definition
    * for quality() and the percentile filter, with its DuckDB mirror. */
  val avgWordLen: org.apache.spark.sql.Column =
    length(regexp_replace(col("text"), " ", "")).cast("double") /
      size(col("w"))
  val avgWordLenSql: String =
    "CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(w)"

  /** Quality ratios (all exact-integer divisions). */
  def quality(docWords: DataFrame): DataFrame =
    docWords.select(
      col("doc_id"),
      length(col("text")).cast("long").as("n_chars_calc"),
      size(col("w")).cast("long").as("n_words"),
      avgWordLen.as("avg_word_len"),
      (expr(hits("en")).cast("double") / size(col("w")))
        .as("stopword_ratio"),
      ((length(col("text")) - length(regexp_replace(col("text"), "\\.", "")))
        .cast("long")).as("n_periods"))

  /** Benchmark decontamination — the n-gram-overlap eval-leak filter a
    * pretraining pipeline runs before training: count the distinct
    * word-shingles each corpus document shares with a benchmark shingle
    * set and flag documents at or above `minOverlap`.
    *
    * Scale: benchmark suites are MBs while the corpus is TBs, so the
    * benchmark side is `broadcast()` — the corpus never shuffles except
    * the per-doc overlap count (a map-side-combinable hash-agg on
    * doc_id). `corpusShingles`/`benchShingles` carry (doc_id, shingle) /
    * (shingle); `docs` is the doc_id universe to label (docs without any
    * overlap get n_overlap = 0).
    */
  def decontaminate(corpusShingles: DataFrame, benchShingles: DataFrame,
      docs: DataFrame, minOverlap: Long = 1L): DataFrame = {
    val bench = broadcast(
      benchShingles.select(col("shingle")).distinct())
    // join BEFORE distinct: the broadcast semi-reduction keeps only
    // overlapping (doc, shingle) rows, so the dedup shuffle carries the
    // overlap set, not the whole corpus shingle explosion
    val overlap = corpusShingles.select(col("doc_id"), col("shingle"))
      .join(bench, Seq("shingle"))
      .distinct()
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_overlap"))
    docs.select(col("doc_id"))
      .join(overlap, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"))
      .withColumn("contaminated", col("n_overlap") >= minOverlap)
  }

  /** Positional polynomial fingerprint (rolling-hash analog). */
  def fingerprint(docWords: DataFrame): DataFrame =
    docWords
      .select(col("doc_id"), posexplode(col("w")).as(Seq("pos", "word")))
      .withColumn("i", col("pos") + 1)
      .withColumn("term", expr(
        """CAST(((instr('0123456789abcdef', substr(md5(word), 1, 1)) - 1) * 16
          |  + instr('0123456789abcdef', substr(md5(word), 2, 1)) - 1)
          |  * (CASE CAST(i % 4 AS INT) WHEN 0 THEN 1 WHEN 1 THEN 31
          |          WHEN 2 THEN 961 ELSE 29791 END) AS BIGINT)""".stripMargin))
      .groupBy(col("doc_id"))
      .agg((sum(col("term")) % 1000000007L).as("fingerprint"))

  /** Positional-polynomial multipliers 31^j for the 8-word window
    * fingerprint (mirrored literally by the DuckDB oracle). */
  private val WinFpWeights =
    "array(1L, 31L, 961L, 29791L, 923521L, 28629151L, 887503681L, 27512614111L)"

  /** (doc_id, fp) — every 8-word window fingerprinted to a BIGINT
    * (positional polynomial over md5-derived byte values, mod 1e9+7 —
    * identical integer math in DuckDB). ONE md5 per word: the leading
    * digest byte via conv(hex, 16, 10), then 8 integer mul-adds per
    * window from the precomputed value array. One row per window
    * INSTANCE (duplicates within a doc are meaningful — they are the
    * signal). Input contract: (doc_id, w array<string>). */
  def windowFingerprints(wordsDf: DataFrame): DataFrame =
    wordsDf
      .filter(size(col("w")) >= 8)
      .withColumn("vals", expr(
        "transform(w, x -> CAST(conv(substr(md5(x), 1, 2), 16, 10) AS BIGINT))"))
      .select(col("doc_id"), explode(expr(
        s"""transform(sequence(0, size(vals) - 8), i ->
           |  aggregate(sequence(0, 7), CAST(0 AS BIGINT), (acc, j) ->
           |    acc + element_at(vals, i + j + 1)
           |      * element_at($WinFpWeights, j + 1))
           |  % 1000000007)""".stripMargin)).as("fp"))

  /** Consecutive fixed-width word segments of each doc: (doc_id,
    * seg_idx, seg, seg_h) with seg_h a 40-bit md5-derived bigint (the
    * minhash h1 trick, exactly mirrorable in DuckDB — a deployment
    * would widen to xxhash64) so frequency joins shuffle bigints, not
    * segment text. Input contract: (doc_id, w array<string>). */
  def wordSegments(wordsDf: DataFrame, width: Int): DataFrame =
    wordsDf
      .filter(size(col("w")) >= 1)
      .select(col("doc_id"), col("w"), explode(
        expr(s"sequence(0, CAST(ceil(size(w) / $width.0) AS INT) - 1)"))
        .as("i"))
      .select(col("doc_id"), col("i").cast("long").as("seg_idx"),
        expr(s"array_join(slice(w, i * $width + 1, $width), ' ')").as("seg"))
      .withColumn("seg_h",
        expr("CAST(conv(substr(md5(seg), 1, 10), 16, 10) AS BIGINT)"))

  /** Global fingerprint frequency: in how many DISTINCT docs each
    * window fingerprint appears. */
  def windowFpFrequency(wfp: DataFrame): DataFrame =
    wfp.select(col("doc_id"), col("fp")).distinct()
      .groupBy(col("fp")).agg(count(lit(1)).as("gdf"))

  /** Per-doc duplicated-window mass given the global frequency table
    * (fp, gdf): window count, windows whose fingerprint appears in ≥2
    * docs, and their ratio — the RefinedWeb/CCNet-style repeated-window
    * signal. Split from the frequency computation so incremental
    * maintenance can re-score only touched docs against an updated
    * frequency tier. */
  def scoreWindowFps(wfp: DataFrame, gdf: DataFrame): DataFrame =
    wfp.join(gdf, Seq("fp"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_windows"),
        sum(when(col("gdf") >= 2, 1L).otherwise(0L)).as("n_dup_windows"))
      .withColumn("dup_ratio",
        col("n_dup_windows").cast("double") / col("n_windows"))

  /** Incremental maintenance of the dup-window scores as a document
    * batch arrives: the pre-batch frequency state (`gdfBase`) is updated
    * with the batch's delta counts, and only docs holding a fingerprint
    * that CROSSED the ≥2 threshold — plus the batch itself — are
    * re-scored; every other row of `scoreBase` is provably unchanged,
    * because a score depends on its fingerprints only through the gdf≥2
    * booleans and gdf never decreases. Steady-state cost is ingest-sized
    * (batch fingerprinting + crossing-fp probe of the parked window
    * tier), never corpus-sized; the result equals a full recompute over
    * the unioned corpus row-for-row.
    *
    * Inputs: `oldWfp` (doc_id, fp) for the pre-batch corpus, `batchWfp`
    * likewise for the arriving docs (disjoint doc_ids), `gdfBase` =
    * [[windowFpFrequency]] of `oldWfp`, `scoreBase` =
    * [[scoreWindowFps]] of `oldWfp` against `gdfBase`. */
  def maintainDupWindows(oldWfp: DataFrame, batchWfp: DataFrame,
      gdfBase: DataFrame, scoreBase: DataFrame): DataFrame = {
    val delta = windowFpFrequency(batchWfp).withColumnRenamed("gdf", "delta")
    val gdfNew = gdfBase
      .withColumnRenamed("gdf", "gdf_old")
      .join(delta, Seq("fp"), "full_outer")
      .select(col("fp"),
        coalesce(col("gdf_old"), lit(0L)).as("gdf_old"),
        (coalesce(col("gdf_old"), lit(0L)) + coalesce(col("delta"), lit(0L)))
          .as("gdf"))
    val crossed = gdfNew
      .filter(col("gdf_old") < 2 && col("gdf") >= 2).select("fp")
    val touchedOld = oldWfp.join(crossed, Seq("fp"))
      .select("doc_id").distinct()
    val rescored = scoreWindowFps(
      oldWfp.join(touchedOld, Seq("doc_id")).unionByName(batchWfp),
      gdfNew.select(col("fp"), col("gdf")))
    scoreBase.join(touchedOld, Seq("doc_id"), "left_anti")
      .unionByName(rescored)
  }
}
