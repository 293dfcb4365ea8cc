package graft

import java.io.File

import graft.ops.{DedupMaterialize, TextCorpus}

/** The materialized dedup tier must be idempotent and agree with the
  * declarative chain it replaces. */
class DedupMaterializeSpec extends SparkSpec {

  test("band table materializes once and matches the declarative chain") {
    val dir = sf("sf0.001")
    val first = DedupMaterialize.bandTable(spark, dir)
    val declarative = graft.api.Dedup.lshBands(
      graft.api.Dedup.minhashSignatures(
        TextCorpus.shingles(TextCorpus.words(TextCorpus.corpus(spark, dir)))))
    assert(first.count() === declarative.count())
    assert(first.exceptAll(declarative).count() === 0)
    // second call reuses the parked parquet (same _SUCCESS mtime)
    val marker = new File(
      first.inputFiles.head.stripPrefix("file:").replaceAll("/[^/]+$", "")
        + "/_SUCCESS")
    val mtime = marker.lastModified()
    DedupMaterialize.bandTable(spark, dir).count()
    assert(marker.lastModified() === mtime, "tier was rewritten on reuse")
  }

  test("shingle table matches the declarative shingles") {
    val dir = sf("sf0.001")
    val mat = DedupMaterialize.shingleTable(spark, dir)
    val dec = TextCorpus.shingles(TextCorpus.words(TextCorpus.corpus(spark, dir)))
    assert(mat.count() === dec.count())
    assert(mat.select("doc_id", "shingle").exceptAll(dec).count() === 0)
    // sh_hash is exactly xxhash64 of the stored shingle
    import org.apache.spark.sql.functions.{col, xxhash64}
    assert(mat.filter(col("sh_hash") =!= xxhash64(col("shingle")))
      .count() === 0)
  }

  test("window-fingerprint tier matches the declarative explode") {
    import org.apache.spark.sql.functions._
    val dir = sf("sf0.001")
    val mat = DedupMaterialize.windowFpTable(spark, dir)
    // the pre-tier derivation (two-nibble md5 extraction) — the parked
    // conv() form must be value-identical
    val dec = TextCorpus.words(TextCorpus.corpus(spark, dir))
      .filter(size(col("w")) >= 8)
      .withColumn("vals", expr(
        """transform(w, x ->
          |  CAST(((instr('0123456789abcdef', substr(md5(x), 1, 1)) - 1) * 16
          |    + instr('0123456789abcdef', substr(md5(x), 2, 1)) - 1)
          |    AS BIGINT))""".stripMargin))
      .select(col("doc_id"), explode(expr(
        """transform(sequence(0, size(vals) - 8), i ->
          |  aggregate(sequence(0, 7), CAST(0 AS BIGINT), (acc, j) ->
          |    acc + element_at(vals, i + j + 1)
          |      * element_at(array(1L, 31L, 961L, 29791L, 923521L,
          |          28629151L, 887503681L, 27512614111L), j + 1))
          |  % 1000000007)""".stripMargin)).as("fp"))
    assert(mat.count() === dec.count())
    assert(mat.exceptAll(dec).count() === 0)
    assert(mat.count() > 0, "fixture should produce 8-word windows")
  }

  test("segment tier matches the declarative segmentation") {
    val dir = sf("sf0.001")
    val mat = DedupMaterialize.segmentTable(spark, dir)
    val dec = graft.api.Text.wordSegments(
      TextCorpus.words(TextCorpus.corpus(spark, dir)),
      DedupMaterialize.SegmentWidth)
    assert(mat.count() === dec.count())
    assert(mat.exceptAll(dec).count() === 0)
    assert(mat.count() > 0)
  }

  test("incremental dup-window maintenance equals full recompute") {
    val dir = sf("sf0.001")
    val full = SparkEntry.queries("text_dup_windows")(spark, dir)
    val inc = SparkEntry.queries("text_dup_windows_incremental")(spark, dir)
    assert(full.count() > 0)
    assert(inc.count() === full.count())
    assert(inc.exceptAll(full).count() === 0,
      "maintained scores diverge from recomputed scores")
  }

  test("incremental segment-dedup maintenance equals full recompute") {
    val dir = sf("sf0.001")
    val full = SparkEntry.queries("text_segment_dedup")(spark, dir)
    val inc = SparkEntry.queries("text_segment_dedup_incremental")(spark, dir)
    assert(full.count() > 0)
    assert(inc.count() === full.count())
    assert(inc.exceptAll(full).count() === 0,
      "maintained segment-dedup output diverges from recomputed")
  }
}
