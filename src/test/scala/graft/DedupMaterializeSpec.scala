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
    assert(mat.exceptAll(dec).count() === 0)
  }
}
