package graft.ops

import java.io.File

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops.TextCorpus._

/** Materialized intermediate tier for the MinHash-LSH dedup chain.
  *
  * The chain corpus → words → shingles → signatures → bands fans out to
  * several consumers (candidate pairs read bands twice per band key; the
  * Jaccard verify stage reads shingles twice more). Declaratively that
  * recomputes the shingle explosion per reference — harmless at sf0.1,
  * dominant at 100 TB where shingles are ~10× the corpus. This tier
  * computes shingles and bands ONCE per corpus and parks them as
  * parquet; every consumer then starts from a column-pruned scan.
  *
  * The cache key is the corpus path + its modification time, so a
  * regenerated fixture invalidates naturally. Writes are idempotent
  * (deterministic content, overwrite mode) and guarded by a JVM-local
  * lock + _SUCCESS marker — concurrent queries materialize at most once.
  */
object DedupMaterialize {

  private val lock = new Object

  /** Root is under target/ so `sbt clean` clears the tier. */
  private def base(dir: String): String = {
    val f = new File(s"$dir/documents.parquet")
    val mtime =
      if (f.isDirectory) f.listFiles().map(_.lastModified()).max
      else f.lastModified()
    val key = dir.replaceAll("[^A-Za-z0-9.]", "_")
    s"target/intermediate/dedup_${key}_$mtime"
  }

  private def ensure(s: SparkSession, dir: String): String = {
    val root = base(dir)
    lock.synchronized {
      if (!new File(s"$root/bands/_SUCCESS").exists() ||
          !new File(s"$root/shingles/_SUCCESS").exists()) {
        val sh = shingles(words(corpus(s, dir)))
        sh.write.mode("overwrite").parquet(s"$root/shingles")
        // signatures/bands derive from the parked shingles — the
        // explosion is never recomputed
        val sigs = graft.api.Dedup.minhashSignatures(
          s.read.parquet(s"$root/shingles"))
        graft.api.Dedup.lshBands(sigs)
          .write.mode("overwrite").parquet(s"$root/bands")
      }
    }
    root
  }

  /** (doc_id, shingle) — may contain duplicate shingles per doc. */
  def shingleTable(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"${ensure(s, dir)}/shingles")

  /** (doc_id, band0, band1) LSH band keys. */
  def bandTable(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"${ensure(s, dir)}/bands")
}
