package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.api.Dedup

/** Bloom prefilter: bitmap equals the brute-force bit set, build is
  * partitioning-invariant (OR-merge), and the probe admits every
  * inserted key (no false negatives) on random key sets. */
class BloomSpec extends SparkSpec {
  import spark.implicits._

  private val M = 512
  private val K = 2

  private def keyFrame(keys: Seq[Long]) =
    keys.toDF("raw").select(
      expr("CAST(conv(substr(md5(CAST(raw AS STRING)), 1, 10), 16, 10) AS BIGINT)")
        .as("h1"),
      expr("CAST(conv(substr(md5(CAST(raw AS STRING)), 11, 10), 16, 10) AS BIGINT)")
        .as("h2"))

  test("bitmap equals the brute-force position bit set") {
    val keys = (1L to 100L).map(_ * 37L)
    val kf = keyFrame(keys)
    val bm = Dedup.bloomBitmap(kf, M, K).as[Seq[Long]].head()
    val positions = kf.select(
      explode(array((0 until K).map(i =>
        expr(s"(h1 + $i * h2) % $M")): _*)).as("p"))
      .as[Long].collect()
    val want = new Array[Long](M / 64)
    positions.foreach(p => want((p >> 6).toInt) |= 1L << (p & 63))
    assert(bm.toArray.toSeq === want.toSeq)
  }

  test("build is repartitioning-invariant") {
    val kf = keyFrame((1L to 200L).map(_ * 13L))
    val one = Dedup.bloomBitmap(kf.coalesce(1), M, K).as[Seq[Long]].head()
    val many = Dedup.bloomBitmap(kf.repartition(7), M, K).as[Seq[Long]].head()
    assert(one === many)
  }

  test("no false negatives on random key sets") {
    val gen = Gen.listOfN(80, Gen.chooseNum(Long.MinValue + 1, Long.MaxValue))
    (1 to 5).foreach { seedIx =>
      val keys = gen(Gen.Parameters.default,
        org.scalacheck.rng.Seed(seedIx.toLong)).get
      val kf = keyFrame(keys)
      val bm = Dedup.bloomBitmap(kf, M, K)
      val probed = Dedup.bloomProbe(kf, bm, M, K)
      assert(probed.filter(!col("is_candidate")).count() === 0L,
        s"false negative with seed $seedIx")
    }
  }

  test("probe flags non-members at roughly the (1-e^-kn/m)^k rate") {
    val members = (1L to 50L).map(_ * 101L)
    val bm = Dedup.bloomBitmap(keyFrame(members), M, K)
    val outsiders = keyFrame((1L to 2000L).map(_ * 101L + 7L))
    val fp = Dedup.bloomProbe(outsiders, bm, M, K)
      .filter(col("is_candidate")).count()
    // fill ≈ 1-e^(-100/512) ≈ 0.18 → fp rate ≈ 0.032; 2000 probes ⇒
    // expect ~65, assert a loose envelope (deterministic given md5)
    assert(fp > 0 && fp < 300, s"false-positive count $fp outside envelope")
  }
}
