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

  /** 2^40 modulus of the permutation arithmetic: a_k·h + b_k·h2 with
    * 20-bit multipliers and 40-bit hash halves peaks below 2^61 — no
    * bigint overflow in either engine. */
  val MinHashMod: Long = 1L << 40

  /** Per-permutation odd multipliers, derived deterministically from the
    * permutation index (md5 of "a|k"/"b|k", 20 bits, forced odd so the
    * map is a bijection mod 2^40). Exposed so the DuckDB oracle inlines
    * the identical constants. */
  def minhashConsts(seeds: Int): IndexedSeq[(Long, Long)] = {
    def odd(tag: String, k: Int): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$tag|$k".getBytes("UTF-8"))
      (BigInt(1, d.take(5)).toLong & ((1L << 20) - 1)) | 1L
    }
    (0 until seeds).map(k => (odd("a", k), odd("b", k)))
  }

  /** MinHash signatures: `seeds` permutations as independent affine
    * transforms g_k = (a_k·h1 + b_k·h2) mod 2^40 over ONE md5 per
    * shingle (h1/h2 = two 40-bit digest halves). One hash + `seeds`
    * integer min-aggs instead of `seeds` md5 calls per shingle row, and
    * the shuffle carries bigint mins, not 32-char hex strings. The
    * k-specific odd multipliers scramble the orderings independently —
    * a plain h1 + k·h2 family correlates permutations (one shingle
    * minimal in both halves wins every k), inflating band collisions. */
  def minhashSignatures(shingles: DataFrame, seeds: Int = 8): DataFrame = {
    require(seeds >= 1 && seeds <= 1000, s"seeds $seeds outside [1, 1000]")
    val h = shingles.select(col("doc_id"),
      expr("CAST(conv(substr(md5(shingle), 1, 10), 16, 10) AS BIGINT)")
        .as("h1"),
      expr("CAST(conv(substr(md5(shingle), 11, 10), 16, 10) AS BIGINT)")
        .as("h2"))
    val aggCols = minhashConsts(seeds).zipWithIndex.map { case ((a, b), k) =>
      min((col("h1") * lit(a) + col("h2") * lit(b)) % lit(MinHashMod))
        .as(s"s$k")
    }
    h.groupBy(col("doc_id")).agg(aggCols.head, aggCols.tail: _*)
  }

  /** Candidate probability of the b×r LSH banding at Jaccard
    * similarity `s`: 1 − (1 − s^r)^b — the S-curve every banding
    * trade-off reads off (MMDS §3.4.2). */
  def scurve(bands: Int, rows: Int, s: Double): Double =
    1.0 - math.pow(1.0 - math.pow(s, rows.toDouble), bands.toDouble)

  /** Band planner: among the divisor layouts b·r = seeds, the
    * (bands, rows) whose S-curve inflection (1/b)^(1/r) sits closest
    * to the target Jaccard `threshold` — the standard banding tuning
    * rule. More bands = higher recall below the inflection, fewer =
    * fewer false candidates above it; ties break toward more bands
    * (recall over candidate cost, since `candidatePairs`' maxBucket
    * cap already bounds the cost side). Deterministic, so the chosen
    * layout can be pinned by an oracle. */
  def planBands(seeds: Int, threshold: Double): (Int, Int) = {
    require(seeds >= 1, s"seeds $seeds < 1")
    require(threshold > 0 && threshold < 1, s"threshold $threshold not in (0,1)")
    (1 to seeds).filter(seeds % _ == 0)
      .map(b => (b, seeds / b))
      .minBy { case (b, r) =>
        (math.abs(math.pow(1.0 / b, 1.0 / r) - threshold), -b)
      }
  }

  /** LSH band keys: `bands` bands of `seeds / bands` signature rows each
    * (the classic b×r banding; default 2 × 4 over 8 signatures). */
  def lshBands(sigs: DataFrame, seeds: Int = 8, bands: Int = 2): DataFrame = {
    require(seeds % bands == 0, s"seeds $seeds not divisible into $bands bands")
    val rows = seeds / bands
    val bandCols = (0 until bands).map { b =>
      md5(concat_ws("|",
        (b * rows until (b + 1) * rows).map(k => col(s"s$k").cast("string")): _*))
        .as(s"band$b")
    }
    sigs.select(col("doc_id") +: bandCols: _*)
  }

  /** Candidate pairs: docs sharing any band key (doc_a < doc_b).
    * Cost ∝ bucket occupancy — `maxBucket` is the web-scale guard: band
    * buckets holding more than that many docs (boilerplate/template
    * text) are dropped BEFORE the self-join, bounding the per-bucket
    * pair count at maxBucket² instead of letting one pathological
    * bucket go quadratic in corpus size. (AQE skew-split spreads a big
    * bucket's shuffle, but cannot reduce the O(n²) pairs it emits.) */
  def candidatePairs(bands: DataFrame, nBands: Int = 2,
      maxBucket: Option[Int] = None): DataFrame = {
    def joinOn(band: String): DataFrame = {
      val keyed = bands.select(col("doc_id"), col(band).as("bk"))
      val pruned = maxBucket.fold(keyed) { cap =>
        val ok = keyed.groupBy(col("bk"))
          .agg(count(lit(1)).as("n")).filter(col("n") <= cap).select("bk")
        keyed.join(ok, Seq("bk"))
      }
      pruned.select(col("doc_id").as("doc_a"), col("bk"))
        .join(pruned.select(col("doc_id").as("doc_b"), col("bk")), Seq("bk"))
        .filter(col("doc_a") < col("doc_b"))
        .select("doc_a", "doc_b")
    }
    (0 until nBands).map(b => joinOn(s"band$b")).reduce(_ union _).distinct()
  }

  /** Incremental candidates: probe a NEW batch's band keys against an
    * existing (parked) band tier — (new_id, old_id) pairs without ever
    * touching old×old. This is how a growing corpus stays deduplicated:
    * the tier is the index, arriving documents hash map-side and the
    * only join is new-batch-sized against band buckets.
    *
    * `maxBucket` counts bucket occupancy over the tier ∪ batch UNION,
    * so a capped incremental run prunes exactly the buckets a capped
    * [[candidatePairs]] over the unioned corpus would prune — the
    * incremental result is precisely the new×old subset of the capped
    * full run (old×old pairs exist in the tier's own history; new×new
    * pairs surface when the batch joins the tier next ingest). The
    * union count costs one batch-sized agg on top of the tier-side
    * one — it cannot be skipped, or a bucket that crosses the cap only
    * once batch docs are counted would silently diverge between the
    * capped incremental and capped full forms. */
  def probePairs(newBands: DataFrame, tierBands: DataFrame,
      nBands: Int = 2, maxBucket: Option[Int] = None): DataFrame = {
    def joinOn(band: String): DataFrame = {
      val tier = tierBands.select(col("doc_id").as("old_id"),
        col(band).as("bk"))
      val nw = newBands.select(col("doc_id").as("new_id"), col(band).as("bk"))
      val pruned = maxBucket.fold(tier) { cap =>
        val ok = tier.select(col("bk")).union(nw.select(col("bk")))
          .groupBy(col("bk"))
          .agg(count(lit(1)).as("n")).filter(col("n") <= cap).select("bk")
        tier.join(ok, Seq("bk"))
      }
      nw.join(pruned, Seq("bk"))
        .select("new_id", "old_id")
    }
    (0 until nBands).map(b => joinOn(s"band$b")).reduce(_ union _).distinct()
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

  /** SimHash over a words frame: per-word md5 nibble bits vote ±1 per
    * bit position; the sign vector packs into a bigint. `bits` is a
    * multiple of 4 up to 60 (md5 supplies the bits; bigint carries the
    * mask). 16 is the oracle-checked default; near-dup pairing uses 48.
    *
    * The per-word vote mask IS the first bits/4 md5 nibbles read
    * little-endian — one `conv(reverse(...))` scalar instead of a
    * words × bits explode — and the votes accumulate in
    * [[graft.functions.SimHashAgg]] (map-side combined counters), so the
    * shuffle carries one counter array per (mapper, doc), never
    * per-bit rows. */
  def simhash(words: DataFrame, bits: Int = 16): DataFrame = {
    require(bits >= 4 && bits <= 60 && bits % 4 == 0,
      s"bits $bits must be a multiple of 4 in [4, 60]")
    val s = words.sparkSession
    import s.implicits._
    val masks = words
      .select(col("doc_id"), explode(col("w")).as("word"))
      .select(col("doc_id"), expr(
        s"CAST(conv(reverse(substr(md5(word), 1, ${bits / 4})), 16, 10) AS BIGINT)")
        .as("mask"))
      .as[(Long, Long)]
    masks.groupByKey(_._1).mapValues(_._2)
      .agg(new graft.functions.SimHashAgg(bits).toColumn.name("simhash"))
      .toDF("doc_id", "simhash")
  }

  /** The oracle-checked 16-bit form. */
  def simhash16(words: DataFrame): DataFrame = simhash(words, 16)

  /** The k bloom probe positions of a key, by double hashing
    * (Kirsch–Mitzenmacher): g_i = (h1 + i·h2) mod m over the key's two
    * independent 40-bit hash halves. Two real hashes give k probes with
    * the classic filter's false-positive behavior — no per-probe
    * rehashing of the key. SQL-expression form so both the Spark side
    * and the DuckDB oracle state the identical arithmetic. */
  private def bloomPosSql(i: Int, m: Int): String = s"((h1 + $i * h2) % $m)"

  /** Build a bloom filter over a key frame — input contract (h1, h2):
    * the key's two 40-bit md5 halves (both non-negative, as
    * [[minhashSignatures]] derives them). Returns ONE row (bm
    * array<bigint>): the m-bit filter, ready to broadcast.
    *
    * This is the blocklist scale path: m/8 bytes regardless of key
    * count (vs an exact broadcast set that grows with the list). The
    * position explode is map-side; [[graft.functions.BloomBitmapAgg]]
    * OR-combines per mapper, so the global aggregation moves one
    * m-bit array per partition. */
  def bloomBitmap(keys: DataFrame, m: Int = 512, k: Int = 2): DataFrame = {
    require(m >= 64 && m % 64 == 0, s"m $m must be a multiple of 64")
    require(k >= 1 && k <= 8, s"k $k outside [1, 8]")
    val s = keys.sparkSession
    import s.implicits._
    val pos = keys
      .select(explode(array((0 until k).map(i =>
        expr(bloomPosSql(i, m))): _*)).as("pos"))
      .as[Long]
    pos.select(new graft.functions.BloomBitmapAgg(m).toColumn.name("bm"))
      .toDF("bm")
  }

  /** Probe a (h1, h2)-keyed frame against a broadcast bloom bitmap:
    * adds `is_candidate` = all k probe bits set. No false negatives —
    * every inserted key passes; false positives are bounded by
    * (1 − e^{−kn/m})^k and removed by the caller's confirm equi-join
    * over the candidates only. The probe is pure column arithmetic
    * against the one broadcast row — zero shuffle added to the
    * probe-side scan. */
  def bloomProbe(probe: DataFrame, bitmap: DataFrame,
      m: Int = 512, k: Int = 2): DataFrame = {
    require(m >= 64 && m % 64 == 0, s"m $m must be a multiple of 64")
    require(k >= 1 && k <= 8, s"k $k outside [1, 8]")
    val hit = (0 until k).map { i =>
      val p = bloomPosSql(i, m)
      // m is a multiple of 64, so pos % 64 == (h1 + i·h2) % 64 and the
      // word index is pos div 64; Spark array indexing is 0-based
      expr(s"(shiftright(bm[CAST($p div 64 AS INT)], " +
        s"CAST($p % 64 AS INT)) & 1) = 1")
    }.reduce(_ && _)
    probe.crossJoin(broadcast(bitmap))
      .withColumn("is_candidate", hit)
      .drop("bm")
  }
}
