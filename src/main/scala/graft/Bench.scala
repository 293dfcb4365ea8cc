package graft
import org.apache.spark.sql.SparkSession
object Bench {
  /** Headline queries: the flagship of each operator family (full
    * inventory runs in Verify; set SPARK_GRAFT_BENCH_ALL=1 to bench all).
    * Order: cheap scans first so scheduler warmup lands on small work. */
  val headline: Seq[String] = Seq(
    "block_table",            // scan + bucket agg
    "tx_by_prefix",           // projection + hash derivation
    "q1_pricing",             // partial-agg benchmark classic
    "q3_shipping",            // 3-way broadcast join + top-k
    "block_transactions",     // collect_list per group
    "transaction_table",      // nested io arrays, single shuffle
    "rate_join",              // broadcast dim join
    "io_address",             // explode + distinct agg
    "bip30_dedup",            // window dedup
    "events_sessionize",      // two-pass window sessionization
    "dedup_exact",            // content-hash dedup
    "dedup_minhash_pairs",    // LSH band join
    "embed_cosine_topk",      // brute-force ANN
    "embed_lsh_ann",          // bucketed ANN
    "text_quality",           // narrow per-doc scoring
    "stream_incremental")     // AvailableNow streaming ingest
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: session/codegen/parquet-footer costs are one-time
    // and not attributable to the first query in iteration order
    try {
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .groupBy("l_returnflag").count().count()
    } catch { case _: Throwable => () }
    val benchSet: Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)] =
      if (sys.env.get("SPARK_GRAFT_BENCH_ALL").contains("1"))
        SparkEntry.queries.toSeq
      else headline.map(n => n -> SparkEntry.queries(n))
    val results = benchSet.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
