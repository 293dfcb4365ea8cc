package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: repeat-invocation flatness probe for the PrefixCarry
  * consumers (the SCALE.md discipline BuildBench --repeat applies to the
  * tier builds, applied to queries). Runs each query N times in ONE
  * session, timing every pass and printing the block-manager pin count
  * (`getPersistentRDDs.size`) after each — a leaking session drifts
  * upward with invocation count. After each pass the returned frame's
  * checkpointed leaves are released (`Materialize.releasePinnedLeaves`),
  * the consumer-side free a real pipeline performs once the product is
  * landed; sealed consumers (rate_asof) have no leaves and stay flat on
  * their own. Usage:
  *   runMain graft.CarryBench [sfDir] [repeat] [query...]
  */
object CarryBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val repeat = args.lift(1).map(_.toInt).getOrElse(5)
    val names =
      if (args.length > 2) args.drop(2).toSeq
      else Seq("rate_asof", "rate_asof_forward", "pipeline_shards_global",
        "pipeline_shards_incremental", "corpus_shuffle")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    for (name <- names; i <- 1 to repeat) {
      val t0 = System.nanoTime()
      val frame = SparkEntry.queries(name)(spark, sfDir)
      val n = frame.count()
      val secs = (System.nanoTime() - t0) / 1e9
      graft.operators.Materialize.releasePinnedLeaves(frame)
      val pins = spark.sparkContext.getPersistentRDDs.size
      println(f"[carrybench] $name run$i $secs%.2f s rows=$n pins=$pins")
    }
    spark.stop()
  }
}
