package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: decompose entity_build's cold cost into its three tier
  * fixpoints (full chain, pinned window, pre-batch base) so optimization
  * targets the stage that actually pays. Usage: runMain graft.ProfileEntity
  * [sfDir] */
object ProfileEntity {
  def main(args: Array[String]): Unit = {
    sys.props("graft.cc.debug") = "1"
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    graft.ops.Tiers.wipe()
    def timed(name: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"[profile] $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    timed("ia_pairs")(graft.queries.RefQueries.profileEntityTier(
      spark, sfDir, "ia"))
    timed("entity_build_all")(graft.queries.RefQueries.buildEntityTiers(
      spark, sfDir))
    spark.stop()
  }
}
