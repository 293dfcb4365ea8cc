package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: time the materialized-tier BUILDS cold (tier root wiped
  * first) at an arbitrary sf dir — the per-build scale datapoints for
  * SCALE.md. Usage: runMain graft.BuildBench [sfDir] */
object BuildBench {
  def main(args: Array[String]): Unit = {
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
      println(f"[buildbench] $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    timed("dedup_materialize_bands") {
      graft.ops.DedupMaterialize.bandTable(spark, sfDir).count(); ()
    }
    timed("dedup_materialize_components") {
      graft.ops.DedupMaterialize.componentTable(spark, sfDir).count(); ()
    }
    timed("dedup_materialize_base") {
      graft.ops.DedupMaterialize.componentBaseTable(spark, sfDir).count(); ()
    }
    timed("text_winfp_build") {
      graft.ops.DedupMaterialize.windowFpTable(spark, sfDir).count(); ()
    }
    timed("text_segment_build") {
      graft.ops.DedupMaterialize.segmentTable(spark, sfDir).count(); ()
    }
    timed("entity_build") {
      graft.queries.RefQueries.buildEntityTiers(spark, sfDir)
    }
    timed("graph_build") {
      graft.queries.GraphQueries.buildGraphTier(spark, sfDir)
    }
    timed("ann_build") {
      graft.ops.AnnMaterialize.buildAll(spark, sfDir)
    }
    spark.stop()
  }
}
