package graft
import org.apache.spark.sql.SparkSession
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(args(0))(spark, args.lift(1).getOrElse("/root/testdata/sf0.1"))
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    def c(p: String) = p + "=" + p.r.findAllIn(plan).size
    println("[counts] " + Seq("FileScan", "ReusedExchange", "Exchange hashpartitioning",
      "BroadcastExchange", "HashAggregate", "SortMergeJoin", "BroadcastHashJoin",
      "Generate", "WholeStageCodegen").map(c).mkString(" | "))
  }
}
