package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session base for all suites (getOrCreate → one JVM-wide session). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    // keep managed-table data out of the repo root and inside target/
    .config("spark.sql.warehouse.dir", "target/spark-warehouse")
    .getOrCreate()
  spark.sparkContext.setLogLevel("WARN")

  def sf(name: String): String = s"/root/testdata/$name"
}

/** Suites run in parallel on the ONE shared session; tests that set the
  * session-global checkpoint dir (MaterializeSpec, PrefixCarrySpec)
  * serialize on this lock so they never see each other's dir. */
object CheckpointDirLock
