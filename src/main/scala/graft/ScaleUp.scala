package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: amplify the chain/relational fact tables of an sf dir by
  * `factor` replicas with key offsets (clean join semantics: lineitem
  * follows its order's offset, events get fresh user ids) into an
  * sf1-equivalent directory under target/, for SCALING measurements
  * only — correctness always runs on the driver's real fixtures.
  *
  * The text/embedding corpora are NOT amplified (symlink-equivalent
  * copy): replicating near-identical content multiplies LSH bucket
  * occupancy quadratically, so an amplified dedup number would measure
  * the fixture artifact, not the engine. Usage:
  *   runMain graft.ScaleUp [srcDir] [outDir] [factor]
  */
object ScaleUp {
  /** Past the max sf0.1 orderkey (~6e5) and clear of the BIP30 dup
    * injection offset (1e7): replicas stay below it. */
  val KeyOffset = 1000000L

  /** Replica keys must stay below the BIP30 dup-injection offset (1e7,
    * RefQueries.DupOffset): the max replica key is
    * (factor-1)*KeyOffset + maxBaseKey with maxBaseKey < KeyOffset, so
    * factor*KeyOffset <= 1e7 keeps every replica clear of the injected
    * range (the documented default factor=10 passes). */
  def checkFactor(factor: Int): Unit =
    require(factor >= 1 && factor * KeyOffset <= 10000000L,
      s"factor $factor pushes replica keys into the dup-injection range")

  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("target/sfx10")
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    checkFactor(factor)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def amplify(name: String, shift: (DataFrame, Int) => DataFrame): Unit = {
      val base = spark.read.parquet(s"$src/$name.parquet")
      (0 until factor).map(i => shift(base, i)).reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$out/$name.parquet")
    }
    amplify("orders", (df, i) =>
      df.withColumn("o_orderkey", col("o_orderkey") + lit(i * KeyOffset)))
    amplify("lineitem", (df, i) =>
      df.withColumn("l_orderkey", col("l_orderkey") + lit(i * KeyOffset)))
    amplify("events", (df, i) =>
      df.withColumn("event_id", col("event_id") + lit(i * KeyOffset))
        .withColumn("user_id", col("user_id") + lit(i * KeyOffset)))
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "documents", "embeddings"))
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
    println(s"[scaleup] wrote $out at ${factor}x of $src")
    spark.stop()
  }
}
