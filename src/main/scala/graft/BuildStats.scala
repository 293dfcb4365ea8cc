package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import java.util.concurrent.atomic.AtomicLong

/** Dev tool: run one named build cold and print NOISE-FREE work totals
  * (input bytes/records, shuffle read/write bytes/records, total task
  * time) accumulated from stage metrics — the wall-clock-independent
  * before/after evidence for build-path optimizations on a noisy box.
  * Usage: runMain graft.BuildStats [sfDir] <buildName>
  */
object BuildStats {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val which = args.lift(1).getOrElse("allpairs_base_build")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val inB = new AtomicLong; val inR = new AtomicLong
    val swB = new AtomicLong; val swR = new AtomicLong
    val srB = new AtomicLong; val taskMs = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        if (m != null) {
          inB.addAndGet(m.inputMetrics.bytesRead)
          inR.addAndGet(m.inputMetrics.recordsRead)
          swB.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          swR.addAndGet(m.shuffleWriteMetrics.recordsWritten)
          srB.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          taskMs.addAndGet(m.executorRunTime)
        }
        ()
      }
    })
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    graft.ops.Tiers.wipe()
    // reset after warmup/wipe so only the build is counted
    Thread.sleep(500)
    inB.set(0); inR.set(0); swB.set(0); swR.set(0); srB.set(0); taskMs.set(0)
    val t0 = System.nanoTime()
    which match {
      case "allpairs_base_build" =>
        graft.ops.DedupMaterialize.allPairsBaseTable(spark, sfDir).count()
        graft.ops.DedupMaterialize.allPairsDfBaseTable(spark, sfDir).count()
        graft.ops.DedupMaterialize.allPairsPrefixBaseTable(spark, sfDir)
          .count()
      case "text_winfp_base_build" =>
        graft.ops.DedupMaterialize.winfpGdfBaseTable(spark, sfDir).count()
        graft.ops.DedupMaterialize.winfpScoreBaseTable(spark, sfDir).count()
      case "graph_build" =>
        graft.queries.GraphQueries.buildGraphTier(spark, sfDir)
      case "entity_build" =>
        graft.queries.RefQueries.buildEntityTiers(spark, sfDir)
      case other =>
        sys.error(s"unknown build $other")
    }
    val wall = (System.nanoTime() - t0) / 1e9
    // listener events are posted asynchronously — drain before reading
    Thread.sleep(2000)
    println(f"[buildstats] $which wall=$wall%.2fs taskTime=${taskMs.get / 1000.0}%.1fs " +
      f"input=${inB.get / 1e6}%.1fMB/${inR.get / 1e6}%.2fMrec " +
      f"shufW=${swB.get / 1e6}%.1fMB/${swR.get / 1e6}%.2fMrec shufR=${srB.get / 1e6}%.1fMB")
    spark.stop()
  }
}
