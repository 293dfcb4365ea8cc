package graft.chain

import java.io.File

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-chain configuration ingestion — the reference deploys one config
  * file per chain (`conf/{btc,ltc,bch,zec}.cfg`: coin parameters plus
  * the parser's `maxBlockNum` tip cap, e.g. /root/reference/conf/btc.cfg:20
  * `"maxBlockNum": -6`), and the export CLI is parameterized by it.
  * This module models that surface: a schema-on-read JSON load of a
  * config DIRECTORY into one chain-params row per file, from which the
  * ingest derives its per-chain tip margin (negative maxBlockNum = stay
  * N blocks behind the tip; non-negative = an absolute cap, margin 0).
  *
  * The FIXTURE config dir is generated once at a stable path (content
  * is public per-coin constants, so no fixture-mtime key): four files
  * in the reference's JSON shape, with per-chain margins deliberately
  * varied so the parameterization is observable in query results.
  */
object ChainConfig {

  private val lock = new Object

  /** Stable fixture location — also referenced (as an absolute path) by
    * the DuckDB oracle, which re-parses the same files independently.
    * Resolved at runtime relative to the working directory, like every
    * sibling tier under target/intermediate — a hard-coded /root/repo
    * would write outside (or fail in) any other checkout. */
  val FixturePath: String =
    new File("target/intermediate/chaincfg_v1").getAbsolutePath

  /** Public per-coin constants in the reference's config shape. The
    * margins (parser.maxBlockNum) are fixture-varied per chain — the
    * reference ships -6 everywhere, which would make the per-chain
    * parameterization invisible in results. */
  private val fixtures: Map[String, String] = Map(
    "btc" -> chainJson("bitcoin", Seq(0), Seq(5), 481824L, "bc", -6),
    "ltc" -> chainJson("litecoin", Seq(48), Seq(50), 1201536L, "ltc", -12),
    "bch" -> chainJson("bitcoin-cash", Seq(0), Seq(5), 2147483647L,
      "NONE", -6),
    "zec" -> chainJson("zcash", Seq(28, 184), Seq(28, 189), 2147483647L,
      "NONE", -24))

  private def chainJson(coin: String, pubkey: Seq[Int], script: Seq[Int],
      segwitHeight: Long, segwitPrefix: String, maxBlockNum: Int): String =
    s"""{
       |  "chainConfig": {
       |    "coinName": "$coin",
       |    "pubkeyPrefix": [${pubkey.mkString(", ")}],
       |    "scriptPrefix": [${script.mkString(", ")}],
       |    "segwitActivationHeight": $segwitHeight,
       |    "segwitPrefix": "$segwitPrefix"
       |  },
       |  "parser": {
       |    "maxBlockNum": $maxBlockNum
       |  },
       |  "version": 5
       |}
       |""".stripMargin

  /** The parked four-file config fixture dir, written on first access
    * (lock + marker, like the sibling tiers). */
  def fixtureDir(): String = lock.synchronized {
    val root = new File(FixturePath)
    if (!new File(root, "_SUCCESS").exists()) {
      root.mkdirs()
      fixtures.foreach { case (cur, json) =>
        java.nio.file.Files.writeString(
          new File(root, s"$cur.cfg").toPath, json)
      }
      java.nio.file.Files.writeString(
        new File(root, "_SUCCESS").toPath, "")
    }
    FixturePath
  }

  /** Chain-params table from a config directory: one row per `*.cfg`
    * file (currency = the file stem), flat oracle-friendly columns.
    * Schema-on-read: `multiLine` JSON (each file is ONE object, the
    * reference's layout), currency recovered from the input file name —
    * no per-chain code paths, a fifth chain is a fifth file. */
  def read(s: SparkSession, confDir: String): DataFrame =
    parse(s, s"$confDir/*.cfg")

  /** One chain's params from a single cfg FILE — the export CLI's
    * `--chain-config conf/btc.cfg` shape (one file per deploy, like
    * the reference's `-c`). */
  def readFile(s: SparkSession, cfgPath: String): DataFrame =
    parse(s, cfgPath)

  private def parse(s: SparkSession, pathGlob: String): DataFrame =
    s.read.option("multiLine", "true").json(pathGlob)
      .select(
        regexp_extract(input_file_name(), "([a-z0-9]+)\\.cfg", 1)
          .as("currency"),
        col("chainConfig.coinName").as("coin_name"),
        // negative maxBlockNum = ingest to tip-|N| (the reference's
        // chain[start : maxBlockNum] slice); non-negative = absolute
        // cap, no tip-relative margin
        when(col("parser.maxBlockNum") < 0, -col("parser.maxBlockNum"))
          .otherwise(0L).cast("long").as("tip_margin"),
        col("chainConfig.segwitActivationHeight").cast("long")
          .as("segwit_activation_height"),
        col("chainConfig.segwitPrefix").as("segwit_prefix"),
        array_join(transform(col("chainConfig.pubkeyPrefix"),
          x => x.cast("string")), ",").as("pubkey_prefix"),
        array_join(transform(col("chainConfig.scriptPrefix"),
          x => x.cast("string")), ",").as("script_prefix"),
        col("version").cast("long").as("version"))
}
