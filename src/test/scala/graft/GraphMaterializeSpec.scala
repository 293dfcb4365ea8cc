package graft

import java.io.File

import org.apache.spark.sql.functions._

import graft.chain.Chain
import graft.ops.GraphMaterialize

/** The materialized flow-edge tier must be idempotent and agree with the
  * declarative io-derivation it replaces (same contract as the dedup and
  * entity tiers). */
class GraphMaterializeSpec extends SparkSpec {

  test("edge tier parks once, reuses, and matches the declarative edges") {
    val dir = sf("sf0.001")
    graft.queries.GraphQueries.buildGraphTier(spark, dir)
    // after the build, access must NOT re-run the derivation
    val edges = GraphMaterialize.edgeTable(spark, dir)(
      sys.error("tier rebuilt on reuse"))
    val marker = new File(
      edges.inputFiles.head.stripPrefix("file:").replaceAll("/[^/]+$", "")
        + "/_SUCCESS")
    val mtime = marker.lastModified()
    GraphMaterialize.edgeTable(spark, dir)(
      sys.error("tier rebuilt on reuse")).count()
    assert(marker.lastModified() === mtime, "tier was rewritten on reuse")

    // declarative re-derivation (the semantics flowEdges owns)
    val ioa = Chain.io(spark, dir).select(col("tx_id"), col("is_input"),
      explode(col("addresses")).as("address"))
    val ia = ioa.filter(col("is_input"))
      .select(col("tx_id"), col("address").as("src")).distinct()
    val oa = ioa.filter(!col("is_input"))
      .select(col("tx_id"), col("address").as("dst")).distinct()
    val dec = ia.join(oa, Seq("tx_id"))
      .filter(col("src") =!= col("dst"))
      .select(col("src"), col("dst")).distinct()
    assert(edges.count() === dec.count())
    assert(edges.exceptAll(dec).count() === 0)
  }

  test("entity-flow tier parks once, reuses, and matches the derivation") {
    val dir = sf("sf0.001")
    graft.queries.GraphQueries.buildEntityFlowTier(spark, dir)
    // after the build, access must NOT re-run the derivation
    val flows = GraphMaterialize.entityFlowTable(spark, dir)(
      sys.error("entity-flow tier rebuilt on reuse"))
    val marker = new File(
      flows.inputFiles.head.stripPrefix("file:").replaceAll("/[^/]+$", "")
        + "/_SUCCESS")
    val mtime = marker.lastModified()
    GraphMaterialize.entityFlowTable(spark, dir)(
      sys.error("entity-flow tier rebuilt on reuse")).count()
    assert(marker.lastModified() === mtime, "tier was rewritten on reuse")

    // the parked rows must equal the direct derivation exactly
    val dec = graft.queries.GraphQueries.deriveEntityFlows(spark, dir)
    assert(flows.count() === dec.count())
    assert(flows.exceptAll(dec).count() === 0)
    assert(dec.exceptAll(flows).count() === 0)
  }

  test("entity_tags_src query path is read-only over the parked TagPack CSV") {
    val dir = sf("sf0.001")
    val q = graft.queries.GraphQueries.queries("entity_tags_src")
    // first invocation may build the tier (parked-tier convention)
    val first = q(spark, dir).count()
    val tp = GraphMaterialize.tagPackFile(spark, dir)(
      sys.error("tagpack tier rebuilt on reuse"))
    val marker = new File(s"$tp/_SUCCESS")
    assert(marker.exists(), "parked TagPack fixture missing _SUCCESS")
    val mtime = marker.lastModified()
    // the bench-purity contract: re-invoking the QUERY writes nothing
    assert(q(spark, dir).count() === first)
    assert(marker.lastModified() === mtime,
      "entity_tags_src rewrote its source fixture inside the query path")
  }
}
