package graft

/** Physical-plan assertions (SURVEY.md §4): the optimizations we rely on
  * for 100 TB must actually be present in the executed plans. */
class PlanSpec extends SparkSpec {

  private def executedPlan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf("sf0.001"))
    df.collect() // run so AQE finalizes its plan
    df.queryExecution.executedPlan.toString
  }

  test("rate_join broadcasts the rates dimension") {
    assert(executedPlan("rate_join").contains("BroadcastHashJoin"))
  }

  test("q3 broadcasts the filtered customer dim") {
    assert(executedPlan("q3_shipping").contains("BroadcastHashJoin"))
  }

  test("q1 pushes the shipdate filter into the parquet scan") {
    val plan = executedPlan("q1_pricing")
    assert(plan.contains("PushedFilters") &&
      plan.matches("(?s).*PushedFilters: \\[[^\\]]*l_shipdate.*"))
  }

  test("io_address prunes unused lineitem columns at the scan") {
    val plan = executedPlan("io_address")
    assert(plan.contains("ReadSchema"))
    // query needs keys/price/linenumber; must not read dates or flags
    assert(!plan.contains("l_shipdate") && !plan.contains("l_returnflag"),
      s"column pruning failed:\n$plan")
  }

  test("similarity hot path uses the custom codegen dot product") {
    assert(executedPlan("embed_cosine_topk").contains("dot_product_long"))
  }

  test("point lookup keeps whole-stage codegen") {
    val plan = executedPlan("prefix_lookup")
    // compact plan strings mark codegen stages with "*(n)"
    assert(plan.contains("WholeStageCodegen") || plan.contains("*("))
  }

  test("last-write-wins agg form partial-aggregates before the shuffle") {
    val plan = executedPlan("bip30_dedup_agg")
    assert(plan.contains("partial_max"),
      s"no map-side combine before the exchange:\n$plan")
  }

  test("dedup pairs read the materialized band tier, not the corpus") {
    val plan = executedPlan("dedup_minhash_pairs")
    assert(plan.contains("target/intermediate"),
      s"pairs plan recomputes the shingle chain:\n$plan")
    assert(!plan.contains("documents.parquet"),
      s"pairs plan still scans the raw corpus:\n$plan")
  }

  test("segmented rate_asof windows by bucket, never over the facts") {
    val plan = executedPlan("rate_asof")
    // the only unpartitioned (SinglePartition) exchange feeds the tiny
    // per-bucket carry summary, which is then broadcast
    val idx = plan.indexOf("Exchange SinglePartition")
    assert(idx === -1 ||
      plan.lastIndexOf("BroadcastExchange") > 0,
      s"global window over fact rows:\n$plan")
    assert(plan.contains("windowspecdefinition(b#") ||
      plan.matches("(?s).*Window.*\\[b#\\d+L\\].*"),
      s"main window not bucket-partitioned:\n$plan")
  }
}
