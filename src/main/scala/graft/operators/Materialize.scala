package graft.operators

import org.apache.spark.sql.DataFrame

/** Per-round lineage truncation for iterative DataFrame loops (connected
  * components, PageRank, k-core, label propagation, BPE training…).
  *
  * Every iterative operator here must cut its logical plan each round or
  * the fixpoint re-executes the whole prefix per iteration (and the plan
  * grows without bound). HOW to cut depends on deployment:
  *
  *  - single node / tests: `localCheckpoint(true)` — block-manager only,
  *    no filesystem round-trip, but blocks die with their executor;
  *  - real cluster (dynamic allocation, spot executors): reliable
  *    `checkpoint()` into `sparkContext.getCheckpointDir` — survives
  *    executor loss, required for long-running jobs at 100 TB.
  *
  * [[truncate]] is the ONE switch point: it picks the reliable path
  * exactly when the session has a checkpoint directory configured
  * (`spark.sparkContext.setCheckpointDir(...)`), so cluster deployments
  * opt in with one driver-side line and no operator changes.
  */
object Materialize {

  /** Eagerly materialize `df` and truncate its lineage — reliable
    * `checkpoint()` if a checkpoint dir is set, else
    * `localCheckpoint(true)`. */
  def truncate(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
      df.checkpoint() // eager, replicated, survives lost executors
    else df.localCheckpoint(true)
}
