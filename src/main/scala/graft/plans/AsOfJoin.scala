package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graft.PlanBridge

/** As-of join as a first-class operator (logical node → strategy →
  * physical sort-merge exec): for every left row, attach the latest right
  * row whose time key is <= the left's (left-outer semantics — unmatched
  * lefts keep null right columns).
  *
  * This is the (c)-level extension path of the build rules, used where
  * composition is expressible but clumsy (union + ignore-nulls window,
  * see RefQueries "rate_asof"): the custom exec is a single merge pass
  * over both sides, with Catalyst inserting the required sorts via
  * `requiredChildOrdering`. The query `rate_asof_custom` shares
  * `rate_asof`'s DuckDB oracle, so the operator's semantics are
  * hash-verified against both the relational form and DuckDB's native
  * ASOF JOIN.
  *
  * Scale note: `AllTuples` distribution (one merge partition) is correct
  * for the small ordered dims this engine as-of-joins (exchange-rate
  * tables); the large-fact generalization range-partitions both sides on
  * the time key and broadcasts per-range boundary rows — same exec, a
  * different required distribution.
  */
case class AsOfJoin(left: LogicalPlan, right: LogicalPlan,
    leftTime: Expression, rightTime: Expression) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

/** Optimizer rule unique to AsOfJoin: it emits exactly one row per left
  * row, so a LIMIT above it can run below its left side. Catalyst's
  * LimitPushDown cannot know this about a foreign node — this is the
  * canonical reason to inject a custom Rule alongside a custom operator.
  */
object PushLimitThroughAsOfJoin
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.plans.logical.{LocalLimit, Limit}
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case l @ Limit(limitExpr, j @ AsOfJoin(left, _, _, _))
        if !left.isInstanceOf[LocalLimit] =>
      l.withNewChildren(Seq(
        j.copy(left = LocalLimit(limitExpr, left))))
  }
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lt, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lt, rt) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
    leftTime: Expression, rightTime: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // one partition per side + time-ascending order → a single merge pass;
  // Catalyst inserts the exchanges and sorts to satisfy these
  override def requiredChildDistribution: Seq[Distribution] =
    Seq(AllTuples, AllTuples)
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftTime, Ascending)), Seq(SortOrder(rightTime, Ascending)))
  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftTime, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val lBound = BindReferences.bindReference(leftTime, left.output)
    val rBound = BindReferences.bindReference(rightTime, right.output)
    val rightArity = right.output.length
    val outAttrs = output
    // bind against the nullable-adjusted right attrs (== output): binding
    // to the raw child attrs would elide null checks on non-nullable
    // right columns and read 0 from the all-null row
    val inAttrs = outAttrs
    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val proj = UnsafeProjection.create(outAttrs, inAttrs)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rightArity)
      var current: InternalRow = null
      var pending: InternalRow = if (rIt.hasNext) rIt.next().copy() else null
      lIt.map { lRow =>
        val lt = lBound.eval(lRow).asInstanceOf[Long]
        while (pending != null &&
          rBound.eval(pending).asInstanceOf[Long] <= lt) {
          current = pending
          pending = if (rIt.hasNext) rIt.next().copy() else null
        }
        proj(joined(lRow, if (current != null) current else nullRight))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsOfJoin {
  /** DataFrame-level entry point: `asof(left, right, "lt", "rt")`. The
    * strategy registers through `spark.experimental.extraStrategies`
    * (idempotent) — no session rebuild needed. */
  def asof(left: DataFrame, right: DataFrame,
      leftTimeCol: String, rightTimeCol: String): DataFrame = {
    val spark: SparkSession = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    if (!spark.experimental.extraOptimizations.contains(PushLimitThroughAsOfJoin))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ PushLimitThroughAsOfJoin
    val lPlan = PlanBridge.analyzed(left)
    val rPlan = PlanBridge.analyzed(right)
    val lt = lPlan.output.find(_.name == leftTimeCol)
      .getOrElse(sys.error(s"no column $leftTimeCol on left"))
    val rt = rPlan.output.find(_.name == rightTimeCol)
      .getOrElse(sys.error(s"no column $rightTimeCol on right"))
    PlanBridge.ofRows(spark, AsOfJoin(lPlan, rPlan, lt, rt))
  }
}
