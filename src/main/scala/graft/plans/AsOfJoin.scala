package graft.plans

import org.apache.spark.RangePartitioner
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graft.PlanBridge

/** As-of join as a first-class operator (logical node → strategy →
  * physical sort-merge exec): for every left row, attach the latest right
  * row whose time key is <= the left's (left-outer semantics — unmatched
  * lefts keep null right columns).
  *
  * This is the (c)-level extension path of the build rules, used where
  * composition is expressible but clumsy (union + ignore-nulls window,
  * see RefQueries "rate_asof"): the exec is a per-range merge pass over
  * both sides. The query `rate_asof_custom` shares `rate_asof`'s DuckDB
  * oracle, so the operator's semantics are hash-verified against both
  * the relational form and DuckDB's native ASOF JOIN.
  *
  * Scale design (no single-partition funnel): both sides are
  * range-partitioned on the time key with the SAME `RangePartitioner`
  * (boundaries sampled from the left), so equal ranges are co-located by
  * construction; each range's merge is seeded with a per-range boundary
  * carry — the latest right row of every earlier range, prefix-scanned
  * (one tiny row per partition) and broadcast. Wall-clock scales with
  * the largest range, not |left|, and results are independent of where
  * the sampled boundaries fall.
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

  // no required distribution/ordering: the exec range-partitions and
  // sorts both sides itself (same partitioner → co-located ranges), so
  // Catalyst never inserts a SinglePartition exchange
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

    // key both sides by the time value (rows copied: children hand out
    // reused UnsafeRows, and these cross a shuffle boundary)
    val leftKeyed: RDD[(Long, InternalRow)] = left.execute()
      .map(r => (lBound.eval(r).asInstanceOf[Long], r.copy()))
    val rightKeyed: RDD[(Long, InternalRow)] = right.execute()
      .map(r => (rBound.eval(r).asInstanceOf[Long], r.copy()))

    // one RangePartitioner instance for BOTH sides: identical boundaries
    // → co-partitioned ranges (two ordinary range exchanges, never a
    // SinglePartition funnel). Boundaries are sampled from the left (the
    // fact side); the partitioner may return fewer partitions when the
    // key space is small.
    val partitioner = new RangePartitioner(
      math.max(1, conf.numShufflePartitions), leftKeyed, ascending = true)
    val lParted = leftKeyed.repartitionAndSortWithinPartitions(partitioner)
    val rParted = rightKeyed.repartitionAndSortWithinPartitions(partitioner)

    // per-range boundary carry: the latest right row of each range
    // (one row per partition — bounded by numPartitions, not data size),
    // prefix-scanned on the driver so range i starts from the latest
    // right row of all ranges < i, then broadcast
    val lastPerPart: Map[Int, InternalRow] = rParted
      .mapPartitionsWithIndex { (i, it) =>
        var last: InternalRow = null
        while (it.hasNext) last = it.next()._2
        if (last == null) Iterator.empty else Iterator.single(i -> last)
      }.collect().toMap
    val carryArr = new Array[InternalRow](partitioner.numPartitions)
    var run: InternalRow = null
    for (i <- 0 until partitioner.numPartitions) {
      carryArr(i) = run
      lastPerPart.get(i).foreach(run = _)
    }
    val carryBc = sparkContext.broadcast(carryArr)

    // tag left rows with their RANGE index (not TaskContext.getPartitionId:
    // a downstream coalesce computes many ranges inside one task, which
    // would make every range read the task's — wrong — carry slot)
    val lTagged = lParted.mapPartitionsWithIndex(
      (i, it) => it.map(kv => (i, kv)), preservesPartitioning = true)
    lTagged.zipPartitions(rParted) { (lIt, rIt) =>
      val proj = UnsafeProjection.create(outAttrs, inAttrs)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rightArity)
      val buffered = lIt.buffered
      // seed the merge with the carry from earlier ranges; empty left
      // partitions emit nothing, so the seed lookup is safe
      var current: InternalRow =
        if (buffered.hasNext) carryBc.value(buffered.head._1) else null
      var pending: (Long, InternalRow) = if (rIt.hasNext) rIt.next() else null
      buffered.map { case (_, (lt, lRow)) =>
        while (pending != null && pending._1 <= lt) {
          current = pending._2
          pending = if (rIt.hasNext) rIt.next() else null
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
