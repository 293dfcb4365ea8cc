package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.NumericType

/** Strengthens `levenshtein(a, b) <= k` / `< k` filter predicates with
  * the implied cheap guard `abs(length(a) - length(b)) <= k` (resp `<`).
  *
  * Edit distance is bounded below by the length difference, so the guard
  * rejects exactly the rows the full predicate would reject anyway —
  * but in O(1) instead of the O(|a|·|b|) DP. Conjunctions short-circuit
  * in codegen, so at dedup-verify scale (millions of candidate pairs,
  * most of them far apart) the quadratic cost is only ever paid for
  * pairs that at least agree in length to within k.
  *
  * Idempotent: a guard that is already present (semantically) is not
  * added again, so the optimizer's fixed-point loop terminates. Null
  * semantics are unchanged — if either side is null, both the original
  * predicate and the guard evaluate to null.
  *
  * Registered alongside [[PushLimitThroughAsOfJoin]] via
  * `spark.experimental.extraOptimizations` (see `AsOfJoin.ensureRegistered`)
  * and cluster-wide via [[graft.GraftExtensions]].
  */
object LevenshteinPrefilter extends Rule[LogicalPlan]
    with PredicateHelper {

  /** Idempotent per-session registration (same mechanism as
    * [[AsOfJoin.asof]]). */
  def ensureRegistered(s: org.apache.spark.sql.SparkSession): Unit =
    if (!s.experimental.extraOptimizations.contains(LevenshteinPrefilter))
      s.experimental.extraOptimizations =
        s.experimental.extraOptimizations :+ LevenshteinPrefilter

  /** Cast targets that hold every possible levenshtein value
    * ([0, Int.MaxValue]) exactly. A NARROWING cast (tinyint/smallint, or
    * a too-small decimal) can wrap under ANSI-off — `cast(300 AS TINYINT)
    * = 44`, and 256 wraps to 0 — making the original predicate true for
    * a pair whose true distance exceeds the bound; adding the
    * length-difference guard there would DROP rows the user's predicate
    * keeps. Such casts get no guard. FloatType is excluded too (24-bit
    * mantissa rounds large counts, shifting the comparison). */
  private def preservesIntRange(
      dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
    case org.apache.spark.sql.types.IntegerType |
         org.apache.spark.sql.types.LongType |
         org.apache.spark.sql.types.DoubleType => true
    case d: org.apache.spark.sql.types.DecimalType =>
      d.precision - d.scale >= 10
    case _ => false
  }

  /** The levenshtein call inside a predicate side, looking through a
    * numeric cast — `cast(levenshtein(a, b) AS BIGINT) <= 20L` is what
    * the analyzer produces for a long literal, and whether the main
    * batch's cast-unwrapping has simplified it first depends on rule
    * ordering we must not couple to. Only WIDENING casts are looked
    * through (see [[preservesIntRange]]). */
  private def levOf(e: Expression): Option[(Expression, Expression)] =
    e match {
      case Levenshtein(a, b, None) => Some((a, b))
      // recurse through value-preserving casts only (cast(cast(lev)))
      case c: Cast if preservesIntRange(c.dataType) => levOf(c.child)
      case _ => None
    }

  /** |length(a) − length(b)| aligned to the literal's numeric type so
    * the constructed comparison type-checks post-analysis. */
  private def lenDiff(a: Expression, b: Expression, k: Literal)
      : Option[Expression] = {
    val diff = Abs(Subtract(Length(a), Length(b)))
    k.dataType match {
      case n: NumericType if n == diff.dataType => Some(diff)
      case n: NumericType => Some(Cast(diff, n))
      case _ => None // non-numeric bound: no sound guard
    }
  }

  private def guardFor(p: Expression): Option[Expression] = p match {
    case LessThanOrEqual(l, k: Literal) =>
      levOf(l).flatMap(ab =>
        lenDiff(ab._1, ab._2, k).map(LessThanOrEqual(_, k)))
    case LessThan(l, k: Literal) =>
      levOf(l).flatMap(ab => lenDiff(ab._1, ab._2, k).map(LessThan(_, k)))
    // symmetric spellings: k >= levenshtein(...) / k > levenshtein(...)
    case GreaterThanOrEqual(k: Literal, l) =>
      levOf(l).flatMap(ab =>
        lenDiff(ab._1, ab._2, k).map(GreaterThanOrEqual(k, _)))
    case GreaterThan(k: Literal, l) =>
      levOf(l).flatMap(ab => lenDiff(ab._1, ab._2, k).map(GreaterThan(k, _)))
    case _ => None
  }

  private def strengthened(cond: Expression): Option[Expression] = {
    val parts = splitConjunctivePredicates(cond)
    val guards = parts.flatMap(guardFor)
      .filterNot(g => parts.exists(_.semanticEquals(g)))
    if (guards.isEmpty) None else Some((guards ++ parts).reduce(And))
  }

  // by the time extra optimizations run, the main batch has usually
  // pushed the predicate into a join condition — cover both homes
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      strengthened(cond).map(Filter(_, child)).getOrElse(f)
    case j: org.apache.spark.sql.catalyst.plans.logical.Join
        if j.condition.isDefined =>
      strengthened(j.condition.get)
        .map(c => j.copy(condition = Some(c))).getOrElse(j)
  }
}
