package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native as-of join — the whole-operator rung of the custom-operator
  * ladder (expressions → aggregates → logical plan + strategy + exec).
  *
  * Semantics (matching DuckDB `ASOF LEFT JOIN ... ON l.k = r.k AND
  * l.t >= r.t`): every left row joins the latest right row of the same
  * key whose time is <= the left row's time, or nulls if none exists.
  *
  * Why a custom operator: the composable formulations either window
  * over a tagged union (one global sort-shuffle of BOTH inputs
  * interleaved — [[graft.analytics.Queries.asofJoin]]) or range-join
  * and deduplicate (quadratic candidates). This exec instead declares
  * `ClusteredDistribution` on the key for both children and per-key
  * time ordering, and streams a single forward merge pass per
  * partition: O(|L|+|R|) per partition, no candidate blowup, no
  * tagged-union interleave, and (key, time) output order is preserved
  * for downstream sort elimination. This is exactly the plan you want
  * at 100 TB: one hash shuffle per side, then linear merge.
  */
case class AsofJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression) extends BinaryNode {
  require(leftKeys.nonEmpty && leftKeys.length == rightKeys.length,
    "as-of join needs at least one equi-key and matching key arity")
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Physical as-of merge join. Children are hash-clustered on the keys
  * and sorted by (keys, time) — EnsureRequirements inserts the
  * exchanges/sorts; AQE still applies (the exchanges are ordinary
  * shuffle exchanges, so coalescing/skew handling work unchanged). */
case class AsofJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTime, Ascending))

  // left rows pass through 1:1 in order — preserve partitioning and
  // ordering so downstream sorts/shuffles on the same keys collapse
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(leftKeys, lOut)
      val rKeyProj = UnsafeProjection.create(rightKeys, rOut)
      val lTimeProj = UnsafeProjection.create(Seq(leftTime), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rightTime), rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(leftKeys.map(_.dataType))
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(leftTime.dataType))
      val outProj = UnsafeProjection.create(output, output)
      val nullRight = new GenericInternalRow(rOut.size)
      val joined = new JoinedRow

      // single-element lookahead over the right side
      var rHead: InternalRow = null
      var rHeadKey: UnsafeRow = null
      var rHeadTime: UnsafeRow = null
      def advance(): Unit =
        if (rIter.hasNext) {
          rHead = rIter.next()
          rHeadKey = rKeyProj(rHead).copy()
          rHeadTime = rTimeProj(rHead).copy()
        } else { rHead = null; rHeadKey = null; rHeadTime = null }
      advance()

      // latest right row consumed for the current key group
      var lastKey: UnsafeRow = null
      var lastMatch: InternalRow = null

      lIter.map { l =>
        val lk = lKeyProj(l)
        val lt = lTimeProj(l)
        val ltNull = lt.isNullAt(0)
        var scan = true
        while (scan && rHead != null) {
          val c = keyOrd.compare(rHeadKey, lk)
          if (c < 0) advance() // earlier key group: discard
          else if (c > 0) scan = false
          else if (rHeadTime.isNullAt(0)) advance() // null time never matches
          else if (!ltNull && timeOrd.compare(rHeadTime, lt) <= 0) {
            lastKey = rHeadKey
            lastMatch = rHead.copy()
            advance()
          } else scan = false
        }
        val matched = !ltNull && lastMatch != null &&
          lastKey != null && keyOrd.compare(lastKey, lk) == 0
        outProj(joined(l, if (matched) lastMatch else nullRight))
      }
    }
  }
}

/** Custom optimizer rule — the `Rule[LogicalPlan]` rung of the
  * ladder: a limit above an as-of join also bounds the join's LEFT
  * input, because the operator emits exactly one row per left row.
  * Pushing `LocalLimit` into the left child caps how much of the
  * (typically huge) probe side is shuffled and merged — the built-in
  * `LimitPushDown` rule cannot know this about a foreign node.
  * Idempotent: guarded on the child not already being the same limit. */
object AsofLimitPushdown
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.plans.logical.LocalLimit
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case ll @ LocalLimit(exp, aj: AsofJoinPlan)
        if !aj.left.isInstanceOf[LocalLimit] =>
      ll.copy(child = aj.copy(left = LocalLimit(exp, aj.left)))
  }
}

/** Plans [[AsofJoinPlan]] into [[AsofJoinExec]]. */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinPlan(l, r, lk, rk, lt, rt) =>
      AsofJoinExec(lk, rk, lt, rt, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Public DataFrame API for the native as-of join. */
object AsofJoinOp {

  /** Left as-of join: latest `right` row per key with
    * rightTime <= leftTime. Column names must be disjoint if you plan
    * to select by name downstream (rename before joining). */
  def asofJoin(left: DataFrame, right: DataFrame,
      leftKeys: Seq[String], rightKeys: Seq[String],
      leftTimeCol: String, rightTimeCol: String): DataFrame = {
    val spark: SparkSession = left.sparkSession
    org.apache.spark.sql.graftbridge.Bridge.addStrategy(spark, AsofJoinStrategy)
    org.apache.spark.sql.graftbridge.Bridge.addOptimization(spark, AsofLimitPushdown)
    def attr(df: DataFrame, n: String): Attribute =
      df.queryExecution.analyzed.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"column $n not in [${df.columns.mkString(", ")}]"))
    val plan = AsofJoinPlan(
      left.queryExecution.analyzed, right.queryExecution.analyzed,
      leftKeys.map(attr(left, _)), rightKeys.map(attr(right, _)),
      attr(left, leftTimeCol), attr(right, rightTimeCol))
    org.apache.spark.sql.graftbridge.Bridge.ofRows(spark, plan)
  }
}
