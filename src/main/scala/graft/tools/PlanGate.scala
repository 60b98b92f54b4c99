package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.LambdaFunction
import org.apache.spark.sql.execution._
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.exchange.{Exchange, ReusedExchangeExec}
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}
import graft.SparkEntry

/** Whole-surface physical-plan gate (VERDICT r10 item 2): walks the
  * static plan of EVERY SparkEntry query and fails on the scale
  * anti-patterns the per-op specs assert piecemeal and PLANS.md was
  * audited for by eye:
  *
  *  - `CartesianProductExec` — always a defect (unkeyed all-pairs).
  *  - `BroadcastNestedLoopJoinExec` whose broadcast side is not
  *    provably bounded (all-paths-through-an-aggregate, see
  *    [[bounded]]) — a data-sized nested-loop broadcast is the
  *    round-9 fuzzy_match failure mode. The legitimate uses (1-row
  *    stat frames crossJoined onto a corpus) all broadcast aggregate
  *    outputs and pass the bound test.
  *  - `WindowExec`/`WindowGroupLimitExec` with an EMPTY partitionSpec
  *    whose child is not bounded — a single-partition sort of a
  *    data-sized frame (every row moves to one task; the
  *    recommender_coverage r10 watch item).
  *  - interpreted higher-order functions (`LambdaFunction` in any
  *    expression) on a node whose inputs are not bounded — per-row
  *    lambda interpretation in a corpus scan is the round-8
  *    boilerplate_ngrams failure mode (34.8 s vs 4 s compiled); over
  *    bounded frames (per-group folds of collected series, k-sized
  *    probe tables) it is the sanctioned sequential-recursion idiom.
  *
  * Boundedness is structural, not statistical: a node is bounded if
  * every leaf-to-node path passes through a cardinality-bounding
  * operator (aggregate, limit, local relation) — aggregates bound
  * output by group count, which every op's scale narrative already
  * sizes (stat frames, per-series rows, k-sized tops). A join is
  * bounded iff ALL its inputs are; exchanges/projections/filters/sorts
  * pass boundedness through; `GenerateExec` (explode) DESTROYS it —
  * exploding per-group collected lists can reinflate to corpus size,
  * so a lambda/window above an explode must re-bound first.
  *
  * Static mode matches the PLANS.md artifact (AQE off, sf0.01 stats):
  * the gate reads plan SHAPE, which Catalyst fixes at compile time;
  * AQE only re-picks join strategies within the same shape class.
  *
  * Usage: runMain graft.tools.PlanGate [dir] [only=<substr>]
  * Exit 1 on any violation; prints one line per query.
  */
object PlanGate {

  /** Operators that bound output cardinality regardless of input size. */
  private def bounding(p: SparkPlan): Boolean = p match {
    case _: BaseAggregateExec => true // group count, sized per-op
    case _: LocalTableScanExec => true // literal rows
    case _: GlobalLimitExec | _: LocalLimitExec => true
    case _: TakeOrderedAndProjectExec => true // distributed top-k
    case r: RangeExec => r.numElements.isValidLong &&
      r.numElements.toLong <= 100000 // spark.range constants
    case _ => false
  }

  /** Every leaf→node path passes a bounding operator. */
  def bounded(p: SparkPlan): Boolean =
    if (bounding(p)) true
    else p match {
      // executed (AQE-final) plans wrap subtrees in childless stage
      // nodes — descend into the wrapped plan, not past it
      case a: AdaptiveSparkPlanExec => bounded(a.executedPlan)
      case s: QueryStageExec => bounded(s.plan)
      case r: ReusedExchangeExec => bounded(r.child)
      // explode re-inflates (per-group collected lists can be
      // corpus-sized) — EXCEPT over literal input, where the output
      // size is a plan-time constant (explode(sequence(1, k)) over
      // OneRowRelation, the depth/threshold-grid idiom)
      case g: GenerateExec => g.child match {
        // literal leaves by name, not class: Spark 4 plans
        // OneRowRelation as its own exec node, not an RDDScanExec
        case leaf if leaf.children.isEmpty =>
          leaf.nodeName.contains("OneRowRelation") ||
            leaf.isInstanceOf[LocalTableScanExec]
        // explode directly over a GLOBAL (groupless, 1-row) aggregate:
        // the day-grid idiom — explode(sequence(min_day, max_day)) of
        // a corpus min/max. Time-bounded, not data-bounded. (A global
        // collect_list-then-explode would slip through this case; no
        // op uses that shape — collect_list always lives under a
        // per-group window here, which this arm does not match.)
        case a: BaseAggregateExec if a.groupingExpressions.isEmpty => true
        case p: ProjectExec => p.child match {
          case a: BaseAggregateExec => a.groupingExpressions.isEmpty
          case _ => false
        }
        case _ => false
      }
      case leaf if leaf.children.isEmpty => false // scans, RDD scans
      case other => other.children.forall(bounded)
    }

  private def hasLambda(p: SparkPlan): Boolean =
    p.expressions.exists(_.exists(_.isInstanceOf[LambdaFunction]))

  /** All violations in one query's physical plan (subqueries included).
    *
    * `limitAbove` tracks whether a Local/GlobalLimit sits above the
    * current node WITHIN the same stage (reset at exchanges): a
    * pipelined limit short-circuits row flow, so an interpreted lambda
    * under it evaluates at most `limit` rows per partition even though
    * its child subtree is a raw scan — the optimizer pushes query-side
    * limits below the lambda projects, which would otherwise
    * false-positive. The exemption applies ONLY to the lambda check:
    * windows consume all input and broadcast builds materialize fully
    * regardless of downstream limits. */
  def violations(plan: SparkPlan,
      debug: Option[String => Unit] = None): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    def flag(msg: String, node: SparkPlan): Unit = {
      out += msg
      debug.foreach(_(s"--- $msg\n${node.treeString}"))
    }
    def walk(p: SparkPlan, limitAbove: Boolean): Unit = {
      val childLimit = p match {
        case _: Exchange => false // stage boundary: limit no longer pipelines
        case _: LocalLimitExec | _: GlobalLimitExec |
             _: TakeOrderedAndProjectExec | _: CollectLimitExec => true
        case _ => limitAbove
      }
      p match {
        case c: CartesianProductExec =>
          flag(s"cartesian: ${c.nodeName}", c)
        case j: BroadcastNestedLoopJoinExec =>
          val bcast = j.buildSide match {
            case org.apache.spark.sql.catalyst.optimizer.BuildLeft => j.left
            case _ => j.right
          }
          if (!bounded(bcast))
            flag(s"bnlj-unbounded-broadcast: ${j.nodeName}", j)
        case w: WindowExec if w.partitionSpec.isEmpty && !bounded(w.child) =>
          flag(s"global-window-unbounded: ${w.nodeName}", w)
        case w: WindowGroupLimitExec
            if w.partitionSpec.isEmpty && !bounded(w.child) =>
          flag(s"global-window-limit-unbounded: ${w.nodeName}", w)
        case n if hasLambda(n) && !limitAbove && !n.children.forall(bounded) =>
          flag(s"lambda-on-unbounded: ${n.nodeName}", n)
        case _ =>
      }
      // AQE wrappers have no children — descend into the wrapped plan
      p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan, childLimit)
        case s: QueryStageExec => walk(s.plan, childLimit)
        case _ => p.children.foreach(walk(_, childLimit))
      }
      p.subqueries.foreach(walk(_, false))
    }
    walk(plan, limitAbove = false)
    out.toSeq
  }

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty && !args(0).startsWith("only=") &&
      args(0) != "executed") args(0) else "/root/testdata/sf0.01"
    val only = args.collectFirst { case a if a.startsWith("only=") => a.drop(5) }
    // `executed` mode (VERDICT r11 #8): run each query at the given SF
    // under the BENCH config (AQE on, real statistics) and gate the
    // FINAL adaptive plan — the static walk reads compile-time shape,
    // but AQE re-picks join strategies from runtime sizes, and a
    // corpus-derived frame that merely LOOKS small at compile time can
    // come back as an unbounded broadcast (the round-5 trap). This
    // asserts the pinned shuffle_hash/broadcast choices survive real
    // sf1 statistics.
    val executed = args.contains("executed")
    val spark: SparkSession =
      if (executed) graft.GraftSession.build("local[32]", "graft-plangate",
        dataDir = Some(dir), cores = 32)
      else SparkSession.builder().master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var bad = 0
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(name.contains) }
      .foreach { case (name, fn) =>
        graft.Caches.clearAll()
        val dbg = if (args.contains("debug"))
          Some((s: String) => println(s)) else None
        val vs =
          try {
            val df = fn(spark, dir)
            if (executed) {
              // execute THIS plan (toRdd), so the AdaptiveSparkPlan is
              // finalized with runtime stats before the walk
              df.queryExecution.toRdd.count()
              violations(df.queryExecution.executedPlan, dbg)
            } else violations(df.queryExecution.sparkPlan, dbg)
          } catch { case e: Throwable => Seq(s"ERROR building plan: $e") }
        if (vs.isEmpty) println(s"[plangate] OK   $name")
        else { bad += 1; vs.foreach(v => println(s"[plangate] FAIL $name — $v")) }
      }
    println(if (bad == 0) s"[plangate] all plans clean"
            else s"[plangate] $bad queries violate plan invariants")
    spark.stop()
    if (bad > 0) sys.exit(1)
  }
}
