package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import graft.functions._

/** Session wiring: registers graft's native expressions as SQL
  * functions, either via `--conf spark.sql.extensions=graft.GraftExtensions`
  * or programmatically with [[GraftFunctions.register]].
  *
  * After registration the hashing pipeline is usable from pure SQL:
  * {{{
  *   SELECT doc_id, graft_minhash(graft_shingle_hashes(graft_token_hashes(text), 3), 16)
  *   FROM documents
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach { case (name, info, builder) =>
      e.injectFunction((FunctionIdentifier(name), info, builder))
    }
    e.injectPlannerStrategy(_ => graft.plans.AsofJoinStrategy)
    e.injectOptimizerRule(_ => graft.plans.AsofLimitPushdown)
  }
}

object GraftFunctions {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def stringArrayArg(es: Seq[Expression], what: String): Seq[String] =
    es.map {
      case Literal(s, _) if s != null => s.toString
      case other => throw new IllegalArgumentException(
        s"$what must be string literals, got $other")
    }

  val all: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("graft_token_hashes",
      new ExpressionInfo(classOf[TokenPolyHashes].getName, "graft_token_hashes"),
      (es: Seq[Expression]) => TokenPolyHashes(es.head)),
    ("graft_shingle_hashes",
      new ExpressionInfo(classOf[ShinglePolyHashes].getName, "graft_shingle_hashes"),
      (es: Seq[Expression]) => ShinglePolyHashes(es.head, intArg(es(1), "k"))),
    ("graft_minhash",
      new ExpressionInfo(classOf[MinHashSignature].getName, "graft_minhash"),
      (es: Seq[Expression]) => MinHashSignature(es.head, intArg(es(1), "numHashes"))),
    ("graft_simhash",
      new ExpressionInfo(classOf[SimHash].getName, "graft_simhash"),
      (es: Seq[Expression]) => SimHash(es.head, intArg(es(1), "bits"))),
    ("graft_hyperplane_bucket",
      new ExpressionInfo(classOf[HyperplaneBucket].getName, "graft_hyperplane_bucket"),
      (es: Seq[Expression]) => HyperplaneBucket(es.head,
        intArg(es(1), "planes"), intArg(es(2), "dim"))),
    ("graft_tokens_in_set",
      new ExpressionInfo(classOf[TokensInSetCount].getName, "graft_tokens_in_set"),
      (es: Seq[Expression]) => TokensInSetCount(es.head,
        stringArrayArg(es.tail, "set members"))),
    // aggregate: the analyzer wraps a returned AggregateFunction in
    // AggregateExpression automatically
    ("graft_kmv",
      new ExpressionInfo(classOf[KMinValues].getName, "graft_kmv"),
      (es: Seq[Expression]) => KMinValues(es.head, intArg(es(1), "k"))))

  /** Register on an already-built session. */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}
