package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.Decimal
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

  private def doubleArg(e: Expression, what: String): Double = e match {
    case Literal(v: Double, _) => v
    case Literal(v: java.math.BigDecimal, _) => v.doubleValue()
    case Literal(v: Decimal, _) => v.toDouble
    case Literal(v: Int, _) => v.toDouble
    case other => throw new IllegalArgumentException(
      s"$what must be a numeric literal, got $other")
  }

  private def stringArg(e: Expression, what: String): String = e match {
    case Literal(s, _) if s != null => s.toString
    case other => throw new IllegalArgumentException(
      s"$what must be a string literal, got $other")
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
    ("graft_bpe_merge",
      new ExpressionInfo(classOf[BpeMergeFold].getName, "graft_bpe_merge"),
      (es: Seq[Expression]) => BpeMergeFold(es.head,
        stringArg(es(1), "a"), stringArg(es(2), "b"))),
    ("graft_byte_stats",
      new ExpressionInfo(classOf[ByteClassStats].getName, "graft_byte_stats"),
      (es: Seq[Expression]) => ByteClassStats(es.head)),
    ("graft_hex_byte_sum",
      new ExpressionInfo(classOf[HexByteSum].getName, "graft_hex_byte_sum"),
      (es: Seq[Expression]) => HexByteSum(es.head)),
    ("graft_hex_resize",
      new ExpressionInfo(classOf[HexResize].getName, "graft_hex_resize"),
      (es: Seq[Expression]) => HexResize(es.head, intArg(es(1), "target"))),
    ("graft_hex_phash",
      new ExpressionInfo(classOf[HexPHash].getName, "graft_hex_phash"),
      (es: Seq[Expression]) => HexPHash(es.head)),
    ("graft_adjacent_pairs",
      new ExpressionInfo(classOf[AdjacentPairs].getName, "graft_adjacent_pairs"),
      (es: Seq[Expression]) => AdjacentPairs(es.head)),
    ("graft_char_bigrams",
      new ExpressionInfo(classOf[CharBigrams].getName, "graft_char_bigrams"),
      (es: Seq[Expression]) => CharBigrams(es.head)),
    ("graft_dot",
      new ExpressionInfo(classOf[DotProductFold].getName, "graft_dot"),
      (es: Seq[Expression]) => DotProductFold(es.head, es(1))),
    ("graft_equal_count",
      new ExpressionInfo(classOf[EqualCount].getName, "graft_equal_count"),
      (es: Seq[Expression]) => EqualCount(es.head, es(1))),
    ("graft_long_slice_join",
      new ExpressionInfo(classOf[LongSliceJoin].getName, "graft_long_slice_join"),
      (es: Seq[Expression]) => LongSliceJoin(es.head,
        intArg(es(1), "start0"), intArg(es(2), "len"), stringArg(es(3), "sep"))),
    ("graft_poly_hash",
      new ExpressionInfo(classOf[PolyHashChars].getName, "graft_poly_hash"),
      (es: Seq[Expression]) => PolyHashChars(es.head)),
    ("graft_to_double_array",
      new ExpressionInfo(classOf[ToDoubleArray].getName, "graft_to_double_array"),
      (es: Seq[Expression]) => ToDoubleArray(es.head)),
    ("graft_quantize_i8",
      new ExpressionInfo(classOf[QuantizeI8].getName, "graft_quantize_i8"),
      (es: Seq[Expression]) => QuantizeI8(es.head)),
    ("graft_bloom_contains",
      new ExpressionInfo(classOf[BloomContains].getName, "graft_bloom_contains"),
      (es: Seq[Expression]) => BloomContains(es.head, es(1))),
    // aggregates: the analyzer wraps a returned AggregateFunction in
    // AggregateExpression automatically
    ("graft_kmv",
      new ExpressionInfo(classOf[KMinValues].getName, "graft_kmv"),
      (es: Seq[Expression]) => KMinValues(es.head, intArg(es(1), "k"))),
    ("graft_min_k_strings",
      new ExpressionInfo(classOf[MinKStrings].getName, "graft_min_k_strings"),
      (es: Seq[Expression]) => MinKStrings(es.head, intArg(es(1), "k"))),
    ("graft_vector_mean",
      new ExpressionInfo(classOf[VectorMean].getName, "graft_vector_mean"),
      (es: Seq[Expression]) => VectorMean(es.head, intArg(es(1), "scale"))),
    ("graft_bloom_agg",
      new ExpressionInfo(classOf[BloomAgg].getName, "graft_bloom_agg"),
      (es: Seq[Expression]) => BloomAgg(es.head, intArg(es(1), "numBits"),
        BloomContains.NumHashes)),
    ("graft_quantile",
      new ExpressionInfo(classOf[KllQuantile].getName, "graft_quantile"),
      (es: Seq[Expression]) => KllQuantile(es.head, intArg(es(1), "k"),
        es.drop(2).map(e => math.round(doubleArg(e, "quantile") * 1e6)))),
    ("graft_hll",
      new ExpressionInfo(classOf[HllSketch].getName, "graft_hll"),
      (es: Seq[Expression]) => HllSketch(es.head)),
    ("graft_cms",
      new ExpressionInfo(classOf[CountMin].getName, "graft_cms"),
      (es: Seq[Expression]) => CountMin(es.head)))

  /** Register on an already-built session. */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}
