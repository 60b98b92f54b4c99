package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Deterministic negative sampling for recommender training —
  * SURVEY.md §2.266.
  *
  * Implicit-feedback training (BPR, sampled-softmax two-tower) needs
  * (user, positive, negative) triples; negatives must NOT be items
  * the user interacted with, and the sampling must be REPRODUCIBLE —
  * a re-run of the pipeline (or an incremental extension) has to
  * produce the same triples, which rules out rand(). The §2.37
  * deterministic-hash discipline applied to negative sampling.
  */
object Negatives {

  /** Candidate negatives drawn per positive pair. */
  val NegsPerPos = 2

  /** Catalog size (items are 1..100 in the events corpus). At real
    * scale this would come from an item-dimension count; a constant
    * here keeps both engines on the same literal. */
  val CatalogSize = 100

  /** §2.266 `pair_negatives`: for each observed (user, item) click
    * pair, [[NegsPerPos]] candidate negatives drawn as
    * hash64(user:item:j) mod catalog, with candidates that collide
    * with ANY of the user's clicked items removed by an anti-join —
    * the false-negative filter. Output = the training triples.
    *
    * Scale shape: one corpus scan to distinct positives, a bounded
    * ×[[NegsPerPos]] explode, one LEFT ANTI join keyed on
    * (user, item) — exactly the pair-exchange a shuffle-hash
    * anti-join does at any scale; no per-user collect, no rejection
    * loop (collided candidates are DROPPED, not resampled, keeping
    * the pipeline one-pass; the drop rate is the user's catalog
    * coverage, reported by §2.207).
    *
    * Determinism: the shared md5-prefix hash64 on both engines;
    * integer modulo; anti-join semantics identical. */
  def pairNegatives(spark: SparkSession, dir: String): DataFrame = {
    import graft.text.TextFunctions.hash64
    val pos = Tables.events(spark, dir)
      .filter(col("event_type") === "click")
      .withColumn("item", get_json_object(col("props"), "$.k").cast("int"))
      .filter(col("item").isNotNull)
      .select("user_id", "item").distinct()
    val cands = pos
      .select(col("user_id"), col("item").as("item_pos"),
        explode(array((1 to NegsPerPos).map(lit): _*)).as("j"))
      .withColumn("item_neg",
        (pmod(hash64(concat_ws(":", col("user_id"), col("item_pos"),
          col("j"))), lit(CatalogSize)) + 1).cast("int"))
    cands.join(pos
        .select(col("user_id"), col("item").as("item_neg")),
        Seq("user_id", "item_neg"), "left_anti")
      .select("user_id", "item_pos", "j", "item_neg")
      .orderBy("user_id", "item_pos", "j")
  }

  val pairNegativesSql: String = {
    import graft.text.TextFunctions.hash64Sql
    val h = hash64Sql("user_id || ':' || item_pos || ':' || j")
    s"""WITH pos AS (SELECT DISTINCT user_id,
       |    CAST(json_extract_string(props, '$$.k') AS INTEGER) AS item
       |  FROM events WHERE event_type = 'click'
       |    AND json_extract_string(props, '$$.k') IS NOT NULL),
       |cands AS (SELECT user_id, item AS item_pos, j,
       |    CAST((($h) % $CatalogSize + $CatalogSize) % $CatalogSize + 1
       |      AS INTEGER) AS item_neg
       |  FROM pos CROSS JOIN (VALUES (1), (2)) v(j))
       |SELECT c.user_id, c.item_pos, CAST(c.j AS INTEGER) AS j, c.item_neg
       |FROM cands c
       |LEFT JOIN pos p ON c.user_id = p.user_id AND c.item_neg = p.item
       |WHERE p.item IS NULL
       |ORDER BY c.user_id, c.item_pos, c.j""".stripMargin
  }
}
