package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.text.TextFunctions._

/** Train/validation split hygiene — SURVEY.md §2.139.
  *
  * A random split is only sound if duplicated content doesn't straddle
  * it: a validation doc whose near-copy sits in train is leaked eval
  * signal (the train/test-contamination failure §2.72 checks against
  * EXTERNAL benchmarks, here applied to the corpus's own split).
  */
object Splits {

  /** Validation share: hash bucket ∈ [0, 10), bucket ≥ 8 → val (80/20). */
  val ValFrom = 8

  /** §2.139 split-leakage audit: assign every document a deterministic
    * train/val split (hash bucket — reproducible across runs and
    * engines, no RNG, the §2.37 convention) and report every MinHash
    * near-dup pair (§2.22's banded candidates, est Jaccard ≥ 0.25)
    * that STRADDLES the split — exactly the pairs a cluster-aware
    * split (cut on §2.39 cluster ids, not doc ids) would eliminate,
    * and the reason naive doc-level splits overstate held-out loss
    * gaps. The corpus has no EXACT text dups (verified — md5 groups
    * are all singletons), so leakage is a near-dup phenomenon here,
    * as it is in real crawls after exact dedup has already run.
    *
    * Scale shape: the pair stream is the §2.22 banded-LSH candidate
    * join (O(n·bands), no all-pairs); the split tag is row-local
    * (hash of doc_id) computed on the doc-id-sized projection, so the
    * two tag joins are id⋈pair hash joins on the pair stream — no new
    * corpus-sized shuffle beyond what minhash itself costs. Output is
    * leaky-pair-sized. */
  def splitLeakage(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val tags = docs.select(col("doc_id"),
      (pmod(hash64(concat_ws(":", lit("sp"), col("doc_id"))),
        lit(10)) >= ValFrom).as("is_val"))
    val pairs = graft.dedup.Dedup.minhashPairs(docs)
    pairs
      .join(tags.select(col("doc_id").as("id_a"), col("is_val").as("val_a")), "id_a")
      .join(tags.select(col("doc_id").as("id_b"), col("is_val").as("val_b")), "id_b")
      .filter(col("val_a") =!= col("val_b"))
      .select(col("id_a"), col("id_b"), col("est_jaccard"),
        when(col("val_a"), col("id_a")).otherwise(col("id_b")).as("val_doc"),
        when(col("val_a"), col("id_b")).otherwise(col("id_a")).as("train_doc"))
      .orderBy("id_a", "id_b")
  }

  /** Split percentages for [[makeSplits]]: bucket < 80 → train,
    * < 90 → val, else test. */
  val TrainUpto = 80
  val ValUpto = 90

  /** §2.159 leakage-free split construction: the CONSTRUCTIVE twin of
    * [[splitLeakage]] — instead of auditing a doc-level split for
    * near-dup straddle, assign each document the split of its §2.39
    * near-dup CLUSTER, bucketed by a deterministic hash of the cluster
    * id (no RNG, reproducible across runs and engines). Near-dups
    * share a cluster by construction, so a near-copy of a validation
    * doc CANNOT sit in train — the leakage class §2.139 reports is
    * structurally eliminated, which is exactly how production corpus
    * pipelines cut train/val/test (group-split on dedup clusters, not
    * documents).
    *
    * Scale shape: one hash join of the doc-sized cluster-label table
    * (computed once per crawl and persisted — the §2.97 precomputed-
    * frame contract) onto a row-local hash+bucket projection; no new
    * corpus-sized shuffle. Output is doc-grain (doc_id, cluster_id,
    * split). */
  def makeSplits(spark: SparkSession, dir: String): DataFrame = {
    val clusters = Pipeline.dedupClustersCached(spark, dir)
      .select("doc_id", "cluster_id")
    clusters
      .withColumn("bucket", pmod(
        hash64(concat_ws(":", lit("mk"), col("cluster_id"))), lit(100)))
      .withColumn("split",
        when(col("bucket") < TrainUpto, "train")
          .when(col("bucket") < ValUpto, "val")
          .otherwise("test"))
      .select("doc_id", "cluster_id", "split")
      .orderBy("doc_id")
  }

  def makeSplitsSql: String =
    s"""WITH c AS (SELECT doc_id, cluster_id
       |  FROM (${Pipeline.dedupClustersSql}) t),
       |b AS (SELECT doc_id, cluster_id,
       |    ${hash64Sql("concat_ws(':', 'mk', cluster_id)")} % 100 AS bucket
       |  FROM c)
       |SELECT doc_id, cluster_id,
       |  CASE WHEN bucket < $TrainUpto THEN 'train'
       |       WHEN bucket < $ValUpto THEN 'val'
       |       ELSE 'test' END AS split
       |FROM b ORDER BY doc_id""".stripMargin

  def splitLeakageSql: String =
    s"""WITH pairs AS (${graft.dedup.Dedup.minhashPairsSql()}),
       |tags AS (SELECT doc_id,
       |    ${hash64Sql("concat_ws(':', 'sp', doc_id)")} % 10 >= $ValFrom AS is_val
       |  FROM documents)
       |SELECT p.id_a, p.id_b, p.est_jaccard,
       |  CASE WHEN a.is_val THEN p.id_a ELSE p.id_b END AS val_doc,
       |  CASE WHEN a.is_val THEN p.id_b ELSE p.id_a END AS train_doc
       |FROM pairs p
       |JOIN tags a ON p.id_a = a.doc_id
       |JOIN tags b ON p.id_b = b.doc_id
       |WHERE a.is_val <> b.is_val
       |ORDER BY p.id_a, p.id_b""".stripMargin
}
