package graft.dq

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** §2.135 referential-integrity audit — the cross-TABLE complement of
  * the row-level expectation suite (§2.2 checks columns in one table;
  * the load contracts that actually break pipelines are the ones
  * BETWEEN tables): for each declared FK relationship, the orphan
  * count (child keys with no parent — a hard load-order/corruption
  * failure) and the childless-parent count (parents with no children —
  * legitimate but monitored coverage, e.g. customers who never
  * ordered). One output row per relationship with both rates and up to
  * 3 sample orphan keys (the §2.93 partial_unexpected_list shape).
  *
  * Scale shape: each relationship is two leftanti joins on the key —
  * the child side partial-aggregates to DISTINCT keys BEFORE the join
  * (the child table is fact-sized; its distinct key set is
  * parent-sized), so every join is dim×dim. Sample keys ride the same
  * aggregation as a sorted min-3 slice — no second scan. */
object Referential {

  private[graft] def rel(name: String, child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String): DataFrame = {
    val ck = child.select(col(childKey).as("k")).groupBy("k")
      .agg(count(lit(1)).as("n_rows"))
    val pk = parent.select(col(parentKey).as("k")).distinct()
    // ONE pass per side: child totals/orphans from ck⟕pk, parent
    // totals/childless from pk⟕ck — no separate count() scans, and the
    // orphan sample is the bounded O(3) §2.93 aggregate (never a
    // collect of every violator)
    val miss = col("hit").isNull
    val o = ck.join(pk.withColumn("hit", lit(1)), Seq("k"), "left")
      .agg(sum("n_rows").as("n_child_rows"),
        coalesce(sum(when(miss, col("n_rows"))), lit(0L)).as("n_orphan_rows"),
        count(when(miss, lit(1))).as("n_orphan_keys"),
        concat_ws(",", graft.functions.MinKStrings.min_k_strings(
          when(miss, col("k").cast("string")), 3)).as("sample_orphans"))
    val c = pk.join(ck.select("k").withColumn("has", lit(1)), Seq("k"), "left")
      .agg(count(lit(1)).as("n_parent_keys"),
        count(when(col("has").isNull, lit(1))).as("n_childless_parents"))
    o.crossJoin(c)
      .select(lit(name).as("relationship"),
        col("n_child_rows"), col("n_parent_keys"),
        col("n_orphan_rows"), col("n_orphan_keys"),
        col("n_childless_parents"),
        round(col("n_childless_parents").cast("double") /
          col("n_parent_keys").cast("double"), 6).as("childless_rate"),
        col("sample_orphans"))
  }

  def dqReferential(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    rel("lineitem.l_orderkey->orders", li, "l_orderkey", o, "o_orderkey")
      .unionByName(rel("orders.o_custkey->customer", o, "o_custkey", c, "c_custkey"))
      .orderBy("relationship")
  }

  val dqReferentialSql: String = {
    def relSql(name: String, child: String, ck: String,
        parent: String, pk: String): String =
      s"""SELECT '$name' AS relationship,
         |  (SELECT count(*) FROM $child) AS n_child_rows,
         |  (SELECT count(*) FROM $parent) AS n_parent_keys,
         |  coalesce((SELECT CAST(sum(n_rows) AS BIGINT) FROM
         |    (SELECT $ck AS k, count(*) AS n_rows FROM $child GROUP BY 1) t
         |    WHERE k NOT IN (SELECT $pk FROM $parent)), 0) AS n_orphan_rows,
         |  (SELECT count(*) FROM
         |    (SELECT DISTINCT $ck AS k FROM $child) t
         |    WHERE k NOT IN (SELECT $pk FROM $parent)) AS n_orphan_keys,
         |  (SELECT count(*) FROM
         |    (SELECT DISTINCT $pk AS k FROM $parent) t
         |    WHERE k NOT IN (SELECT $ck FROM $child)) AS n_childless_parents,
         |  round(CAST((SELECT count(*) FROM
         |      (SELECT DISTINCT $pk AS k FROM $parent) t
         |      WHERE k NOT IN (SELECT $ck FROM $child)) AS DOUBLE) /
         |    CAST((SELECT count(*) FROM $parent) AS DOUBLE), 6) AS childless_rate,
         |  coalesce((SELECT string_agg(k, ',' ORDER BY k) FROM
         |    (SELECT DISTINCT CAST($ck AS VARCHAR) AS k FROM $child
         |     WHERE $ck NOT IN (SELECT $pk FROM $parent)
         |     ORDER BY k LIMIT 3) t), '') AS sample_orphans""".stripMargin
    s"""${relSql("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey")}
       |UNION ALL
       |${relSql("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey")}
       |ORDER BY relationship""".stripMargin
  }
}
