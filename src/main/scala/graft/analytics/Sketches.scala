package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** KMV set-operation estimates — SURVEY.md §2 item 175.
  *
  * Completes the KMV story (§2.46 gives |A| estimates): the k-minimum-
  * values sketches of two sets support UNION (k smallest of the merged
  * sketch — exactly the sketch of A∪B), and from the union sketch the
  * intersection/Jaccard follow by counting members present in both
  * input sketches (Beyer et al., "On Synopses for Distinct-Value
  * Estimation Under Multiset Operations", SIGMOD'07). Everything is
  * integer-hash arithmetic on ≤k-element arrays, so Spark and the
  * DuckDB oracle agree exactly.
  *
  * Scale shape: each sketch is ONE map-side-combined aggregate over
  * its filtered scan (constant k·8-byte state per partition); the
  * set algebra runs on two 1-row frames. The exact columns (the
  * calibration baseline) cost one user-grain groupBy — at 100 TB
  * you drop them and keep the sketches. */
object Sketches {

  val K = 64
  private val Norm = 1152921504606846976.0 // 2^60 — hash64 is 60-bit

  def kmvIntersect(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.KMinValues.kmin_values
    import graft.text.TextFunctions.hash64
    val ev = Tables.events(spark, dir)
    def sketch(t: String, as: String): DataFrame = ev
      .filter(col("event_type") === t)
      .agg(kmin_values(hash64(col("user_id").cast("string")), K).as(as))
    // exact baseline: one user-grain pass
    val exact = ev.filter(col("event_type").isin("click", "purchase"))
      .groupBy("user_id")
      .agg(max(when(col("event_type") === "click", 1).otherwise(0)).as("a"),
        max(when(col("event_type") === "purchase", 1).otherwise(0)).as("b"))
      .agg(sum("a").as("n_a_exact"), sum("b").as("n_b_exact"),
        sum(col("a") * col("b")).as("n_inter_exact"))
    sketch("click", "ka").crossJoin(sketch("purchase", "kb"))
      .withColumn("uk", slice(array_sort(array_union(col("ka"), col("kb"))), 1, K))
      .withColumn("rho",
        size(array_intersect(array_intersect(col("uk"), col("ka")), col("kb"))))
      .withColumn("est_union",
        when(size(col("uk")) < K, size(col("uk")).cast("double"))
          .otherwise(round(lit(K - 1) / (expr(s"try_element_at(uk, $K)") / Norm), 4)))
      .select(
        round(col("est_union"), 4).as("est_union"),
        round(col("rho") / size(col("uk")).cast("double"), 4).as("est_jaccard"),
        round(col("rho") / lit(K.toDouble) * col("est_union"), 4).as("est_intersect"))
      .crossJoin(broadcast(exact))
      .select("est_union", "est_jaccard", "est_intersect",
        "n_a_exact", "n_b_exact", "n_inter_exact")
  }

  val kmvIntersectSql: String = {
    import graft.text.TextFunctions.hash64Sql
    s"""WITH ha AS (SELECT DISTINCT ${hash64Sql("CAST(user_id AS VARCHAR)")} AS hv
       |    FROM events WHERE event_type = 'click'),
       |hb AS (SELECT DISTINCT ${hash64Sql("CAST(user_id AS VARCHAR)")} AS hv
       |    FROM events WHERE event_type = 'purchase'),
       |sa AS (SELECT list_slice(list_sort(list(hv)), 1, $K) AS ka FROM ha),
       |sb AS (SELECT list_slice(list_sort(list(hv)), 1, $K) AS kb FROM hb),
       |u AS (SELECT ka, kb,
       |    list_slice(list_sort(list_distinct(list_concat(ka, kb))), 1, $K) AS uk
       |  FROM sa, sb),
       |est AS (SELECT
       |    len(list_filter(uk, x -> list_contains(ka, x) AND list_contains(kb, x)))
       |      AS rho,
       |    len(uk) AS nu,
       |    CASE WHEN len(uk) < $K THEN CAST(len(uk) AS DOUBLE)
       |         ELSE round(${K - 1} / (uk[$K] / $Norm), 4) END AS est_union
       |  FROM u),
       |ex AS (SELECT
       |    CAST(sum(a) AS BIGINT) AS n_a_exact,
       |    CAST(sum(b) AS BIGINT) AS n_b_exact,
       |    CAST(sum(a * b) AS BIGINT) AS n_inter_exact
       |  FROM (SELECT user_id,
       |      max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS a,
       |      max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS b
       |    FROM events WHERE event_type IN ('click', 'purchase')
       |    GROUP BY user_id) t)
       |SELECT round(est_union, 4) AS est_union,
       |  round(rho * 1.0 / nu, 4) AS est_jaccard,
       |  round(rho / ${K.toDouble} * est_union, 4) AS est_intersect,
       |  n_a_exact, n_b_exact, n_inter_exact
       |FROM est, ex""".stripMargin
  }

  /** §2.193 Count-Min point estimates ([[graft.functions.CountMin]]):
    * ONE 4×1024 counter sketch over all click items, probed for the
    * exact top-10 items — estimate (min over the 4 row counters) vs
    * exact count, demonstrating the one-sided ≥-exact guarantee the
    * spec also pins corpus-wide. The sketch is a single map-side-
    * combined aggregate (32 KB state per partition, integer merges —
    * exact under any merge order, so the DuckDB oracle's group-by
    * register replay matches bit-for-bit); the probe is a broadcast
    * of the 1-row sketch onto the 10-row top list with codegen'd
    * element_at/least — no second corpus pass beyond the exact
    * baseline's own groupBy (which calibrates, and at 100 TB is the
    * thing you DROP, keeping only the sketch). */
  def cmsCounts(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.CountMin
    import graft.functions.CountMin.count_min
    import graft.text.TextFunctions.hash64
    val items = Tables.events(spark, dir)
      .filter(col("event_type") === "click")
      .select(get_json_object(col("props"), "$.k").as("item"))
    val sketch = items.agg(count_min(hash64(col("item"))).as("cnt"))
    val top = items.groupBy("item").agg(count(lit(1)).as("n_exact"))
      .orderBy(desc("n_exact"), asc("item")).limit(10)
    val probes = (0 until CountMin.D).map { i =>
      element_at(col("cnt"),
        (lit(i * CountMin.W) +
          shiftright(col("h"), CountMin.BitsPerRow * i)
            .bitwiseAND(lit(CountMin.W - 1)) + lit(1)).cast("int"))
    }
    top.withColumn("h", hash64(col("item")))
      .crossJoin(broadcast(sketch))
      .select(col("item"), col("n_exact"), least(probes: _*).as("cms_est"))
      .orderBy(desc("n_exact"), asc("item"))
  }

  val cmsCountsSql: String = {
    import graft.text.TextFunctions.hash64Sql
    val d = graft.functions.CountMin.D
    val w = graft.functions.CountMin.W
    val b = graft.functions.CountMin.BitsPerRow
    s"""WITH it AS (SELECT json_extract_string(props, '$$.k') AS item
       |    FROM events WHERE event_type = 'click'),
       |hv AS (SELECT item, ${hash64Sql("item")} AS h FROM it),
       |rws AS (SELECT unnest(generate_series(0, ${d - 1})) AS i),
       |cells AS (SELECT r.i AS i, (h >> ($b * r.i)) & ${w - 1} AS c,
       |    count(*) AS n
       |  FROM hv CROSS JOIN rws r GROUP BY 1, 2),
       |top AS (SELECT item, count(*) AS n_exact FROM it
       |  GROUP BY item ORDER BY n_exact DESC, item LIMIT 10),
       |th AS (SELECT item, n_exact, ${hash64Sql("item")} AS h FROM top)
       |SELECT t.item AS item, t.n_exact AS n_exact, min(c.n) AS cms_est
       |FROM th t JOIN cells c ON c.c = (t.h >> ($b * c.i)) & ${w - 1}
       |GROUP BY 1, 2
       |ORDER BY n_exact DESC, item""".stripMargin
  }

  /** §2.200 join-size estimation by Count-Min inner product (Cormode &
    * Muthukrishnan §4.2): |A ⋈_k B| = Σ_k a(k)·b(k), estimated as
    * min_i Σ_c rowA_i[c]·rowB_i[c] over two [[graft.functions.CountMin]]
    * sketches — one-sided ≥-exact, like the point queries. THE
    * pre-flight a 100 TB planner runs before committing to a join
    * strategy: two O(scan) sketch builds (32 KB each) replace
    * materializing the join to learn it explodes; the answer decides
    * broadcast vs shuffle vs salt. Here: clicks ⋈ purchases on
    * user_id, estimate vs exact (the exact needs the user-grain
    * groupBy the sketch avoids — kept as calibration). Integer
    * end-to-end; the inner product + row-min are codegen'd
    * zip_with/aggregate/least on the two 1-row frames. */
  def joinSizeEstimate(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.CountMin
    import graft.functions.CountMin.count_min
    import graft.text.TextFunctions.hash64
    val ev = Tables.events(spark, dir)
    def sk(t: String, as: String): DataFrame = ev
      .filter(col("event_type") === t)
      .agg(count_min(hash64(col("user_id").cast("string"))).as(as))
    val exact = ev.filter(col("event_type").isin("click", "purchase"))
      .groupBy("user_id")
      .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("c"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("p"))
      .agg(sum(col("c") * col("p")).as("exact_size"))
    val prod = zip_with(col("ca"), col("cb"), (x, y) => x * y)
    val rowSums = (0 until CountMin.D).map { i =>
      aggregate(slice(prod, i * CountMin.W + 1, CountMin.W),
        lit(0L), (acc, x) => acc + x)
    }
    sk("click", "ca").crossJoin(sk("purchase", "cb"))
      .select(least(rowSums: _*).as("est_size"))
      .crossJoin(broadcast(exact))
      .select(col("exact_size"), col("est_size"),
        round(col("est_size") / col("exact_size").cast("double"), 6)
          .as("blowup"))
  }

  val joinSizeEstimateSql: String = {
    import graft.text.TextFunctions.hash64Sql
    val d = graft.functions.CountMin.D
    val w = graft.functions.CountMin.W
    val b = graft.functions.CountMin.BitsPerRow
    def cells(t: String) =
      s"""SELECT r.i AS i, (h >> ($b * r.i)) & ${w - 1} AS c, count(*) AS n
         |  FROM (SELECT ${hash64Sql("CAST(user_id AS VARCHAR)")} AS h
         |      FROM events WHERE event_type = '$t') hv
         |  CROSS JOIN rws r GROUP BY 1, 2""".stripMargin
    s"""WITH rws AS (SELECT unnest(generate_series(0, ${d - 1})) AS i),
       |ca AS (${cells("click")}),
       |cb AS (${cells("purchase")}),
       |ip AS (SELECT ca.i, sum(ca.n * cb.n) AS s
       |  FROM ca JOIN cb ON ca.i = cb.i AND ca.c = cb.c GROUP BY ca.i),
       |est AS (SELECT CAST(min(s) AS BIGINT) AS est_size FROM ip),
       |ex AS (SELECT CAST(sum(c * p) AS BIGINT) AS exact_size
       |  FROM (SELECT user_id,
       |      sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c,
       |      sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS p
       |    FROM events WHERE event_type IN ('click', 'purchase')
       |    GROUP BY user_id) t)
       |SELECT exact_size, est_size,
       |  round(est_size / CAST(exact_size AS DOUBLE), 6) AS blowup
       |FROM est, ex""".stripMargin
  }
}
