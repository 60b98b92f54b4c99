package graft.ann

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Embedding-column statistics and kNN classification —
  * SURVEY.md §2 items 168–169.
  *
  * The feature-store half of the ANN family: before a 100 TB embedding
  * corpus is indexed (IVF/PQ/SQ8 all assume roughly-centered inputs),
  * the pipeline needs per-dimension moments for whitening/clipping and
  * a label-transfer primitive (kNN vote) for weak supervision.
  */
object Embed {

  /** §2.168 per-dimension mean/std/min/max over the embedding column.
    *
    * posexplode → ONE map-side-combined groupBy on the (tiny) dim key:
    * 64 groups regardless of corpus size, so the reduce side is
    * constant and the scan stays the only data-proportional stage. The
    * sums fold in double; output rounded 4 dp so Spark's partial-agg
    * ordering and DuckDB's sequential sum agree. */
  def embedStats(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(posexplode(col("embedding")).as(Seq("dim", "xf")))
      .select(col("dim"), col("xf").cast("double").as("x"))
      .groupBy("dim")
      .agg(count(lit(1)).as("n"),
        round(avg("x"), 4).as("mean_x"),
        round(stddev("x"), 4).as("std_x"),
        round(min("x"), 4).as("min_x"),
        round(max("x"), 4).as("max_x"))
      .orderBy("dim")

  val embedStatsSql: String =
    """SELECT u.dim AS dim, count(*) AS n,
      |  round(avg(u.x), 4) AS mean_x, round(stddev(u.x), 4) AS std_x,
      |  round(min(u.x), 4) AS min_x, round(max(u.x), 4) AS max_x
      |FROM (SELECT unnest(list_transform(generate_series(1, len(embedding)),
      |        i -> {'dim': i - 1, 'x': CAST(embedding[i] AS DOUBLE)})) AS u
      |      FROM embeddings) t
      |GROUP BY u.dim ORDER BY u.dim""".stripMargin

  /** §2.169 kNN label transfer: for each query vector (vec_id < 1000 and vec_id % 29 = 0 — a FIXED query set: the corpus grows, the workload does not),
    * the majority label among its k=10 cosine-nearest neighbours
    * (ties: higher vote count, then smaller label). Same plan shape as
    * the brute top-k baseline — nq query rows broadcast against one
    * linear scan, per-query top-k window — plus a bounded per-query
    * majority window (≤ #labels rows per query). The scale path swaps
    * the scored CTE for the IVF-blocked candidates (ann/Ivf.scala)
    * without touching the vote. */
  def knnClassify(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val v = Tables.embeddings(spark, dir).select(col("vec_id"), col("label"),
      col("embedding"), Ann.normCol(col("embedding")).as("nrm"))
    // 35 = |{0, 29, ..., 986}|: the filter caps rows; limit marks the
    // bound structurally for the plan gate (PlanGate r11)
    val q = v.filter((col("vec_id") < 1000) && (col("vec_id") % 29 === 0))
      .limit(35)
      .select(col("vec_id").as("q_id"), col("label").as("true_label"),
        col("embedding").as("qe"), col("nrm").as("qn"))
    val wTop = Window.partitionBy(col("q_id"))
      .orderBy(desc("cosine"), asc("vec_id"))
    val topk = v.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .withColumn("cosine",
        round(Ann.dotCol(col("qe"), col("embedding")) / (col("qn") * col("nrm")), 6))
      .withColumn("rk", row_number().over(wTop))
      .filter(col("rk") <= k)
    val wVote = Window.partitionBy(col("q_id"))
      .orderBy(desc("n_votes"), asc("label"))
    topk.groupBy("q_id", "true_label", "label")
      .agg(count(lit(1)).as("n_votes"))
      .withColumn("vr", row_number().over(wVote))
      .filter(col("vr") === 1)
      .select(col("q_id"), col("label").as("pred_label"), col("n_votes"),
        col("true_label"), (col("label") === col("true_label")).as("correct"))
      .orderBy("q_id")
  }

  def knnClassifySql(k: Int = 10): String =
    s"""WITH v AS (SELECT vec_id, label, embedding,
       |    ${Ann.normSql("embedding")} AS nrm FROM embeddings),
       |q AS (SELECT vec_id AS q_id, label AS true_label, embedding AS qe, nrm AS qn
       |  FROM v WHERE vec_id < 1000 AND vec_id % 29 = 0),
       |topk AS (SELECT q_id, true_label, label FROM (
       |  SELECT q.q_id, q.true_label, v.label, v.vec_id,
       |    row_number() OVER (PARTITION BY q.q_id ORDER BY
       |      round(${Ann.dotSql("q.qe", "v.embedding")} / (q.qn * v.nrm), 6) DESC,
       |      v.vec_id) AS rk
       |  FROM v JOIN q ON v.vec_id != q.q_id) s WHERE rk <= $k),
       |votes AS (SELECT q_id, true_label, label, count(*) AS n_votes
       |  FROM topk GROUP BY 1, 2, 3)
       |SELECT q_id, label AS pred_label, n_votes, true_label,
       |  label = true_label AS correct
       |FROM (SELECT *, row_number() OVER (PARTITION BY q_id
       |    ORDER BY n_votes DESC, label) AS vr FROM votes) t
       |WHERE vr = 1 ORDER BY q_id""".stripMargin

  /** §2.217 embedding distribution drift (`embed_drift`): per-dimension
    * Welch t between the OLD half of the corpus (vec_id below the
    * midpoint — ingest order as batch proxy) and the NEW half, top-10
    * dimensions by |t| — the "did the upstream encoder change?" alarm
    * an embedding pipeline runs before re-using a tuned IVF/PQ index
    * on a new batch (§2.80's PSI watches scalar columns; this watches
    * the vector column per-dimension). ONE posexplode scan →
    * (dim, half) cells (2×64 whatever the corpus), per-dim Welch on
    * the cell frame, top-10 via ORDER BY |t| over ≤64 rows. */
  def embedDrift(spark: SparkSession, dir: String): DataFrame = {
    val v = Tables.embeddings(spark, dir)
    val mid = v.agg(((max("vec_id") + 1) / 2).cast("long").as("mid"))
    val cells = v.crossJoin(mid) // 1-row broadcast
      .select(when(col("vec_id") < col("mid"), 0).otherwise(1).as("half"),
        posexplode(col("embedding")).as(Seq("dim", "xf")))
      .select(col("half"), col("dim"), col("xf").cast("double").as("x"))
      .groupBy("dim", "half").agg(
        count(lit(1)).as("n"), avg("x").as("m"), var_samp(col("x")).as("v"))
    val byDim = cells.groupBy("dim").agg(
      max(when(col("half") === 0, col("n"))).as("n0"),
      max(when(col("half") === 0, col("m"))).as("m0"),
      max(when(col("half") === 0, col("v"))).as("v0"),
      max(when(col("half") === 1, col("n"))).as("n1"),
      max(when(col("half") === 1, col("m"))).as("m1"),
      max(when(col("half") === 1, col("v"))).as("v1"))
    byDim
      .withColumn("t_stat", round((col("m0") - col("m1")) /
        sqrt(col("v0") / col("n0") + col("v1") / col("n1")), 4))
      .select(col("dim"),
        round(col("m0"), 4).as("mean_old"),
        round(col("m1"), 4).as("mean_new"),
        round(col("m1") - col("m0"), 4).as("shift"),
        col("t_stat"))
      .orderBy(abs(col("t_stat")).desc, col("dim").asc)
      .limit(10)
  }

  val embedDriftSql: String =
    """WITH mid AS (SELECT CAST(floor((max(vec_id) + 1) / 2) AS BIGINT) AS mid
      |  FROM embeddings),
      |ex AS (SELECT half, u.dim AS dim, u.x AS x FROM (
      |    SELECT CASE WHEN e.vec_id < m.mid THEN 0 ELSE 1 END AS half,
      |      unnest(list_transform(generate_series(1, len(e.embedding)),
      |        i -> {'dim': i - 1, 'x': CAST(e.embedding[i] AS DOUBLE)})) AS u
      |    FROM embeddings e CROSS JOIN mid m) t),
      |cells AS (SELECT dim, half, count(*) AS n, avg(x) AS m,
      |    var_samp(x) AS v
      |  FROM ex GROUP BY 1, 2),
      |bydim AS (SELECT dim,
      |    max(CASE WHEN half = 0 THEN n END) AS n0,
      |    max(CASE WHEN half = 0 THEN m END) AS m0,
      |    max(CASE WHEN half = 0 THEN v END) AS v0,
      |    max(CASE WHEN half = 1 THEN n END) AS n1,
      |    max(CASE WHEN half = 1 THEN m END) AS m1,
      |    max(CASE WHEN half = 1 THEN v END) AS v1
      |  FROM cells GROUP BY 1)
      |SELECT dim, round(m0, 4) AS mean_old, round(m1, 4) AS mean_new,
      |  round(m1 - m0, 4) AS shift,
      |  round((m0 - m1) / sqrt(v0 / n0 + v1 / n1), 4) AS t_stat
      |FROM bydim
      |ORDER BY abs(round((m0 - m1) / sqrt(v0 / n0 + v1 / n1), 4)) DESC, dim
      |LIMIT 10""".stripMargin

  /** Power-iteration rounds for [[embedPca]] — enough for the dominant
    * eigenvector on any spectrum with a visible gap; FIXED so both
    * engines replay the identical arithmetic sequence. */
  val PcaIters = 20

  /** §2.230 `embed_pca`: dominant principal component of the embedding
    * cloud — the loading vector + its explained-variance share, the
    * embedding-health summary (a collapsed encoder concentrates
    * variance in one direction; PCA whitening and the IVF cell shapes
    * both start here). Method: distributed Gram matrix, then power
    * iteration on the driver over the BOUNDED 64×64 frame (the K×dim
    * Lloyd-centroid collect pattern — §2.73's driver-side exception).
    *
    * Scale shape: components quantize to exact e6-unit BIGINTs, and
    * the ONLY corpus-sized work is ONE scan through the mergeable
    * [[graft.functions.GramAgg]] — a compiled per-row dim² multiply-
    * accumulate into 128-bit integer cells, O(dim²) state per
    * partial, unconditionally overflow-proof. (The first cut was the
    * declarative double-posexplode → groupBy(j,k) → DECIMAL(38,0)
    * sums: same exact integers, but a 64² row multiplier through
    * BigDecimal hash-agg updates — 23.3 s at sf1, the slowest plan
    * in the suite; the aggregate runs the identical mathematics in
    * 0.4 s. The DuckDB oracle keeps the HUGEINT-sum formulation —
    * same integers either way.) Everything after is arithmetic on
    * ≤4 096 numbers.
    *
    * Determinism: the centered covariance n·S − sⱼsₖ is EXACT integer
    * arithmetic; the power iteration is pure IEEE add/mul/div/sqrt in
    * a FIXED order (k-ascending dot products, j-ascending norms), so
    * the Scala fold and the DuckDB ordered-list_sum replay (list_sum
    * folds left in list order — verified) produce BIT-IDENTICAL
    * doubles, no rounding tricks needed until the 6 dp display. Sign
    * is canonicalized on the largest-|loading| dimension (ties →
    * lowest j). */
  def embedPca(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir).select(expr(
      "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT))")
      .as("e"))
    val cells = e.agg(graft.functions.GramAgg.gram_agg(col("e")).as("g"))
      .head().getSeq[String](0)
    val n = BigInt(cells.head)
    // layout: [count, s_0..s_{d-1}, g_00..g_{d-1 d-1}]
    val dim = math.round(math.sqrt((cells.length - 1).toDouble + 0.25) - 0.5)
      .toInt // solves d + d² = len − 1
    val sums = Array.tabulate(dim)(j => BigInt(cells(1 + j)))
    val gram = Array.tabulate(dim, dim)((j, k) =>
      BigInt(cells(1 + dim + j * dim + k)))
    // centered covariance scaled by n² (scale cancels in the
    // eigenvector and in the variance SHARE)
    val c = Array.tabulate(dim, dim) { (j, k) =>
      (n * gram(j)(k) - sums(j) * sums(k)).toDouble
    }
    var v = Array.fill(dim)(1.0 / 8.0) // unit for dim=64
    for (_ <- 1 to PcaIters) {
      val w = Array.tabulate(dim)(j =>
        (0 until dim).foldLeft(0.0)((acc, k) => acc + c(j)(k) * v(k)))
      val norm = math.sqrt(w.foldLeft(0.0)((acc, x) => acc + x * x))
      // zero-covariance degenerate (all-equal or single vector): the
      // iterate is the fixed point — 0/0 would NaN the loadings
      if (norm > 0.0) v = w.map(_ / norm)
    }
    val cv = Array.tabulate(dim)(j =>
      (0 until dim).foldLeft(0.0)((acc, k) => acc + c(j)(k) * v(k)))
    val lambda = (0 until dim).foldLeft(0.0)((acc, j) => acc + v(j) * cv(j))
    val trace = (0 until dim).foldLeft(0.0)((acc, j) => acc + c(j)(j))
    val jmax = (0 until dim).minBy(j => (-math.abs(v(j)), j))
    val sg = if (v(jmax) < 0) -1.0 else 1.0
    // round exactly like DuckDB's round(x, 6): HALF_UP (= half away
    // from zero) on the EXACT binary value — math.rint is HALF_EVEN
    // and Spark's round() uses the shortest decimal string (the
    // §2.224 trap); this helper matches the oracle by construction
    def r6(x: Double): Double = new java.math.BigDecimal(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    val share = r6(if (trace == 0.0) 0.0 else lambda / trace)
    import spark.implicits._
    (0 until dim).map(j => (j, r6(sg * v(j)), share))
      .toDF("dim", "loading", "explained_share")
  }

  val embedPcaSql: String = {
    // every per-iteration CTE is MATERIALIZED: w_t is referenced by
    // both n_t and v_t, so inlining doubles the subtree per level —
    // 2^20 blowup (measured: 9 inlined iterations = 45 s, 20
    // materialized = instant); each is a 64-row frame
    val iters = (1 to PcaIters).map { t =>
      s"""w$t AS MATERIALIZED (SELECT c.j,
         |    list_sum(list(c.cd * v${t - 1}.val ORDER BY c.k)) AS wv
         |  FROM c JOIN v${t - 1} ON v${t - 1}.j = c.k GROUP BY c.j),
         |n$t AS MATERIALIZED (SELECT
         |    sqrt(list_sum(list(wv * wv ORDER BY j))) AS nm
         |  FROM w$t),
         |v$t AS MATERIALIZED (SELECT w$t.j,
         |    CASE WHEN nm > 0 THEN wv / nm ELSE v${t - 1}.val END AS val
         |  FROM w$t CROSS JOIN n$t
         |  JOIN v${t - 1} ON v${t - 1}.j = w$t.j)"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH q AS (SELECT vec_id, list_transform(embedding,
       |      x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS e
       |  FROM embeddings),
       |ex AS MATERIALIZED (SELECT vec_id, u.j AS j, u.ej AS ej FROM (
       |    SELECT vec_id, unnest(list_transform(generate_series(1, len(e)),
       |      i -> {'j': i - 1, 'ej': e[i]})) AS u FROM q) t),
       |g AS MATERIALIZED (SELECT a.j, b.j AS k,
       |    sum(CAST(a.ej AS HUGEINT) * b.ej) AS s
       |  FROM ex a JOIN ex b USING (vec_id) GROUP BY 1, 2),
       |m AS MATERIALIZED (SELECT j AS mj, CAST(sum(ej) AS HUGEINT) AS sj,
       |    count(*) AS nn FROM ex GROUP BY 1),
       |c AS MATERIALIZED (SELECT g.j, g.k,
       |    CAST(a.nn * g.s - a.sj * b.sj AS DOUBLE) AS cd
       |  FROM g JOIN m a ON a.mj = g.j JOIN m b ON b.mj = g.k),
       |v0 AS (SELECT mj AS j, CAST(0.125 AS DOUBLE) AS val FROM m),
       |$iters,
       |cv AS (SELECT c.j,
       |    list_sum(list(c.cd * v$PcaIters.val ORDER BY c.k)) AS t
       |  FROM c JOIN v$PcaIters ON v$PcaIters.j = c.k GROUP BY c.j),
       |lam AS (SELECT list_sum(list(v.val * cv.t ORDER BY v.j)) AS l
       |  FROM v$PcaIters v JOIN cv ON cv.j = v.j),
       |tr AS (SELECT list_sum(list(cd ORDER BY j)) AS t FROM c
       |  WHERE j = k),
       |sg AS (SELECT CASE WHEN val < 0 THEN -1.0 ELSE 1.0 END AS s
       |  FROM v$PcaIters ORDER BY abs(val) DESC, j LIMIT 1)
       |SELECT v.j AS dim, round(sg.s * v.val, 6) AS loading,
       |  round(CASE WHEN tr.t = 0 THEN 0.0 ELSE lam.l / tr.t END, 6)
       |    AS explained_share
       |FROM v$PcaIters v CROSS JOIN sg CROSS JOIN lam CROSS JOIN tr
       |ORDER BY dim""".stripMargin
  }
}
