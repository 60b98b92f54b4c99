package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Embedding similarity — SURVEY.md §2 items 25–27.
  *
  * Cosine arithmetic is an explicit left-to-right double fold (the
  * compiled DotProductFold kernel) so Spark and the DuckDB oracle
  * produce bit-identical IEEE doubles — no reliance on
  * engine-internal SIMD/pairwise sums.
  *
  * Scale design: brute-force top-k broadcasts the (small) query set and
  * computes per-partition — one scan, no shuffle until the per-query
  * window (k rows per query). The LSH path buckets every vector once
  * (codegen'd projection against deterministic hyperplanes), then joins
  * within buckets — candidate counts drop from O(n·q) to O(q·bucket).
  * Embedding-cosine dedup blocks on the same LSH bucket.
  */
object Ann {

  /** Sequential-fold dot product of two numeric arrays, in double —
    * the native [[graft.functions.DotProductFold]] kernel: identical
    * IEEE operations in identical order to the aggregate(zip_with(…))
    * fold it replaces (and to the DuckDB list_reduce oracle), so
    * results stay bit-identical while the per-element interpretation
    * cost disappears from every cosine hot path. */
  def dotCol(a: Column, b: Column): Column =
    graft.functions.native.dot_product_fold(a, b)

  def dotSql(a: String, b: String): String =
    s"list_reduce(list_prepend(CAST(0 AS DOUBLE), " +
      s"list_transform(generate_series(1, len($a)), " +
      s"i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))), (x, y) -> x + y)"

  def normCol(a: Column): Column = sqrt(dotCol(a, a))

  def normSql(a: String): String = s"sqrt(${dotSql(a, a)})"

  /** vec table with precomputed norm. */
  private def vecs(embeddings: DataFrame): DataFrame =
    embeddings.select(col("vec_id"), col("label"), col("embedding"),
      normCol(col("embedding")).as("nrm"))

  private val vecsSql: String =
    s"SELECT vec_id, label, embedding, ${normSql("embedding")} AS nrm FROM embeddings"

  /** §2.25 embedding-cosine near-dup pairs, blocked by LSH bucket.
    *
    * Blocking on a semantic column like `label` is quadratic within a
    * hot label at scale; the hyperplane bucket bounds block population
    * by similarity structure instead — cosine-near vectors land in the
    * same sign-bucket with high probability, and each vector joins
    * exactly one bucket. Same join shape, 100-TB-safe key when
    * `planes` follows [[planesFor]] (≈ log₂(n/targetBucket)). */
  def embedCosinePairs(embeddings: DataFrame, minCos: Double = 0.25,
      planes: Int = DefaultPlanes): DataFrame = {
    val v = vecs(embeddings).withColumn("bucket", bucketCol(planes))
    val a = v.select(col("bucket"), col("vec_id").as("id_a"),
      col("embedding").as("ea"), col("nrm").as("na"))
    val b = v.select(col("bucket"), col("vec_id").as("id_b"),
      col("embedding").as("eb"), col("nrm").as("nb"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine", round(dotCol(col("ea"), col("eb")) / (col("na") * col("nb")), 6))
      .filter(col("cosine") >= minCos)
      .select("bucket", "id_a", "id_b", "cosine")
      .orderBy("bucket", "id_a", "id_b")
  }

  def embedCosinePairsSql(minCos: Double = 0.25,
      planes: Int = DefaultPlanes): String =
    s"""WITH v AS (SELECT vec_id, embedding, nrm, ${bucketSql(planes)} AS bucket
       |  FROM ($vecsSql) t0)
       |SELECT a.bucket, a.vec_id AS id_a, b.vec_id AS id_b,
       |  round(${dotSql("a.embedding", "b.embedding")} / (a.nrm * b.nrm), 6) AS cosine
       |FROM v a JOIN v b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
       |WHERE round(${dotSql("a.embedding", "b.embedding")} / (a.nrm * b.nrm), 6) >= $minCos
       |ORDER BY a.bucket, id_a, id_b""".stripMargin

  /** §2.26 brute-force cosine top-k for query vectors (vec_id < nq). */
  def bruteForceTopK(embeddings: DataFrame, nq: Int = 5, k: Int = 10): DataFrame = {
    val v = vecs(embeddings)
    // limit(nq) is a no-op on values (the filter already caps rows at
    // nq) but MARKS the bound structurally, so the plan gate can prove
    // the broadcast below is query-sized, not data-sized (PlanGate r11)
    val q = v.filter(col("vec_id") < nq).limit(nq)
      .select(col("vec_id").as("q_id"), col("embedding").as("qe"), col("nrm").as("qn"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(desc("cosine"), asc("vec_id"))
    v.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .withColumn("cosine", round(dotCol(col("qe"), col("embedding")) / (col("qn") * col("nrm")), 6))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select("q_id", "rk", "vec_id", "cosine")
      .orderBy("q_id", "rk")
  }

  def bruteForceTopKSql(nq: Int = 5, k: Int = 10): String =
    s"""WITH v AS ($vecsSql),
       |q AS (SELECT vec_id AS q_id, embedding AS qe, nrm AS qn FROM v WHERE vec_id < $nq),
       |scored AS (SELECT q.q_id, v.vec_id,
       |    round(${dotSql("q.qe", "v.embedding")} / (q.qn * v.nrm), 6) AS cosine
       |  FROM v JOIN q ON v.vec_id != q.q_id)
       |SELECT q_id, rk, vec_id, cosine FROM (
       |  SELECT q_id, vec_id, cosine,
       |    row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rk
       |  FROM scored) t
       |WHERE rk <= $k ORDER BY q_id, rk""".stripMargin

  /** §2.120 int8 scalar-quantized brute-force top-k (the FAISS-SQ8
    * memory-bandwidth path): every vector is symmetric-quantized once
    * (scale = 127/max|xᵢ|, components round half-away-from-zero — the
    * compiled [[graft.functions.QuantizeI8]] kernel), and scoring runs
    * entirely on the quantized representation — cosine = q_a·q_b /
    * (|q_a||q_b|), exact integer dots folded in the DotProductFold
    * kernel. At 100 TB of float32 embeddings the scan is memory-bound,
    * and the int8 codebook is 4× smaller — the standard first rung of
    * the ANN compression ladder (before PQ), here with its recall
    * MEASURED against the exact scan (AnnRecallSpec) instead of
    * assumed. Same plan shape as [[bruteForceTopK]]: nq query rows
    * broadcast against one linear scan, per-query top-k window. */
  def sq8TopK(embeddings: DataFrame, nq: Int = 5, k: Int = 10): DataFrame = {
    val v = embeddings.select(col("vec_id"),
      graft.functions.native.quantize_i8(col("embedding")).as("q"))
      .withColumn("qn", sqrt(dotCol(col("q"), col("q"))))
    val q = v.filter(col("vec_id") < nq).limit(nq) // structural bound mark
      .select(col("vec_id").as("q_id"), col("q").as("qq"), col("qn").as("qqn"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(desc("qcosine"), asc("vec_id"))
    v.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .withColumn("qcosine",
        round(dotCol(col("qq"), col("q")) / (col("qqn") * col("qn")), 6))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select("q_id", "rk", "vec_id", "qcosine")
      .orderBy("q_id", "rk")
  }

  def sq8TopKSql(nq: Int = 5, k: Int = 10): String =
    s"""WITH e AS (SELECT vec_id,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ed FROM embeddings),
       |m AS (SELECT vec_id, ed,
       |    list_max(list_transform(ed, x -> abs(x))) AS mx FROM e),
       |v AS (SELECT vec_id, list_transform(ed,
       |    x -> round(x * (CASE WHEN mx = 0 THEN 0.0 ELSE 127.0 / mx END))) AS q
       |  FROM m),
       |n AS (SELECT vec_id, q, sqrt(${dotSql("q", "q")}) AS qn FROM v),
       |qs AS (SELECT vec_id AS q_id, q AS qq, qn AS qqn FROM n WHERE vec_id < $nq),
       |scored AS (SELECT qs.q_id, n.vec_id,
       |    round(${dotSql("qs.qq", "n.q")} / (qs.qqn * n.qn), 6) AS qcosine
       |  FROM n JOIN qs ON n.vec_id != qs.q_id)
       |SELECT q_id, rk, vec_id, qcosine FROM (
       |  SELECT q_id, vec_id, qcosine,
       |    row_number() OVER (PARTITION BY q_id ORDER BY qcosine DESC, vec_id) AS rk
       |  FROM scored) t
       |WHERE rk <= $k ORDER BY q_id, rk""".stripMargin

  // ---- deterministic random-hyperplane LSH ----

  /** Default plane count for the test corpus (sf ≤ 0.1: n ≈ 5000
    * vectors → 2⁸ = 256 buckets ≈ 20 vectors/bucket). */
  val DefaultPlanes = 8
  val Dim = 64

  /** Sizing rule for the plane count: within-bucket joins generate
    * O(n²/2^planes) candidate pairs, so buckets must GROW with n —
    * planes ≈ log₂(n / targetBucket) holds the expected bucket
    * population (and so per-bucket join cost) constant as the corpus
    * scales. The MinHash band analysis (candidates bounded by near-dup
    * density) does NOT apply to sign buckets: with planes fixed, pair
    * counts creep quadratically. At 100 TB (n ≈ 10¹⁰, targetBucket
    * 1024) this gives ~23 planes. Adding a plane only REMOVES pairs
    * from a bucket (bucket(p+1) refines bucket(p) — coefficients
    * depend on the plane index alone), so recall tuning is monotone:
    * raise planes until the candidate count fits the budget. */
  def planesFor(n: Long, targetBucket: Long = 1024): Int = {
    val ratio = math.max(1.0, n.toDouble / targetBucket)
    math.min(62, math.max(1, math.ceil(math.log(ratio) / math.log(2.0)).toInt))
  }

  /** PURE-INTEGER [[planesFor]] for oracle-replayed plans: the float
    * log/ceil lands exactly on integer boundaries at power-of-two
    * ratios, where libm-vs-java rounding could disagree by one plane —
    * and one plane is a completely different bucketing. This ladder is
    * comparisons only: the smallest p ≥ 1 with n ≤ target·2^p, capped
    * at `maxPlanes` (16 covers n ≤ 4.2 M at target 64; oracle corpora
    * are ≤ 10⁵, and the cap only re-admits the quadratic creep past
    * it). [[initPlanesSql]] is the same ladder as SQL. */
  def initPlanesFor(n: Long, target: Long = 64L, maxPlanes: Int = 16): Int = {
    var p = 1
    while (p < maxPlanes && (target << p) < n) p += 1
    p
  }

  /** The [[initPlanesFor]] ladder over a column named `cnt`. */
  def initPlanesSql(target: Long = 64L, maxPlanes: Int = 16): String =
    (1 until maxPlanes).map(p => s"WHEN cnt <= ${target << p} THEN $p")
      .mkString("CASE ", " ", s" ELSE $maxPlanes END")

  /** [[bucketSql]] with the plane count read from a COLUMN `plRef`
    * (the [[initPlanesSql]] output cross-joined in) instead of baked
    * into the text: all `maxPlanes` sign bits are computed, bits at
    * p ≥ plRef contribute 0 — so one static SQL string replays any
    * data-dependent plane choice ≤ maxPlanes. `offset` shifts the LCG
    * plane index (NOT the bit position) for independent tables,
    * mirroring [[bucketCol]]. */
  def bucketSqlDynamic(plRef: String, maxPlanes: Int = 16,
      offset: Int = 0): String =
    s"""CAST(list_sum(list_transform(generate_series(0, ${maxPlanes - 1}), p ->
      CASE WHEN p < $plRef AND list_reduce(list_prepend(CAST(0 AS DOUBLE),
        list_transform(generate_series(1, $Dim),
          d -> ${coefExpr(s"(p + $offset)", "(d - 1)")} * CAST(embedding[d] AS DOUBLE))), (x, y) -> x + y) > 0
      THEN (CAST(1 AS BIGINT) << p) ELSE 0 END)) AS BIGINT)"""

  /** Pseudo-random plane coefficient c(p,d) in [-0.5, 0.5), identical
    * in SQL: LCG on index p*Dim+d. CASTs keep the multiply in 64-bit on
    * BOTH engines (Spark int math silently wraps at 32 bits). */
  private def coefExpr(p: String, d: String): String =
    s"(((CAST(1103515245 AS BIGINT) * ($p * $Dim + $d) + 12345) % 2147483647) / 2147483647.0 - 0.5)"

  /** Bucket id: sign bits of `planes` hyperplane projections (native
    * expression — the HOF formulation interprets ~planes×dim steps per
    * row; see graft.functions.HyperplaneBucket). */
  def bucketCol(planes: Int = DefaultPlanes, offset: Int = 0): Column =
    graft.functions.native.hyperplane_bucket(col("embedding"), planes, Dim,
      offset)

  def bucketSql(planes: Int = DefaultPlanes): String =
    s"""CAST(list_sum(list_transform(generate_series(0, ${planes - 1}), p ->
      CASE WHEN list_reduce(list_prepend(CAST(0 AS DOUBLE),
        list_transform(generate_series(1, $Dim),
          d -> ${coefExpr("p", "(d - 1)")} * CAST(embedding[d] AS DOUBLE))), (x, y) -> x + y) > 0
      THEN (CAST(1 AS BIGINT) << p) ELSE 0 END)) AS BIGINT)"""

  /** §2.27 LSH-bucketed ANN: bucket every vector once, search within
    * the query's bucket only. */
  def lshTopK(embeddings: DataFrame, nq: Int = 5, k: Int = 5,
      planes: Int = DefaultPlanes): DataFrame = {
    val v = vecs(embeddings).withColumn("bucket", bucketCol(planes))
    val q = v.filter(col("vec_id") < nq)
      .select(col("vec_id").as("q_id"), col("embedding").as("qe"),
        col("nrm").as("qn"), col("bucket"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(desc("cosine"), asc("vec_id"))
    v.join(broadcast(q), Seq("bucket"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cosine", round(dotCol(col("qe"), col("embedding")) / (col("qn") * col("nrm")), 6))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select("q_id", "bucket", "rk", "vec_id", "cosine")
      .orderBy("q_id", "rk")
  }

  // ---- multi-probe (round 5, §2.112) ----

  /** Probe budget and flip-plane bound for [[lshTopKMultiProbe]].
    * `MaxFlipPlanes` caps perturbation enumeration to the L
    * lowest-margin planes (2^L − 1 candidate masks) — the planes a
    * near neighbor is actually likely to disagree on are exactly the
    * low-|projection| ones, and a FIXED L keeps the enumeration
    * constant-size however many planes the corpus needs (23 planes at
    * 100 TB would make full 2^planes enumeration impossible). */
  val DefaultProbes = 16
  val MaxFlipPlanes = 6

  /** Plane coefficient c(p,d) — [[coefExpr]] evaluated ahead of time
    * (exact: the integer products stay far below 2^53, and both
    * engines perform the identical % and ÷ on the same values). */
  private def coef(p: Int, d: Int): Double =
    ((1103515245L * (p * Dim + d) + 12345L) % 2147483647L) / 2147483647.0 - 0.5

  /** §2.112 multi-probe sign-LSH ANN: single-probe recall at 8 planes
    * is floored at (1 − θ/π)⁸ (≈ 0.43 at θ = 18°; measured in
    * AnnRecallSpec) because ONE disagreeing sign bit hides the
    * neighbor. Instead of coarsening the buckets (which re-grows the
    * within-bucket join), probe the Q − 1 most likely neighboring
    * buckets as well: rank perturbation masks over the L
    * lowest-|margin| planes by the summed margin of their flipped
    * planes (the standard multi-probe order — flipping a low-margin
    * plane is cheap in probability), and search bucket ⊕ mask for the
    * top Q − 1 masks. All probed buckets are distinct, so candidate
    * sets are disjoint — no dedup shuffle — and the probe table stays
    * ≤ nq·Q rows, broadcast to the one scan of the corpus. Candidates
    * grow monotonically in Q (ranked masks are a prefix), so recall is
    * a monotone knob exactly like `planes`. Margin arithmetic is the
    * same compiled fold as the bucket kernel, so the DuckDB oracle
    * ranks identical doubles. */
  def lshTopKMultiProbe(embeddings: DataFrame, nq: Int = 5, k: Int = 5,
      planes: Int = DefaultPlanes, nProbes: Int = DefaultProbes,
      flipPlanes: Int = MaxFlipPlanes): DataFrame = {
    val L = math.min(flipPlanes, planes)
    require(nProbes >= 1 && nProbes <= (1 << L),
      s"nProbes=$nProbes needs 1..${1 << L} (L=$L flip planes)")
    val v = vecs(embeddings).withColumn("bucket", bucketCol(planes))
    val q0 = v.filter(col("vec_id") < nq).limit(nq) // structural bound mark
      .select(col("vec_id").as("q_id"), col("embedding").as("qe"),
        col("nrm").as("qn"), col("bucket"))
    // per-plane |projection| margins, sorted ascending — query side
    // only (nq rows), literal coefficient arrays, compiled fold
    val margins = array((0 until planes).map { p =>
      val cs = (0 until Dim).map(d => coef(p, d))
      struct(abs(dotCol(typedLit(cs), col("qe"))).as("m"), lit(p).as("p"))
    }: _*)
    val q1 = q0.withColumn("_sorted", array_sort(margins))
    // ranked masks: subset s of sorted positions 1..L; score folds the
    // flipped margins in position order (identical to the oracle's
    // full fold — its +0.0 identity terms drop out exactly); mask sums
    // the distinct plane bits (integer-exact)
    val subsets = (1 until (1 << L)).map { s =>
      val bits = (0 until L).filter(i => (s >> i & 1) == 1)
      val score = bits.foldLeft(lit(0.0): Column)((acc, i) =>
        acc + expr(s"element_at(_sorted, ${i + 1}).m"))
      val mask = bits.map(i =>
          expr(s"shiftleft(CAST(1 AS BIGINT), element_at(_sorted, ${i + 1}).p)"))
        .reduce[Column](_ + _)
      struct(score.as("sc"), lit(s).as("s"), mask.as("mask"))
    }
    val q2 = q1.withColumn("_ranked", array_sort(array(subsets: _*)))
    val probeCols = (0 until nProbes).map { i =>
      if (i == 0) col("bucket")
      else col("bucket").bitwiseXOR(expr(s"element_at(_ranked, $i).mask"))
    }
    val qp = q2.withColumn("pb", explode(array(probeCols: _*)))
      .select(col("q_id"), col("qe"), col("qn"), col("pb"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(desc("cosine"), asc("vec_id"))
    v.join(broadcast(qp), col("bucket") === col("pb"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cosine", round(dotCol(col("qe"), col("embedding")) / (col("qn") * col("nrm")), 6))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select("q_id", "bucket", "rk", "vec_id", "cosine")
      .orderBy("q_id", "rk")
  }

  def lshTopKMultiProbeSql(nq: Int = 5, k: Int = 5,
      planes: Int = DefaultPlanes, nProbes: Int = DefaultProbes,
      flipPlanes: Int = MaxFlipPlanes): String = {
    val L = math.min(flipPlanes, planes)
    s"""WITH v AS (SELECT vec_id, embedding, nrm, ${bucketSql(planes)} AS bucket
       |  FROM ($vecsSql) t0),
       |q AS (SELECT vec_id AS q_id, embedding AS qe, nrm AS qn, bucket
       |  FROM v WHERE vec_id < $nq),
       |proj AS (SELECT q_id, p,
       |    abs(list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |      list_transform(generate_series(1, $Dim),
       |        d -> ${coefExpr("p", "(d - 1)")} * CAST(qe[d] AS DOUBLE))), (x, y) -> x + y)) AS m
       |  FROM q, unnest(generate_series(0, ${planes - 1})) AS t(p)),
       |srt AS (SELECT q_id, list(m ORDER BY m, p) AS ml, list(p ORDER BY m, p) AS pl
       |  FROM proj GROUP BY q_id),
       |ranked AS (SELECT q_id, s,
       |    list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(generate_series(1, $L),
       |      i -> CASE WHEN ((s >> (i - 1)) & 1) = 1 THEN ml[i] ELSE CAST(0 AS DOUBLE) END)),
       |      (x, y) -> x + y) AS sc,
       |    list_sum(list_transform(generate_series(1, $L),
       |      i -> CASE WHEN ((s >> (i - 1)) & 1) = 1 THEN CAST(1 AS BIGINT) << pl[i] ELSE CAST(0 AS BIGINT) END)) AS mask
       |  FROM srt, unnest(generate_series(1, ${(1 << L) - 1})) AS t(s)),
       |ord AS (SELECT q_id, mask,
       |    row_number() OVER (PARTITION BY q_id ORDER BY sc, s) AS rk FROM ranked),
       |pr AS (SELECT q_id, bucket AS pb FROM q
       |  UNION ALL
       |  SELECT o.q_id, xor(q.bucket, o.mask) AS pb
       |  FROM ord o JOIN q ON o.q_id = q.q_id WHERE o.rk <= ${nProbes - 1}),
       |scored AS (SELECT q.q_id, v.bucket, v.vec_id,
       |    round(${dotSql("q.qe", "v.embedding")} / (q.qn * v.nrm), 6) AS cosine
       |  FROM pr JOIN v ON v.bucket = pr.pb
       |    JOIN q ON pr.q_id = q.q_id
       |  WHERE v.vec_id != q.q_id)
       |SELECT q_id, bucket, rk, vec_id, cosine FROM (
       |  SELECT q_id, bucket, vec_id, cosine,
       |    row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rk
       |  FROM scored) t
       |WHERE rk <= $k ORDER BY q_id, rk""".stripMargin
  }

  def lshTopKSql(nq: Int = 5, k: Int = 5, planes: Int = DefaultPlanes): String =
    s"""WITH v AS (SELECT vec_id, embedding, nrm, ${bucketSql(planes)} AS bucket
       |  FROM ($vecsSql) t0),
       |q AS (SELECT vec_id AS q_id, embedding AS qe, nrm AS qn, bucket
       |  FROM v WHERE vec_id < $nq),
       |scored AS (SELECT q.q_id, v.bucket, v.vec_id,
       |    round(${dotSql("q.qe", "v.embedding")} / (q.qn * v.nrm), 6) AS cosine
       |  FROM v JOIN q ON v.bucket = q.bucket AND v.vec_id != q.q_id)
       |SELECT q_id, bucket, rk, vec_id, cosine FROM (
       |  SELECT q_id, bucket, vec_id, cosine,
       |    row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rk
       |  FROM scored) t
       |WHERE rk <= $k ORDER BY q_id, rk""".stripMargin
}
