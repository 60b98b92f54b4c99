package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** §2.131 PageRank over the user–item interaction graph — the
  * iterative-shuffle workload class (label propagation's weighted
  * sibling; the reference's events feed ranks dashboards, see
  * spotify-tracks-etl-portfolio's Metabase popularity boards).
  *
  * Graph: click events project to DISTINCT user↔item edges (item = the
  * `k` prop), undirected so no node dangles (every endpoint has ≥ 1
  * out-edge by construction — no rank mass leaks, no dangling-sum
  * correction pass needed). Rank iterates the standard damped update
  *
  *   r'(v) = (1−d)/N + d · Σ_{(u,v)∈E} r(u)/deg(u)
  *
  * a fixed `Iters` rounds from the uniform start.
  *
  * Scale shape: per iteration exactly ONE corpus-sized shuffle — ranks
  * (node-sized) hash-join onto edges by src and partial-sum map-side
  * into the dst groupBy. Edges are built once, projected to (src, dst,
  * deg) and persisted: the expensive distinct over raw events never
  * re-runs, and because every iteration shuffles edges by the SAME key,
  * a bucketed/pre-partitioned edge table makes every round's join
  * exchange-free on the big side (the §2.108 band-index contract
  * applied to graphs). A hot item (power-law degree) is splittable:
  * the join is a shuffle join, so AQE skew-split divides its edge
  * block, and the rank sum recombines in the map-side-combined
  * aggregation. Doubles: contributions are summed in engine-dependent
  * order, so ranks are compared at 6 dp — the tie-break orders on the
  * ROUNDED rank then node id, keeping ranking deterministic on both
  * engines.
  */
object Graph {

  val Damping = 0.85
  val Iters = 5

  /** Undirected distinct user↔item click edges: ("u<id>"|"i<k>"). */
  private def edges(spark: SparkSession, dir: String): DataFrame = {
    val uv = Tables.events(spark, dir)
      .filter(col("event_type") === "click")
      .select(concat(lit("u"), col("user_id")).as("u"),
        concat(lit("i"), get_json_object(col("props"), "$.k")).as("v"))
      .distinct()
    uv.select(col("u").as("src"), col("v").as("dst"))
      .unionAll(uv.select(col("v").as("src"), col("u").as("dst")))
  }

  /** Adjacency built once per (session, dir) and persisted — the loop
    * references it `Iters` times, and without the persist every round
    * re-scans events and re-runs the distinct (the §2.39 edges.cache
    * pattern, memoized so sibling consumers share; eviction/Bench-rep
    * clearing unpersists). */
  private val adjCache =
    new graft.MemoCache[(org.apache.spark.sql.DataFrame,
        org.apache.spark.sql.DataFrame, Long)](4)({ case (a, nd, _) =>
      a.unpersist(blocking = false); nd.unpersist(blocking = false)
    })

  /** Cached (src, dst, deg) adjacency + node list + node count —
    * shared by PageRank and label propagation (same cache key, so the
    * expensive events distinct builds once for both). */
  private def adjacency(spark: SparkSession, dir: String) =
    adjCache.getOrElseUpdate(spark, dir) {
      val e = edges(spark, dir)
      val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
      val a = e.join(deg, "src") // (src, dst, deg)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nd = deg.select(col("src").as("node")) // every node has deg ≥ 1
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      (a, nd, nd.count())
    }

  /** Final ranks of the item nodes after `Iters` damped rounds. */
  def itemPagerank(spark: SparkSession, dir: String): DataFrame = {
    val (adj, nodes, n) = adjacency(spark, dir)
    var ranks = nodes.withColumn("rank", lit(1.0 / n))
    for (_ <- 1 to Iters) {
      // undirected ⇒ every node occurs as a dst, so the contribution
      // sum already covers ALL nodes — no per-round join back to the
      // node list (5 joins gone from the plan on both engines)
      ranks = adj.join(ranks, col("src") === col("node"))
        .select(col("dst"), (col("rank") / col("deg")).as("c"))
        .groupBy("dst").agg(sum("c").as("s"))
        .select(col("dst").as("node"),
          (lit((1.0 - Damping) / n) + lit(Damping) * col("s")).as("rank"))
    }
    ranks.filter(col("node").startsWith("i"))
      .select(col("node").as("item"), round(col("rank"), 6).as("rank"))
      .orderBy(desc("rank"), asc("item"))
  }

  val itemPagerankSql: String = {
    val iters = (1 to Iters).map { t =>
      s"""r$t AS (SELECT dst AS node,
         |    (CAST(1.0 AS DOUBLE) - $Damping) / (SELECT n FROM nn)
         |      + $Damping * sum(rank / deg) AS rank
         |  FROM adj JOIN r${t - 1} ON adj.src = r${t - 1}.node
         |  GROUP BY dst)""".stripMargin
    }.mkString(",\n")
    s"""WITH uv AS (SELECT DISTINCT 'u' || CAST(user_id AS VARCHAR) AS u,
       |    'i' || CAST(json_extract_string(props, '$$.k') AS VARCHAR) AS v
       |  FROM events WHERE event_type = 'click'),
       |e AS (SELECT u AS src, v AS dst FROM uv
       |      UNION ALL SELECT v AS src, u AS dst FROM uv),
       |deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
       |adj AS (SELECT e.src, e.dst, deg.deg FROM e JOIN deg USING (src)),
       |nodes AS (SELECT src AS node FROM deg),
       |nn AS (SELECT count(*) AS n FROM nodes),
       |r0 AS (SELECT node, CAST(1.0 AS DOUBLE) / (SELECT n FROM nn) AS rank
       |       FROM nodes),
       |$iters
       |SELECT node AS item, round(rank, 6) AS rank FROM r$Iters
       |WHERE node LIKE 'i%'
       |ORDER BY round(rank, 6) DESC, item""".stripMargin
  }

  /** Synchronous label-propagation rounds (communities). */
  val LpIters = 3

  /** §2.146 label propagation community detection (Raghavan et al.
    * 2007, the synchronous variant): every node starts as its own
    * label; each round a node adopts the most frequent label among
    * its neighbors, ties broken by SMALLEST label — the
    * determinism-restoring tie-break that makes the usually-random LP
    * replayable on both engines. After `LpIters` rounds, communities
    * are reported by size. On the user↔item click graph this yields
    * item/user co-engagement clusters — the unsupervised sibling of
    * §2.39's connected components (which merge on ANY path; LP merges
    * on DENSE association, splitting bridge-connected clumps).
    *
    * Scale shape: per round ONE corpus-sized shuffle (labels ⋈ edges
    * by src, map-side-combined (dst, lbl) count — the §2.131 pattern),
    * then a dst-partitioned max window + min-label argmax over the
    * vote matrix (≤ edge count, hash-partitioned, hot nodes
    * AQE-splittable). Shares the persisted adjacency with PageRank —
    * the events distinct never re-runs. */
  def labelPropagation(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val (adj, nodes, _) = adjacency(spark, dir)
    var labels = nodes.withColumn("lbl", col("node"))
    for (_ <- 1 to LpIters) {
      val votes = adj.join(labels, col("src") === col("node"))
        .groupBy("dst", "lbl").agg(count(lit(1)).as("c"))
      labels = votes
        .withColumn("mx", max("c").over(Window.partitionBy("dst")))
        .filter(col("c") === col("mx"))
        .groupBy("dst").agg(min("lbl").as("lbl"))
        .select(col("dst").as("node"), col("lbl"))
    }
    labels.groupBy("lbl").agg(count(lit(1)).as("n_nodes"))
      .select(col("lbl").as("community"), col("n_nodes"))
      .orderBy(desc("n_nodes"), asc("community"))
  }

  val labelPropagationSql: String = {
    val rounds = (1 to LpIters).map { t =>
      s"""v$t AS (SELECT dst, lbl, count(*) AS c
         |  FROM adj JOIN l${t - 1} ON adj.src = l${t - 1}.node
         |  GROUP BY 1, 2),
         |m$t AS (SELECT dst, lbl, c, max(c) OVER (PARTITION BY dst) AS mx
         |  FROM v$t),
         |l$t AS (SELECT dst AS node, min(lbl) AS lbl FROM m$t
         |  WHERE c = mx GROUP BY 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH uv AS (SELECT DISTINCT 'u' || CAST(user_id AS VARCHAR) AS u,
       |    'i' || CAST(json_extract_string(props, '$$.k') AS VARCHAR) AS v
       |  FROM events WHERE event_type = 'click'),
       |e AS (SELECT u AS src, v AS dst FROM uv
       |      UNION ALL SELECT v AS src, u AS dst FROM uv),
       |deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
       |adj AS (SELECT e.src, e.dst FROM e),
       |nodes AS (SELECT src AS node FROM deg),
       |l0 AS (SELECT node, node AS lbl FROM nodes),
       |$rounds
       |SELECT lbl AS community, count(*) AS n_nodes FROM l$LpIters
       |GROUP BY 1 ORDER BY n_nodes DESC, community""".stripMargin
  }
}
