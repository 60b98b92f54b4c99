package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** §2.127 fuzzy matching via deletion-neighborhood blocking — the
  * entity-resolution join (near-identical customer names = probable
  * duplicate accounts; cf. the reference's keep-first dedup, which
  * only catches EXACT key repeats).
  *
  * A naive edit-distance join is all-pairs (O(n²) levenshtein calls —
  * dead at any scale). The SymSpell observation: two strings within
  * edit distance 1 share a member of their deletion neighborhoods
  * K(s) = {s} ∪ { s minus one char } — a substitution pair shares the
  * deletion at the differing position, an insert/delete pair puts the
  * shorter string itself in the longer one's neighborhood. So emitting
  * the ≤ len+1 neighborhood keys per string turns the edit-distance
  * predicate into an EQUI-join on key: hash-partitioned, linear in
  * n·len, with levenshtein verified only on candidate pairs (the
  * neighborhood guarantees NO false negatives; false positives — two
  * DIFFERENT deletions colliding, an edit-distance-2 pair — are
  * filtered by the exact check). The same index shape serves lookup
  * (probe one name's keys) and is how spell-checkers scale to 10⁹
  * dictionaries; here both sides are corpus-sized, the general case.
  */
object Fuzzy {

  /** All DISTINCT single-deletion variants plus the string itself,
    * via an exploded position sequence (codegen'd substring
    * arithmetic — no interpreted higher-order-function lambdas):
    * position −1 keeps the whole string, position i ≥ 0 removes the
    * (i+1)-th char. Deleting any char of a same-char run yields the
    * SAME variant, so only the first position of each run is kept
    * (s[i] ≠ s[i−1]) — on zero-padded ids this is what stops every
    * name from flooding its buckets with duplicate keys. */
  private[dedup] def withDeletionKeys(df: DataFrame, name: String): DataFrame =
    df.withColumn("pos", explode(sequence(lit(-1), length(col(name)) - 1)))
      .filter(col("pos") <= 0 ||
        col(name).substr(col("pos") + 1, lit(1)) =!=
          col(name).substr(col("pos"), lit(1)))
      .withColumn("bkey", when(col("pos") < 0, col(name))
        .otherwise(concat(
          col(name).substr(lit(1), col("pos")),
          col(name).substr(col("pos") + 2, length(col(name))))))
      .drop("pos")

  /** Customer pairs with levenshtein(name) ≤ 1, found without any
    * all-pairs comparison. */
  def fuzzyMatch(spark: SparkSession, dir: String): DataFrame = {
    // repartition the NARROW pre-explosion rows: the customer file
    // reads as a handful of splits, and without this the ×len key
    // explosion + shuffle write run at scan parallelism (3 tasks at
    // sf5) — one cheap exchange of (id, name) unlocks full width
    val c = Tables.customer(spark, dir).select(
      col("c_custkey").as("id"), col("c_name").as("name"))
      .repartition()
    val keys = withDeletionKeys(c, "name")
    // Pin SHUFFLE_HASH: the key frame is corpus-sized (n·len rows) but
    // derives its stats from the narrow customer scan, so the planner
    // broadcasts it at every tested SF — a 12 M-row broadcast at sf5
    // (OOM at real scale) whose probe side then runs at the SCAN's
    // parallelism (3 tasks; 75 s of the measured 77 s). Hash-
    // partitioning both sides restores full-width parallelism and is
    // the only plan that survives scale-up (the interval_overlap /
    // dedup_containment trap class).
    val cand = keys.alias("a")
      .join(keys.hint("shuffle_hash").alias("b"), Seq("bkey"))
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id").as("key_a"), col("b.id").as("key_b"),
        col("a.name").as("name_a"), col("b.name").as("name_b"))
    // verify BEFORE deduplicating: rejecting the (mostly dist-2)
    // collisions first means the dedup shuffle carries only TRUE
    // pairs, not every candidate. The bound-1 verifier decides via
    // one prefix + one suffix scan (O(len), allocation-free compiled
    // kernel) — measured ~20× over levenshtein(a, b, 1), and at
    // ~5 candidates per input row the verifier is the hot loop.
    cand.withColumn("dist",
        graft.functions.native.bounded_lev1(col("name_a"), col("name_b")))
      .filter(col("dist") >= 0)
      .dropDuplicates("key_a", "key_b")
      .orderBy("key_a", "key_b")
  }

  /** Round-13 oracle: replay the SAME deletion-neighborhood blocking
    * the engine uses instead of the brute all-pairs levenshtein join
    * (O(n²) ≈ 1.1 × 10¹⁰ distance calls at sf1 — never finished).
    * Completeness is the classic dist ≤ 1 argument: variants(x) =
    * {x} ∪ {x minus one char}; a substitution pair shares the
    * same-position deletion, an indel pair shares the shorter string
    * itself, an equal pair shares x. Exact levenshtein verifies
    * candidates only. Verified equal to the brute join at sf0.01/0.1;
    * sf1: 35.5 s for the 3.3 M genuine distance-1 pairs (TPC-H
    * digit-suffix names are distance-1 dense by construction). */
  val fuzzyMatchSql: String =
    """WITH v AS MATERIALIZED (SELECT c_custkey, c_name,
      |    unnest(list_prepend(c_name,
      |      list_transform(generate_series(1, length(c_name)),
      |        i -> substr(c_name, 1, i - 1) || substr(c_name, i + 1)))) AS var
      |  FROM customer),
      |cand AS (SELECT DISTINCT a.c_custkey AS ka, b.c_custkey AS kb
      |  FROM v a JOIN v b ON a.var = b.var AND a.c_custkey < b.c_custkey)
      |SELECT ka AS key_a, kb AS key_b,
      |  a.c_name AS name_a, b.c_name AS name_b,
      |  levenshtein(a.c_name, b.c_name) AS dist
      |FROM cand JOIN customer a ON ka = a.c_custkey
      |          JOIN customer b ON kb = b.c_custkey
      |WHERE levenshtein(a.c_name, b.c_name) <= 1
      |ORDER BY key_a, key_b""".stripMargin
}
