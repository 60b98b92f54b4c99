package graft.dedup

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Chunk-blocked Hamming-distance pair join over DISTINCT signatures
  * with RECURSIVE hot-bucket splitting — the shared blocking engine
  * behind `dedup_simhash` and `mm_dedup`.
  *
  * Baseline scheme (rounds 1–4): explode each `totalBits`-bit signature
  * into `nChunks` chunks of `chunkBits`; the pigeonhole principle
  * (maxDist < nChunks) guarantees every pair within Hamming ≤ maxDist
  * agrees exactly on ≥1 chunk, so a self-equi-join on (chunk, value)
  * finds every qualifying pair with no all-pairs scan. Round 5 added
  * ONE level of outside-bits sub-splitting for buckets over `hotCap`.
  *
  * Round 13 redesign, after round 12 MEASURED the remaining quadratic
  * term (1.76 × 10⁹ unsplit candidates at sf5 vs ~4.5 M if chunk values
  * were uniform; sf5→sf20 grew 7.0× at 4× data): on a low-entropy
  * corpus the candidate blow-up is dominated by REPEATED signatures —
  * near-duplicate mass hashes to the same value, and m copies of one
  * signature cost m²/2 join candidates in every bucket they touch,
  * which no amount of re-blocking can spread (identical rows share
  * every sub-chunk). Two changes kill the n-growth at the root:
  *
  *  1. **Collapse to distinct signatures before blocking.** The
  *     equi-join runs on `SELECT DISTINCT sig`, so join work scales
  *     with signature entropy, not corpus size. Doc pairs come back at
  *     the end: qualifying (sig_a < sig_b) pairs join the (doc_id, sig)
  *     table twice (all cross-sig doc pairs qualify at the same
  *     Hamming distance), and identical-sig doc pairs (Hamming 0) come
  *     from a direct self-equi-join on sig — both expansions are
  *     output-bound by definition: every row they shuffle is an
  *     emitted answer pair.
  *  2. **Recursive constant-cell sub-splitting.** A bucket over
  *     `hotCap` re-keys its members on `maxDist + 1` cells of the bits
  *     outside the agreed prefix (pigeonhole again: ≤ maxDist
  *     differing bits over maxDist + 1 cells leave ≥1 cell that fully
  *     agrees), and the split REPEATS while buckets stay hot. Distinct
  *     signatures give the recursion a hard floor: members of a bucket
  *     agree on every pinned bit and are pairwise distinct, so a
  *     bucket at remaining width w holds ≤ 2^w rows — once
  *     2^w ≤ hotCap (or the cell layout can delete no further bits)
  *     no bucket can be hot and the level finalizes. For the 48-bit /
  *     12-bit-chunk / maxDist 3 layout the width ladder is
  *     36 → 27 → 21 → 18 → 15 → 12 → 9: at most 6 split levels ever,
  *     and benign corpora exit at level 0 with the exact single-key
  *     plan of rounds 1–4.
  *
  * Bucket identity is carried as one running `xxhash64` key folded per
  * level (narrow rows, uniform schema across levels, one self-join over
  * the union of finalized levels). A 64-bit key collision merely merges
  * two buckets — candidates are still filtered by the exact Hamming
  * predicate and deduplicated, so correctness never rests on the hash.
  *
  * Exactly-once emission moved from the round-5 first-matching-chunk
  * predicate to a DISTINCT over qualifying (sig_a, sig_b) pairs. The
  * predicate was the right call when pairs were doc pairs (the sf1
  * corpus emits 29 M of them; a DISTINCT there measured 166 s) — after
  * the collapse the DISTINCT input is qualifying DISTINCT-SIG pairs ×
  * ≤ nChunks shared buckets, orders of magnitude below the doc-pair
  * count it replaced, and dropping the predicate removes the per-level
  * outside-bits bookkeeping the recursion would otherwise carry.
  *
  * The only data-sized shuffles are the distinct, the leaf self-join,
  * and the output-bound expansions. Residual skew (one leaf bucket of
  * near-identical-but-distinct signatures) is ≤ hotCap rows by
  * construction except at the width floor, where it is ≤ 2^9 = 512.
  */
object ChunkBlocking {

  /** Default population cap above which a bucket re-keys on outside-bit
    * cells. 1024 bounds any leaf bucket's candidate term to ≤ ~0.5 M
    * pairs of DISTINCT signatures; measured at sf1/sf5 in SURVEY §6. */
  val HotBucketCap = 1024

  /** Cell width for splitting a `w`-bit remainder into `k` cells. */
  private def subBitsFor(w: Int, k: Int): Int = (w + k - 1) / k

  /** Remainder width bound after one split: deleting any one cell
    * leaves at most (k − 1) · subBits significant bits. */
  private def nextWidth(w: Int, k: Int): Int = (k - 1) * subBitsFor(w, k)

  /** A split level makes progress iff it can delete ≥1 bit. */
  private def canSplit(w: Int, k: Int): Boolean = w > 0 && nextWidth(w, k) < w

  /** Distinct signatures in a bucket are pairwise distinct within the
    * remaining `w` bits, so population ≤ 2^w — below this cap no
    * bucket can be hot and splitting is over. */
  private def fitsCap(w: Int, hotCap: Int): Boolean =
    w <= 62 && (1L << w) <= hotCap

  /** `v` with the `bits`-wide cell at static index `c` deleted: bits
    * above the cell shifted down into its place, bits below kept. */
  private def deleteCell(v: Column, c: Int, bits: Int): Column = {
    val hi = shiftleft(shiftright(v, (c + 1) * bits), c * bits)
    if (c == 0) hi else hi.bitwiseOR(v % lit(1L << (c * bits)))
  }

  /** One split level over hot rows (sig, key, ov): explode each row
    * into `k` (cell, value) coordinates folded into the running bucket
    * key, carrying the cell-deleted remainder for the next level. */
  private def splitLevel(hot: DataFrame, w: Int, k: Int, lvl: Int): DataFrame = {
    val sb = subBitsFor(w, k)
    val cells = array((0 until k).map(s => struct(
      lit(s).as("s"),
      (shiftright(col("ov"), s * sb) % lit(1L << sb)).as("sv"),
      deleteCell(col("ov"), s, sb).as("nxt"))): _*)
    hot.select(col("sig"), col("key"), explode(cells).as("e"))
      .select(col("sig"),
        xxhash64(col("key"), lit(lvl), col("e.s"), col("e.sv")).as("key"),
        col("e.nxt").as("ov"))
  }

  /** Leaf bucket rows (sig, key) for a DISTINCT-signature frame: the
    * chunk explosion, then recursive splitting of hot buckets until
    * every bucket fits `hotCap` or the width floor is reached. Driver
    * loop, ≤ ~6 iterations by the width ladder; each level is
    * localCheckpointed so the shared final/hot split reads one
    * materialization and the plan never nests level lineage (the
    * cluster_size_dist plan-string lesson, TRIAGE_sf20_oom_r12.md). */
  private def keyedLeaves(uniq: DataFrame, totalBits: Int, chunkBits: Int,
      nChunks: Int, maxDist: Int, hotCap: Int): DataFrame = {
    val k = maxDist + 1
    val chunkArr = array((0 until nChunks).map(c => struct(
      lit(c).as("s"),
      (shiftright(col("sig"), c * chunkBits) % lit(1L << chunkBits)).as("sv"),
      deleteCell(col("sig"), c, chunkBits).as("nxt"))): _*)
    val rows0 = uniq.select(col("sig"), explode(chunkArr).as("e"))
      .select(col("sig"), xxhash64(col("e.s"), col("e.sv")).as("key"),
        col("e.nxt").as("ov"))
    var w = totalBits - chunkBits
    if (!canSplit(w, k) || fitsCap(w, hotCap)) return rows0.drop("ov")
    // Level-0 hotness: ≤ nChunks · 2^chunkBits buckets — a tiny
    // partial-aggregated stat, collected and branded with a literal
    // isin predicate so the common no-hot-bucket corpus runs the EXACT
    // single-key plan of rounds 1–4 with zero added stages. Falls back
    // to a broadcast size join if the hot set is unexpectedly large.
    val sizes = rows0.groupBy("key").agg(count(lit(1)).as("_n"))
    val hotKeys = sizes.filter(col("_n") > hotCap)
      .limit(257).collect().map(_.getLong(0))
    if (hotKeys.isEmpty) return rows0.drop("ov")
    val tagged =
      if (hotKeys.length <= 256)
        rows0.withColumn("_hot", col("key").isin(hotKeys.toSeq: _*))
      else
        rows0.join(broadcast(sizes), Seq("key"))
          .withColumn("_hot", col("_n") > hotCap).drop("_n")
    val finals = ArrayBuffer[DataFrame](
      tagged.filter(!col("_hot")).select("sig", "key"))
    var cur = splitLevel(tagged.filter(col("_hot")), w, k, lvl = 0)
    w = nextWidth(w, k)
    var lvl = 1
    // Deeper levels hold only hot-bucket members (a shrinking subset);
    // bucket counts there are unbounded, so hotness comes from a
    // window count instead of a driver collect.
    while (cur != null && canSplit(w, k) && !fitsCap(w, hotCap)) {
      val cnt = cur.withColumn("_n",
          count(lit(1)).over(Window.partitionBy("key")))
        .localCheckpoint(false)
      finals += cnt.filter(col("_n") <= hotCap).select("sig", "key")
      val hot = cnt.filter(col("_n") > hotCap)
      if (hot.isEmpty) cur = null
      else {
        cur = splitLevel(hot.select("sig", "key", "ov"), w, k, lvl)
        w = nextWidth(w, k)
        lvl += 1
      }
    }
    // Width-floor leaves: ≤ 2^w ≤ 512 distinct rows per bucket — join
    // them directly, no population check needed.
    if (cur != null) finals += cur.select("sig", "key")
    finals.reduce(_ unionAll _)
  }

  /** The leaf self-join filtered only to ordered DISTINCT-sig pairs —
    * every (sig pair × shared leaf bucket) candidate row, BEFORE the
    * Hamming predicate and the distinct. Exposed for spec
    * instrumentation: the hot-bucket spec asserts this count drops
    * when splitting activates. */
  private[graft] def rawCandidates(sigs: DataFrame, totalBits: Int,
      chunkBits: Int, nChunks: Int, maxDist: Int, hotCap: Int): DataFrame = {
    val uniq = sigs.select("sig").distinct().localCheckpoint(false)
    val leaves = keyedLeaves(uniq, totalBits, chunkBits, nChunks, maxDist, hotCap)
    val a = leaves.select(col("key"), col("sig").as("sig_a"))
    val b = leaves.select(col("key"), col("sig").as("sig_b"))
    // PIN the shuffle join: after the localCheckpoint the leaf table's
    // byte stats look tiny, so the planner would broadcast one side of
    // the self-join — collapsing the in-bucket enumeration (the
    // expensive part) onto the probe side's few input partitions and
    // taking AQE's skew-split off the table (it only divides shuffle
    // joins). Measured at sf5 in round 5: the broadcast form ran the
    // candidate walk on ~1 core (295 s); the pinned shuffle join keeps
    // it 32-way and skew-splittable. At 100 TB the leaf table is
    // entropy-sized — broadcast is never the right strategy here.
    a.hint("shuffle_hash").join(b, Seq("key"))
      .filter(col("sig_a") < col("sig_b"))
  }

  /** All doc pairs within Hamming ≤ maxDist, each emitted exactly once:
    * (id_a, id_b, sig_a, sig_b, hamming) with id_a < id_b. Callers
    * rename/cast to their output contracts; results are identical for
    * every hotCap ≥ 1. */
  def pairs(sigs: DataFrame, totalBits: Int, chunkBits: Int, nChunks: Int,
      maxDist: Int, hotCap: Int = HotBucketCap): DataFrame = {
    require(nChunks * chunkBits >= totalBits && maxDist < nChunks,
      s"chunk blocking unsound: $nChunks x $chunkBits must cover $totalBits " +
        s"bits and maxDist=$maxDist < chunks")
    // The (doc_id, sig) frame is TINY (16 B/row) but computing it runs
    // the expensive signature kernels (tokenize+SimHash / resize+pHash)
    // over the whole corpus — and it is referenced by the distinct, the
    // cross-sig expansion (twice) and the identical-sig self-join.
    // localCheckpoint cuts the lineage so the kernels run ONCE; the
    // level-0 hot-key collect piggybacks the materialization.
    val sigsC = sigs.localCheckpoint(false)
    val uniq = sigsC.select("sig").distinct().localCheckpoint(false)
    val sigPairs = rawCandidates0(uniq, totalBits, chunkBits, nChunks,
        maxDist, hotCap)
      .withColumn("hamming", expr("bit_count(sig_a ^ sig_b)"))
      .filter(col("hamming") <= maxDist)
      .select("sig_a", "sig_b", "hamming")
      .distinct()
    // Cross-sig expansion: every (doc of sig_a) × (doc of sig_b) pair
    // qualifies at the pair's Hamming distance. Build side = the
    // qualifying sig pairs (never the corpus table, whose checkpointed
    // stats the planner can misread as broadcastable); AQE may still
    // demote to broadcast when the pair set is genuinely small.
    val cross = sigPairs.hint("shuffle_hash")
      .join(sigsC.select(col("sig").as("sig_a"), col("doc_id").as("_ia")),
        Seq("sig_a"))
      .join(sigsC.select(col("sig").as("sig_b"), col("doc_id").as("_ib")),
        Seq("sig_b"))
      .select(least(col("_ia"), col("_ib")).as("id_a"),
        greatest(col("_ia"), col("_ib")).as("id_b"),
        when(col("_ia") < col("_ib"), col("sig_a")).otherwise(col("sig_b"))
          .as("sig_a"),
        when(col("_ia") < col("_ib"), col("sig_b")).otherwise(col("sig_a"))
          .as("sig_b"),
        col("hamming"))
    // Identical-sig doc pairs (Hamming 0): direct self-equi-join on
    // sig. Singleton signatures probe 1×1 buckets and emit nothing —
    // linear work; multi-doc signatures emit exactly their genuine
    // duplicate pairs, which is the answer itself.
    val within = sigsC.select(col("sig"), col("doc_id").as("id_a"))
      .hint("shuffle_hash")
      .join(sigsC.select(col("sig"), col("doc_id").as("id_b")), Seq("sig"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sig").as("sig_a"),
        col("sig").as("sig_b"), lit(0).as("hamming"))
    within.unionAll(cross)
  }

  /** rawCandidates over an already-distinct, already-checkpointed sig
    * frame (pairs() shares uniq with the expansions). */
  private def rawCandidates0(uniq: DataFrame, totalBits: Int, chunkBits: Int,
      nChunks: Int, maxDist: Int, hotCap: Int): DataFrame = {
    val leaves = keyedLeaves(uniq, totalBits, chunkBits, nChunks, maxDist, hotCap)
    val a = leaves.select(col("key"), col("sig").as("sig_a"))
    val b = leaves.select(col("key"), col("sig").as("sig_b"))
    a.hint("shuffle_hash").join(b, Seq("key"))
      .filter(col("sig_a") < col("sig_b"))
  }
}
