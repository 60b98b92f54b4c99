package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Chunk-blocked Hamming-distance pair join with HOT-BUCKET SPLITTING —
  * the shared blocking engine behind `dedup_simhash` and `mm_dedup`.
  *
  * Baseline scheme (rounds 1–4): explode each `totalBits`-bit signature
  * into `nChunks` chunks of `chunkBits`; the pigeonhole principle
  * (maxDist < nChunks) guarantees every pair within Hamming ≤ maxDist
  * agrees exactly on ≥1 chunk, so a self-equi-join on (chunk, value)
  * finds every qualifying pair with no all-pairs scan, and the
  * first-matching-chunk predicate emits each pair exactly once with no
  * DISTINCT shuffle.
  *
  * The residual risk (VERDICT r04 §next-round #2): one bucket's join
  * cost is quadratic in its population. On this corpus that waste was
  * tolerable (73.7 M candidates → 301 k pairs at sf1), but a correlated
  * real corpus can concentrate a constant fraction of all documents in
  * ONE chunk value — and that single bucket becomes O(n²) however the
  * rest of the table behaves.
  *
  * Fix — recursive re-blocking on the bits OUTSIDE the hot chunk: if a
  * pair fully agrees on chunk c, ALL of its ≤ maxDist differing bits
  * lie in the remaining `totalBits − chunkBits` bits, so the pigeonhole
  * argument applies AGAIN there: split those outside bits into
  * `maxDist + 1` sub-chunks and the pair must fully agree on ≥1 of
  * them. Buckets whose population exceeds `hotCap` therefore re-key
  * their members on (chunk, value, sub, subValue) — spreading one hot
  * bucket of m rows over up to (maxDist+1)·2^subBits sub-buckets (a
  * ~2^subBits-fold cut of the quadratic term for uncorrelated outside
  * bits) — while small buckets keep their single (chunk, value, −1, 0)
  * row, and ONE self-join covers both. Completeness is unconditional
  * (both members of a pair always share the same bucket, hence the
  * same hot/small treatment); exact-once emission extends the
  * first-matching-chunk predicate with first-matching-SUB-chunk inside
  * hot buckets.
  *
  * Cost: one extra aggregation pass (bucket sizes, ≤ nChunks·2^chunkBits
  * groups — partial-aggregated map-side, broadcast back) and one extra
  * long column (`ov`) through the join. The join remains the only
  * data-sized shuffle. Residual skew (a hot SUB-bucket, i.e. thousands
  * of near-identical signatures) is genuine near-duplicate mass — its
  * pair output is itself quadratic, and AQE skew-split can still divide
  * the sub-bucket's join work across tasks.
  */
object ChunkBlocking {

  /** Default population cap above which a (chunk, value) bucket is
    * re-blocked on outside-bits sub-chunks. 1024 keeps the per-bucket
    * candidate term ≤ ~0.5 M pairs; measured at sf1/sf5 in SURVEY §6. */
  val HotBucketCap = 1024

  /** First index in [0, chunks) where the two signatures' `bits`-wide
    * chunks agree — the distinct-free pair emitter (moved here from
    * Dedup in round 5; used for both the chunk and sub-chunk levels). */
  private[graft] def firstMatchingChunk(a: Column, b: Column,
      chunks: Int, bits: Int): Column =
    (0 until chunks).foldRight(lit(chunks): Column) { (c, els) =>
      when(shiftright(a, c * bits) % (1 << bits) ===
           shiftright(b, c * bits) % (1 << bits), lit(c)).otherwise(els)
    }

  /** The signature with chunk `c` deleted: bits above the chunk shifted
    * down into its place, bits below kept — a (totalBits − chunkBits)-
    * bit value whose Hamming distance equals the pair's full distance
    * whenever chunk c agrees. */
  private def outsideBits(sig: Column, c: Int, chunkBits: Int): Column = {
    val hi = shiftleft(shiftright(sig, (c + 1) * chunkBits), c * chunkBits)
    if (c == 0) hi else hi.bitwiseOR(sig % lit(1L << (c * chunkBits)))
  }

  /** Exploded + size-tagged + conditionally sub-exploded key rows:
    * (doc_id, sig, chunk, cv, ov, sub, sv) — one row per chunk for
    * small buckets (sub = −1), `maxDist + 1` rows per chunk for hot
    * buckets. */
  private def keyed(sigs: DataFrame, totalBits: Int, chunkBits: Int,
      nChunks: Int, maxDist: Int, hotCap: Int): DataFrame = {
    val subChunks = maxDist + 1
    val outBits = totalBits - chunkBits
    val subBits = (outBits + subChunks - 1) / subChunks
    require(subChunks * subBits >= outBits,
      s"sub-chunk layout unsound: $subChunks x $subBits < $outBits outside bits")
    // The (doc_id, sig) frame is TINY (16 B/row) but computing it runs
    // the expensive signature kernels (tokenize+SimHash / resize+pHash)
    // over the whole corpus — and this plan references it from BOTH
    // self-join sides plus the bucket-size stat. localCheckpoint cuts
    // the lineage so the kernels run ONCE; the hot-bucket collect below
    // piggybacks the materialization (the bpeMerges lazy-checkpoint
    // pattern). Measured at sf1: dedup_simhash 14.2 → 8.4 s.
    val sigsC = sigs.localCheckpoint(false)
    val chunkRows = sigsC.select(col("doc_id"), col("sig"),
        explode(array((0 until nChunks).map(c =>
          struct(lit(c).as("chunk"),
            (shiftright(col("sig"), c * chunkBits) % (1 << chunkBits)).as("cv"),
            outsideBits(col("sig"), c, chunkBits).as("ov"))): _*)).as("e"))
      .select(col("doc_id"), col("sig"), col("e.chunk"), col("e.cv"), col("e.ov"))
    // ≤ nChunks·2^chunkBits groups — tiny whatever the corpus size
    val sizes = chunkRows.groupBy("chunk", "cv").agg(count(lit(1)).as("_n"))
    val subArr = array((0 until subChunks).map(s =>
      struct(lit(s).as("sub"),
        (shiftright(col("ov"), s * subBits) % lit(1L << subBits)).as("sv"))): _*)
    val one = array(struct(lit(-1).as("sub"), lit(0L).as("sv")))
    // HOT buckets are FEW by construction (each holds > hotCap of the
    // n·nChunks key rows, so there are < n·nChunks/hotCap of them, and
    // in practice a handful) — collect them driver-side (tiny-stat
    // action, ≤ nChunks·2^chunkBits rows scanned) and brand rows with
    // a literal isin predicate instead of a broadcast join: the common
    // no-hot-bucket corpus then runs the EXACT single-key plan of
    // rounds 1–4 with zero added stages. Falls back to the broadcast
    // join if the hot set is unexpectedly large (adversarially
    // correlated corpus) to keep the codegen'd literal list bounded.
    val hotKeys = sizes.filter(col("_n") > hotCap)
      .select((col("chunk").cast("long") * (1 << chunkBits) + col("cv")).as("k"))
      .limit(257).collect().map(_.getLong(0))
    val tagged =
      if (hotKeys.isEmpty)
        chunkRows.withColumn("_hot", lit(false))
      else if (hotKeys.length <= 256)
        chunkRows.withColumn("_hot",
          (col("chunk").cast("long") * (1 << chunkBits) + col("cv"))
            .isin(hotKeys.toSeq: _*))
      else
        chunkRows.join(broadcast(sizes), Seq("chunk", "cv"))
          .withColumn("_hot", col("_n") > hotCap)
    tagged
      .select(col("doc_id"), col("sig"), col("chunk"), col("cv"), col("ov"),
        explode(when(col("_hot"), subArr).otherwise(one)).as("e2"))
      .select(col("doc_id"), col("sig"), col("chunk"), col("cv"), col("ov"),
        col("e2.sub"), col("e2.sv"))
  }

  /** The self-join on the blocking key, filtered only to ordered pairs —
    * every (pair × matching-bucket) candidate row, BEFORE the Hamming
    * and exact-once predicates. Exposed for spec instrumentation: the
    * hot-bucket spec asserts this count drops when splitting activates. */
  private[graft] def rawCandidates(sigs: DataFrame, totalBits: Int,
      chunkBits: Int, nChunks: Int, maxDist: Int, hotCap: Int): DataFrame = {
    val k = keyed(sigs, totalBits, chunkBits, nChunks, maxDist, hotCap)
    val a = k.select(col("chunk"), col("cv"), col("sub"), col("sv"),
      col("doc_id").as("id_a"), col("sig").as("sig_a"), col("ov").as("ov_a"))
    val b = k.select(col("chunk"), col("cv"), col("sub"), col("sv"),
      col("doc_id").as("id_b"), col("sig").as("sig_b"), col("ov").as("ov_b"))
    // PIN the shuffle join: after the localCheckpoint the keyed table's
    // byte stats look tiny (16 B/row), so the planner would broadcast
    // one side of the self-join — collapsing the in-bucket enumeration
    // (the expensive part) onto the probe side's few input partitions
    // and taking AQE's skew-split off the table (it only divides
    // shuffle joins). Measured at sf5: the broadcast form ran the 73 M
    // candidate walk on ~1 core (295 s); the pinned shuffle join keeps
    // it 32-way and skew-splittable. At 100 TB the keyed table is
    // corpus-sized — broadcast is never the right strategy here.
    a.hint("shuffle_hash").join(b, Seq("chunk", "cv", "sub", "sv"))
      .filter(col("id_a") < col("id_b"))
  }

  /** All pairs within Hamming ≤ maxDist, each emitted exactly once:
    * (id_a, id_b, sig_a, sig_b, hamming). Callers rename/cast to their
    * output contracts; results are identical for every hotCap ≥ 1. */
  def pairs(sigs: DataFrame, totalBits: Int, chunkBits: Int, nChunks: Int,
      maxDist: Int, hotCap: Int = HotBucketCap): DataFrame = {
    require(nChunks * chunkBits >= totalBits && maxDist < nChunks,
      s"chunk blocking unsound: $nChunks x $chunkBits must cover $totalBits " +
        s"bits and maxDist=$maxDist < chunks")
    val subChunks = maxDist + 1
    val subBits = (totalBits - chunkBits + subChunks - 1) / subChunks
    rawCandidates(sigs, totalBits, chunkBits, nChunks, maxDist, hotCap)
      .withColumn("hamming", expr("bit_count(sig_a ^ sig_b)"))
      .filter(col("hamming") <= maxDist &&
        col("chunk") === firstMatchingChunk(col("sig_a"), col("sig_b"),
          nChunks, chunkBits) &&
        (col("sub") === lit(-1) ||
         col("sub") === firstMatchingChunk(col("ov_a"), col("ov_b"),
           subChunks, subBits)))
      .select("id_a", "id_b", "sig_a", "sig_b", "hamming")
  }
}
