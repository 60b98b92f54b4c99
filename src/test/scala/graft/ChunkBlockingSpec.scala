package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.dedup.ChunkBlocking

/** Hot-bucket splitting (round 5): a planted hot chunk bucket must be
  * re-blocked on outside-bits sub-chunks — fewer raw candidate rows,
  * IDENTICAL output, exactly-once emission. */
class ChunkBlockingSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private val Bits = 48
  private val ChunkBits = 12
  private val Chunks = 4

  /** Deterministic 48-bit signatures: `nHot` docs that all share chunk
    * 0 (low 12 bits = 0xABC) with scrambled high bits — one planted hot
    * bucket — plus `nBg` background docs with fully scrambled bits, plus
    * planted near-dup pairs inside and outside the hot bucket. */
  private def planted(nHot: Int, nBg: Int) = {
    def smix(z0: Long): Long = {
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    val mask = (1L << Bits) - 1
    val hot = (0 until nHot).map { i =>
      (i.toLong, ((smix(i.toLong) & mask) & ~0xfffL) | 0xabcL)
    }
    val bg = (0 until nBg).map { i =>
      ((nHot + i).toLong, smix(1000000L + i) & mask)
    }
    // near-dups: flip ≤3 bits of an existing signature — one partner in
    // the hot bucket (outside bits only, stays in the bucket), one out
    val inHot = Seq((9000L, hot(7)._2 ^ (1L << 20) ^ (1L << 33)))
    val inBg = if (nBg > 3)
      Seq((9001L, bg(3)._2 ^ (1L << 5) ^ (1L << 30) ^ (1L << 46))) else Nil
    (hot ++ bg ++ inHot ++ inBg).toDF("doc_id", "sig")
  }

  private def bruteForce(sigs: org.apache.spark.sql.DataFrame, maxDist: Int) = {
    val a = sigs.select(col("doc_id").as("id_a"), col("sig").as("sig_a"))
    val b = sigs.select(col("doc_id").as("id_b"), col("sig").as("sig_b"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("hamming", expr("bit_count(sig_a ^ sig_b)"))
      .filter(col("hamming") <= maxDist)
      .select("id_a", "id_b", "hamming")
  }

  test("split output = brute force = unsplit output, each pair exactly once") {
    val sigs = planted(nHot = 150, nBg = 100).cache()
    val expected = bruteForce(sigs, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(expected.nonEmpty, "planted pairs must qualify")
    for (cap <- Seq(1, 50, 1 << 30)) {
      val rows = ChunkBlocking.pairs(sigs, Bits, ChunkBits, Chunks, 3, cap)
        .select("id_a", "id_b", "hamming").collect()
      assert(rows.length == expected.size,
        s"cap=$cap emitted ${rows.length} rows, expected ${expected.size} " +
          "(duplicates or misses)")
      val got = rows.map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
      assert(got == expected, s"cap=$cap output differs from brute force")
    }
    sigs.unpersist()
  }

  test("splitting bounds the hot bucket's candidate count") {
    val sigs = planted(nHot = 300, nBg = 50).cache()
    def cands(cap: Int): Long =
      ChunkBlocking.rawCandidates(sigs, Bits, ChunkBits, Chunks, 3, cap).count()
    val unsplit = cands(1 << 30)  // nothing exceeds the cap → old path
    val split = cands(100)        // the 300-row bucket splits
    // the hot bucket alone contributes ~C(300,2) ≈ 45k unsplit
    // candidates; scrambled outside bits spread its members over
    // 4 × 2^9 sub-buckets, so nearly all of that term vanishes
    assert(unsplit >= 40000L, s"planted bucket not hot? unsplit=$unsplit")
    assert(split < unsplit / 10,
      s"splitting did not bound the bucket: $split vs $unsplit")
    sigs.unpersist()
  }

  test("identical signatures inside a hot bucket still pair up (hot sub-bucket)") {
    // 40 identical signatures inside an otherwise-hot bucket: outside
    // bits agree everywhere, so they stay co-bucketed after the split
    // and must all pair — quadratic output is genuine duplicate mass
    val base = planted(nHot = 120, nBg = 0)
    val clones = (0 until 40).map(i => (5000L + i, 0x1234567890abcL)).toDF("doc_id", "sig")
    val sigs = base.unionAll(clones)
    val out = ChunkBlocking.pairs(sigs, Bits, ChunkBits, Chunks, 3, 50)
      .filter(col("id_a") >= 5000L && col("id_b") >= 5000L).count()
    assert(out == 40L * 39 / 2, s"clone pairs: got $out, want ${40 * 39 / 2}")
  }
}
