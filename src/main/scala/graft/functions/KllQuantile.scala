package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** KLL-style mergeable quantile sketch (Karnin/Lang/Liberty, "Optimal
  * quantile approximation in streams", FOCS'16 — the uniform-capacity
  * MRL-flavored variant) as a TypedImperativeAggregate, completing the
  * repo's mergeable-sketch family (KMV distincts, SpaceSaving heavy
  * hitters, Bloom membership, MinK samples).
  *
  * State: levels of value runs; an item at level h carries weight 2^h.
  * Level 0 ingests raw values; when a level exceeds the per-level
  * capacity k it COMPACTS — sort the run, keep every other element
  * starting at a parity offset, promote the kept half one level up
  * (weights double). merge: concatenate runs level-wise, then compact
  * any overfull level bottom-up (mergeable-summaries composition).
  *
  * Determinism: the textbook sketch flips a coin per compaction for
  * the parity offset; here the offset alternates from a per-buffer
  * compaction counter, so a given ingest order yields EXACTLY one
  * result. The repo's gate relies on a stronger regime: while total
  * ingested count ≤ k the sketch never compacts, every value is
  * retained at level 0, and quantiles are EXACT — identical under any
  * partitioning/merge order, which is what lets a DuckDB oracle replay
  * the answer with a plain sorted-rank scan (the heavy_hitters
  * "exact-at-sketch-cost" pattern). Past k items, answers are
  * approximate with the classic ±ε·n rank bound (ε ≈ c/k for the
  * uniform-capacity variant; KllQuantileSpec measures it) and remain
  * run-deterministic for a fixed partition/merge order, but are no
  * longer invariant to it — the oracle query sizes k above its sf0.01
  * group cardinality, exactly as heavy_hitters sizes its counter set.
  *
  * Rank convention (pinned cross-engine): quantile q of n values is
  * the SMALLEST retained value whose cumulative weight ≥ ⌈q·n⌉ — the
  * `min(v) WHERE cume_dist ≥ q` / quantile_disc form. The target rank
  * is computed in integer arithmetic from ppm = round(q·1e6), so no
  * float rounding can shift it across engines.
  *
  * Scale shape: O(k·log(n/k)) state per group, one map-side-combined
  * aggregation — the 100 TB path for per-key quantiles where
  * percentile_approx's GK summaries or a full sort would dominate;
  * sketches from disjoint partitions/days merge associatively, so
  * incremental daily rollups need no recompute. */
case class KllQuantile(
    child: Expression,
    k: Int,
    quantilesPpm: Seq[Long],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllQuantile.Buf] {

  require(k >= 8, "KLL capacity must be >= 8")
  require(quantilesPpm.nonEmpty &&
    quantilesPpm.forall(p => p >= 0L && p <= 1000000L),
    "quantiles must be given as ppm in [0, 1e6]")

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def createAggregationBuffer(): KllQuantile.Buf = new KllQuantile.Buf

  override def update(b: KllQuantile.Buf, input: InternalRow): KllQuantile.Buf = {
    val v = child.eval(input)
    if (v != null) b.add(v.asInstanceOf[Double], k)
    b
  }

  override def merge(b: KllQuantile.Buf, o: KllQuantile.Buf): KllQuantile.Buf = {
    b.mergeIn(o, k); b
  }

  override def eval(b: KllQuantile.Buf): Any = {
    // gather (value, weight) across levels, sort by value, walk the
    // cumulative weight to each target rank ⌈q·n⌉ (integer arithmetic)
    val items = b.weighted()
    val out = new Array[Any](quantilesPpm.size)
    if (items.isEmpty) {
      java.util.Arrays.fill(out.asInstanceOf[Array[AnyRef]], java.lang.Double.valueOf(Double.NaN))
      return new GenericArrayData(out)
    }
    java.util.Arrays.sort(items, (a: Array[Double], c: Array[Double]) =>
      java.lang.Double.compare(a(0), c(0)))
    val n = b.count
    var qi = 0
    while (qi < quantilesPpm.size) {
      val ppm = quantilesPpm(qi)
      // target = ⌈ppm·n / 1e6⌉, exact in Long for n up to ~9e12
      val target = math.max(1L, (ppm * n + 999999L) / 1000000L)
      var cum = 0L
      var i = 0
      var ans = items(items.length - 1)(0)
      var found = false
      while (i < items.length && !found) {
        cum += items(i)(1).toLong
        if (cum >= target) { ans = items(i)(0); found = true }
        i += 1
      }
      out(qi) = ans
      qi += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(b: KllQuantile.Buf): Array[Byte] = b.toBytes
  override def deserialize(bytes: Array[Byte]): KllQuantile.Buf =
    KllQuantile.Buf.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(o: Int): KllQuantile =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllQuantile =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): KllQuantile = copy(child = cs.head)
  override def prettyName: String = "kll_quantile"
}

object KllQuantile {

  /** Sketch state: one growable Double run per level (level h weight
    * 2^h), total ingested count, and the deterministic compaction
    * parity counter. Plain arrays — this sits on the agg hot path. */
  final class Buf {
    var levels: Array[Array[Double]] = Array(Array.empty[Double])
    var sizes: Array[Int] = Array(0)
    var count: Long = 0L
    var compactions: Long = 0L

    private def ensureLevel(h: Int): Unit =
      if (h >= levels.length) {
        val nl = new Array[Array[Double]](h + 1)
        val ns = new Array[Int](h + 1)
        System.arraycopy(levels, 0, nl, 0, levels.length)
        System.arraycopy(sizes, 0, ns, 0, sizes.length)
        var i = levels.length
        while (i <= h) { nl(i) = Array.empty[Double]; ns(i) = 0; i += 1 }
        levels = nl; sizes = ns
      }

    private def push(h: Int, v: Double): Unit = {
      ensureLevel(h)
      if (sizes(h) == levels(h).length) {
        val grown = new Array[Double](math.max(16, levels(h).length * 2))
        System.arraycopy(levels(h), 0, grown, 0, sizes(h))
        levels(h) = grown
      }
      levels(h)(sizes(h)) = v
      sizes(h) += 1
    }

    def add(v: Double, k: Int): Unit = { push(0, v); count += 1; compactAll(k) }

    /** Compact every overfull level bottom-up: sort the run, keep the
      * elements at the alternating parity offset, promote them one
      * level up. Each survivor represents itself and its dropped
      * neighbor — total weight is conserved exactly (run length is
      * even by the cap check; an odd run leaves its last element in
      * place so no weight is invented). */
    private def compactAll(k: Int): Unit = {
      var h = 0
      while (h < levels.length) {
        if (sizes(h) > k) {
          val run = levels(h)
          val n = sizes(h)
          java.util.Arrays.sort(run, 0, n)
          val even = n - (n & 1) // compact an even prefix-count; keep odd leftover
          val offset = (compactions & 1L).toInt
          compactions += 1
          var i = offset
          while (i < even) { push(h + 1, run(i)); i += 2 }
          if ((n & 1) == 1) { run(0) = run(n - 1); sizes(h) = 1 }
          else sizes(h) = 0
        }
        h += 1
      }
    }

    def mergeIn(o: Buf, k: Int): Unit = {
      var h = 0
      while (h < o.levels.length) {
        var i = 0
        while (i < o.sizes(h)) { push(h, o.levels(h)(i)); i += 1 }
        h += 1
      }
      count += o.count
      compactions += o.compactions
      compactAll(k)
    }

    /** All retained items as (value, weight) pairs. */
    def weighted(): Array[Array[Double]] = {
      var total = 0
      var h = 0
      while (h < levels.length) { total += sizes(h); h += 1 }
      val out = new Array[Array[Double]](total)
      var j = 0
      h = 0
      while (h < levels.length) {
        val w = (1L << h).toDouble
        var i = 0
        while (i < sizes(h)) { out(j) = Array(levels(h)(i), w); j += 1; i += 1 }
        h += 1
      }
      out
    }

    def toBytes: Array[Byte] = {
      var total = 4 + 8 + 8
      var h = 0
      while (h < levels.length) { total += 4 + 8 * sizes(h); h += 1 }
      val bb = java.nio.ByteBuffer.allocate(total)
      bb.putInt(levels.length)
      bb.putLong(count)
      bb.putLong(compactions)
      h = 0
      while (h < levels.length) {
        bb.putInt(sizes(h))
        var i = 0
        while (i < sizes(h)) { bb.putDouble(levels(h)(i)); i += 1 }
        h += 1
      }
      bb.array()
    }
  }

  object Buf {
    def fromBytes(bytes: Array[Byte]): Buf = {
      val bb = java.nio.ByteBuffer.wrap(bytes)
      val nLevels = bb.getInt
      val b = new Buf
      b.count = bb.getLong
      b.compactions = bb.getLong
      b.levels = new Array[Array[Double]](nLevels)
      b.sizes = new Array[Int](nLevels)
      var h = 0
      while (h < nLevels) {
        val n = bb.getInt
        val run = new Array[Double](n)
        var i = 0
        while (i < n) { run(i) = bb.getDouble; i += 1 }
        b.levels(h) = run
        b.sizes(h) = n
        h += 1
      }
      b
    }
  }

  import org.apache.spark.sql.graftbridge.Bridge.{column, expression}

  /** `graft_quantile(col, k, quantiles…)` — quantiles as plain doubles
    * (converted to ppm internally so rank targets stay integral). */
  def kll_quantile(c: Column, k: Int, qs: Seq[Double]): Column =
    column(KllQuantile(expression(c), k,
      qs.map(q => math.round(q * 1e6))).toAggregateExpression())
}
