package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** Bloom-filter membership sketch over a 64-bit hash column, as a
  * mergeable TypedImperativeAggregate plus a codegen'd membership
  * expression — the 100 TB exact-dedup pre-filter shape:
  *
  * build the bloom over the SMALL side (a day's new-batch content
  * hashes), broadcast the resulting bytes (one row), and prune the
  * corpus-sized index scan to rows that *might* match before the
  * equi-join. No false negatives, so downstream exact-join verdicts
  * are unchanged — the bloom only removes index rows that cannot
  * match, which is the overwhelming majority when the daily batch is
  * a sliver of the corpus. Spark's own AQE runtime bloom
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`) applies the
  * same idea to shuffle joins; this version is explicit, buildable
  * once and reusable across queries, and mergeable (map-side partial
  * aggregation produces per-partition blooms OR-ed in the reduce).
  *
  * Sizing: false-positive rate ≈ (1 − e^(−kn/m))^k; the default
  * m = 2²⁰ bits (128 KiB) with k = 5 holds fpp < 1% to n ≈ 10⁵
  * items. A 1 B-row daily batch at 1% fpp needs m ≈ 2³³ bits = 1 GiB
  * — still one broadcast, still far cheaper than shuffling a 100 TB
  * index. Bit positions come from double hashing (Kirsch–Mitzenmacher):
  * pos_i = h1 + i·h2 mod m, with h1/h2 independent splitmix64 mixes
  * of the input hash.
  */
object BloomHash {
  /** splitmix64 finalizer — full-avalanche 64-bit mixing. */
  def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Bit position of probe `i` for value `v` in an `m`-bit filter. */
  def bitPos(v: Long, i: Int, m: Int): Int = {
    val h1 = mix(v)
    val h2 = mix(v ^ 0x9e3779b97f4a7c15L) | 1L // odd → full-period stride
    (((h1 + i * h2) % m + m) % m).toInt
  }
}

/** `bloom_agg(hash64col)` → binary: bloom bytes over the group's
  * values. Buffer is the raw long-word bitset; serialize/merge are
  * word-wise, eval packs to bytes little-endian word order. */
case class BloomAgg(
    child: Expression,
    numBits: Int = 1 << 20,
    numHashes: Int = 5,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(numBits % 64 == 0 && numBits > 0, s"numBits must be a positive multiple of 64, got $numBits")
  require(numHashes >= 1, s"numHashes must be >= 1, got $numHashes")

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): Array[Long] = new Array[Long](numBits / 64)

  override def update(b: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Long]
      var i = 0
      while (i < numHashes) {
        val p = BloomHash.bitPos(x, i, numBits)
        b(p >>> 6) |= 1L << (p & 63)
        i += 1
      }
    }
    b
  }

  override def merge(b: Array[Long], o: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b.length) { b(i) |= o(i); i += 1 }
    b
  }

  override def eval(b: Array[Long]): Any = {
    val out = new Array[Byte](b.length * 8)
    val bb = java.nio.ByteBuffer.wrap(out).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.asLongBuffer().put(b)
    out
  }

  override def serialize(b: Array[Long]): Array[Byte] = eval(b).asInstanceOf[Array[Byte]]

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val b = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .asLongBuffer().get(b)
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): BloomAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): BloomAgg = copy(child = cs.head)
  override def prettyName: String = "bloom_agg"
}

/** `bloom_contains(bloomBytes, hash64col)` → boolean. Probes the same
  * double-hash positions [[BloomAgg]] set; stays inside whole-stage
  * codegen via [[KernelCodegen2]] so the corpus-side pruning scan is
  * one fused stage. The bloom operand is typically a broadcast 1-row
  * column (tiny-stat crossJoin pattern), so the bytes reference is the
  * same object for every row in a batch — no per-row copying. */
case class BloomContains(left: Expression, right: Expression)
    extends BinaryExpression with KernelCodegen2 {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = left.nullable || right.nullable

  override def compute2(bloom: Any, v: Any): Any = {
    val bytes = bloom.asInstanceOf[Array[Byte]]
    val m = bytes.length * 8
    val x = v.asInstanceOf[Long]
    var i = 0
    // numHashes is recovered conservatively: probe the fixed k=5 the
    // builder uses. Kept in lockstep with BloomAgg's default.
    while (i < BloomContains.NumHashes) {
      val p = BloomHash.bitPos(x, i, m)
      if ((bytes(p >>> 3) & (1 << (p & 7))) == 0) return false
      i += 1
    }
    true
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): BloomContains = copy(left = l, right = r)
  override def prettyName: String = "bloom_contains"
}

object BloomContains {
  /** Probe count shared by builder and prober — a mismatch would break
    * the no-false-negative contract, so both read this constant. */
  val NumHashes = 5
}

object BloomFilter {
  import org.apache.spark.sql.graftbridge.Bridge.{column, expression}

  def bloom_agg(c: Column, numBits: Int = 1 << 20): Column =
    column(BloomAgg(expression(c), numBits, BloomContains.NumHashes)
      .toAggregateExpression())

  def bloom_contains(bloom: Column, v: Column): Column =
    column(BloomContains(expression(bloom), expression(v)))
}
