package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Exact-integer Gram matrix of array<long> vectors as ONE mergeable
  * TypedImperativeAggregate — the distributed Σxxᵀ pass behind
  * embed_pca (§2.230).
  *
  * The declarative formulation (double posexplode → groupBy (j,k) →
  * decimal sums) multiplies the corpus by dim² rows and pushes every
  * product through BigDecimal hash-agg updates — measured 23.3 s at
  * sf1, the slowest plan in the suite. This aggregate keeps the SAME
  * exactness with none of the row blowup: per input row a compiled
  * dim² multiply-accumulate loop into per-cell 128-bit two's-
  * complement accumulators (hi/lo long pairs — a dim² product fits a
  * long, and 128 bits absorb ~2⁶⁴ row-sums of them, unconditionally
  * overflow-proof at any corpus size), partial buffers merge by
  * 128-bit addition, and eval renders exact decimal strings the
  * driver parses back to BigInt. State is O(dim²) per partial —
  * 64 KB for dim 64 — independent of row count.
  *
  * Output layout (array<string>): [count, s_0..s_{d-1},
  * g_00, g_01, .., g_{d-1 d-1}] — linear sums ride along so the
  * centered covariance needs no second pass.
  */
case class GramAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[GramAgg.Buffer] {

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def createAggregationBuffer(): GramAgg.Buffer =
    new GramAgg.Buffer(0L, 0, null, null)

  override def update(b: GramAgg.Buffer, input: InternalRow): GramAgg.Buffer = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val d = arr.numElements()
      if (b.hi == null) b.alloc(d)
      require(d == b.dim, s"GramAgg: input dimension $d != first-seen ${b.dim}")
      val e = new Array[Long](d)
      var i = 0
      while (i < d) { e(i) = arr.getLong(i); i += 1 }
      // linear sums occupy cells [0, d); gram cells [d, d + d*d)
      i = 0
      while (i < d) { b.add(i, e(i)); i += 1 }
      var j = 0
      while (j < d) {
        val ej = e(j)
        val base = d + j * d
        var k = 0
        while (k < d) { b.add(base + k, ej * e(k)); k += 1 }
        j += 1
      }
      b.count += 1L
    }
    b
  }

  override def merge(b: GramAgg.Buffer, o: GramAgg.Buffer): GramAgg.Buffer = {
    if (o.hi != null) {
      if (b.hi == null) b.alloc(o.dim)
      require(o.dim == b.dim, s"GramAgg: merge dim ${o.dim} != ${b.dim}")
      var i = 0
      while (i < b.hi.length) {
        // 128-bit add of o's cell into b's cell
        val lo = b.lo(i); val olo = o.lo(i)
        val s = lo + olo
        val carry = ((lo & olo) | ((lo | olo) & ~s)) >>> 63
        b.lo(i) = s
        b.hi(i) = b.hi(i) + o.hi(i) + carry
        i += 1
      }
      b.count += o.count
    }
    b
  }

  override def eval(b: GramAgg.Buffer): Any = {
    if (b.hi == null) return null
    val out = new Array[AnyRef](1 + b.hi.length)
    out(0) = UTF8String.fromString(b.count.toString)
    var i = 0
    while (i < b.hi.length) {
      val big = java.math.BigInteger.valueOf(b.hi(i)).shiftLeft(64)
        .add(new java.math.BigInteger(java.lang.Long.toUnsignedString(b.lo(i))))
      out(i + 1) = UTF8String.fromString(big.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(b: GramAgg.Buffer): Array[Byte] = {
    val n = if (b.hi == null) 0 else b.hi.length
    val bb = java.nio.ByteBuffer.allocate(16 + 16 * n)
    bb.putLong(b.count)
    bb.putInt(b.dim)
    bb.putInt(n)
    var i = 0
    while (i < n) { bb.putLong(b.hi(i)); bb.putLong(b.lo(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): GramAgg.Buffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val count = bb.getLong
    val dim = bb.getInt
    val n = bb.getInt
    if (n == 0) new GramAgg.Buffer(count, 0, null, null)
    else {
      val hi = new Array[Long](n); val lo = new Array[Long](n)
      var i = 0
      while (i < n) { hi(i) = bb.getLong; lo(i) = bb.getLong; i += 1 }
      new GramAgg.Buffer(count, dim, hi, lo)
    }
  }

  override def withNewMutableAggBufferOffset(o: Int): GramAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): GramAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): GramAgg = copy(child = cs.head)
  override def prettyName: String = "gram_agg"
}

object GramAgg {
  /** 128-bit two's-complement cell accumulators: hi:lo long pairs. */
  final class Buffer(var count: Long, var dim: Int,
      var hi: Array[Long], var lo: Array[Long]) {
    def alloc(d: Int): Unit = {
      dim = d
      hi = new Array[Long](d + d * d)
      lo = new Array[Long](d + d * d)
    }
    /** b[i] += p, sign-extending p to 128 bits. */
    def add(i: Int, p: Long): Unit = {
      val old = lo(i)
      val s = old + p
      // unsigned carry of old + p, then sign extension of p into hi
      val carry = ((old & p) | ((old | p) & ~s)) >>> 63
      lo(i) = s
      hi(i) = hi(i) + (p >> 63) + carry
    }
  }

  import org.apache.spark.sql.graftbridge.Bridge.{column, expression}
  def gram_agg(c: Column): Column =
    column(GramAgg(expression(c)).toAggregateExpression())
}
