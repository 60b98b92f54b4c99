package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** HyperLogLog distinct-count sketch (Flajolet/Fusy/Gandouet/Meunier,
  * AofA'07) as a mergeable TypedImperativeAggregate — the
  * constant-state sibling of the KMV estimator (§2.46): KMV keeps k
  * 64-bit minima and supports exact-below-k plus intersection
  * estimates; HLL keeps 2^p one-byte registers (4 KB at p=12) with
  * ~1.04/√m relative error, the shape every warehouse ships for
  * corpus-scale distinct counts, and registers merge by element-wise
  * MAX — fully associative/commutative, so partial aggregation and
  * day-over-day rollups compose exactly.
  *
  * Layout on the repo's 60-bit md5-prefix hash
  * ([[graft.text.TextFunctions.hash64]] — 15 hex chars, so bits 60+
  * are zero): bucket = LOW p bits (uniform), window w = h >> p (the
  * remaining 48 bits for p=12), rho = leading-zeros-in-window + 1 =
  * (48 − bitlen(w)) + 1, w = 0 → 49. The top-bits bucket convention
  * would read the four dead bits and collapse 4096 buckets to 256.
  *
  * Cross-engine determinism (the oracle replays registers in DuckDB
  * via the same integer ops; bitlen = length(bin(w))): the harmonic
  * denominator Σ 2^−M_j is summed as the INTEGER Σ 2^(49−M_j)
  * (each term a power of two ≤ 2^49, total < 2^61 — exact, so
  * register/row order cannot perturb a float accumulation); the only
  * float steps are one division and the α constant, identical
  * expressions on both engines, and the small-range linear-counting
  * branch (E ≤ 2.5m, V > 0 → m·ln(m/V)) compares DOUBLES derived
  * from the same integers. Estimates round to 4 dp in the query. */
case class HllSketch(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  import HllSketch._

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = DoubleType

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](M)

  override def update(b: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      val bucket = (h & (M - 1)).toInt
      val w = h >>> P
      val rho = (if (w == 0L) WindowBits + 1
                 else WindowBits - (64 - java.lang.Long.numberOfLeadingZeros(w)) + 1).toByte
      if (rho > b(bucket)) b(bucket) = rho
    }
    b
  }

  override def merge(b: Array[Byte], o: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < M) { if (o(i) > b(i)) b(i) = o(i); i += 1 }
    b
  }

  override def eval(b: Array[Byte]): Any = estimate(b)

  override def serialize(b: Array[Byte]): Array[Byte] = b
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(o: Int): HllSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): HllSketch = copy(child = cs.head)
  override def prettyName: String = "hll_sketch"
}

/** [[HllSketch]] variant that returns the RAW register array instead
  * of the estimate — the mergeable-state form: day-grain register
  * tables persist once, and ANY trailing window / cross-slice rollup
  * re-merges them by element-wise max without touching raw data (the
  * §2.202 pattern). Registers come back as array<int> so downstream
  * merging/estimation stays in codegen'd integer expressions. */
case class HllRegisters(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  import HllSketch._

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](M)

  override def update(b: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      val bucket = (h & (M - 1)).toInt
      val w = h >>> P
      val rho = (if (w == 0L) WindowBits + 1
                 else WindowBits - (64 - java.lang.Long.numberOfLeadingZeros(w)) + 1).toByte
      if (rho > b(bucket)) b(bucket) = rho
    }
    b
  }

  override def merge(b: Array[Byte], o: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < M) { if (o(i) > b(i)) b(i) = o(i); i += 1 }
    b
  }

  override def eval(b: Array[Byte]): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      b.map(_.toInt))

  override def serialize(b: Array[Byte]): Array[Byte] = b
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(o: Int): HllRegisters =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllRegisters =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): HllRegisters = copy(child = cs.head)
  override def prettyName: String = "hll_registers"
}

object HllRegisters {
  import org.apache.spark.sql.graftbridge.Bridge.{column, expression}
  def hll_registers(c: Column): Column =
    column(HllRegisters(expression(c)).toAggregateExpression())
}

object HllSketch {
  val P = 12
  val M: Int = 1 << P // 4096 registers
  val WindowBits: Int = 48 // 60-bit hash minus P bucket bits
  /** 2^WindowBits+1 scale for the exact integer harmonic sum. */
  val ScalePow: Int = WindowBits + 1

  /** The estimate from a register array — mirrored EXACTLY by the SQL
    * oracle (same integer sum, same float expression order). */
  def estimate(regs: Array[Byte]): Double = {
    var ssum = 0L
    var zeros = 0
    var i = 0
    while (i < M) {
      ssum += 1L << (ScalePow - regs(i))
      if (regs(i) == 0) zeros += 1
      i += 1
    }
    val alpha = 0.7213 / (1.0 + 1.079 / M)
    val eRaw = alpha * M * M * java.lang.Math.scalb(1.0, ScalePow) / ssum.toDouble
    if (eRaw <= 2.5 * M && zeros > 0) M * math.log(M.toDouble / zeros)
    else eRaw
  }

  import org.apache.spark.sql.graftbridge.Bridge.{column, expression}
  def hll_sketch(c: Column): Column =
    column(HllSketch(expression(c)).toAggregateExpression())
}
