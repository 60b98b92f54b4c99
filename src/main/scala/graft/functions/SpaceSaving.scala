package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SpaceSaving heavy-hitter sketch (Metwally et al., "Efficient
  * computation of frequent and top-k elements in data streams") as a
  * mergeable TypedImperativeAggregate with O(k) state — the candidate
  * generator behind [[graft.text.TextQueries.heavyHitters]].
  *
  * Buffer = at most k (item → (count, err)) counters. update: hit
  * increments; miss inserts while capacity lasts, else EVICTS the
  * minimum counter m and adopts its count (count = m.count + 1,
  * err = m.count — the classic overestimate-and-remember move).
  * merge: per-item counter sums, then keep the k largest (mergeable-
  * summaries composition). Invariants: every counter OVERESTIMATES its
  * item's true count, and the evicted/trimmed minimum is ≤ (total
  * stream length)/k — so any item with true frequency above N/k
  * SURVIVES in the summary. With capacity comfortably above the query
  * threshold's reciprocal (k = 256 vs a 5% threshold ⇒ 12.8× margin),
  * the output is a guaranteed SUPERSET of the true heavy hitters;
  * an exact recount over just these ≤ k candidates then removes the
  * false positives. Candidate membership (not counts) can vary with
  * partition order once eviction kicks in — by the superset guarantee
  * the verified end result cannot.
  *
  * Eviction scans for the minimum counter (O(k)); a production k ≫ 10³
  * would keep the Stream-Summary min-bucket structure of the paper —
  * at k = 256 the scan is already memory-bandwidth noise. */
case class SpaceSaving(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[UTF8String, Array[Long]]] {

  require(k > 0, "SpaceSaving capacity must be positive")

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  // candidate terms only, sorted for determinism of the output ROW;
  // counts are sketch-internal (the consumer recounts exactly)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def createAggregationBuffer(): java.util.HashMap[UTF8String, Array[Long]] =
    new java.util.HashMap[UTF8String, Array[Long]]()

  private def minEntry(b: java.util.HashMap[UTF8String, Array[Long]]): UTF8String = {
    var minK: UTF8String = null
    var minC = Long.MaxValue
    val it = b.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getValue()(0) < minC) { minC = e.getValue()(0); minK = e.getKey }
    }
    minK
  }

  override def update(b: java.util.HashMap[UTF8String, Array[Long]],
      input: InternalRow): java.util.HashMap[UTF8String, Array[Long]] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String]
      val cur = b.get(s)
      if (cur != null) cur(0) += 1
      else if (b.size() < k) b.put(s.clone(), Array(1L, 0L))
      else {
        val mk = minEntry(b)
        val mc = b.remove(mk)(0)
        b.put(s.clone(), Array(mc + 1, mc))
      }
    }
    b
  }

  override def merge(b: java.util.HashMap[UTF8String, Array[Long]],
      o: java.util.HashMap[UTF8String, Array[Long]]): java.util.HashMap[UTF8String, Array[Long]] = {
    val it = o.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = b.get(e.getKey)
      if (cur != null) { cur(0) += e.getValue()(0); cur(1) += e.getValue()(1) }
      else b.put(e.getKey, Array(e.getValue()(0), e.getValue()(1)))
    }
    while (b.size() > k) b.remove(minEntry(b))
    b
  }

  override def eval(b: java.util.HashMap[UTF8String, Array[Long]]): Any = {
    val arr = new Array[Any](b.size())
    val it = b.keySet().iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    java.util.Arrays.sort(arr.asInstanceOf[Array[AnyRef]])
    new GenericArrayData(arr)
  }

  override def serialize(b: java.util.HashMap[UTF8String, Array[Long]]): Array[Byte] = {
    var total = 4
    val it0 = b.keySet().iterator()
    while (it0.hasNext) total += 4 + it0.next().numBytes() + 16
    val bb = java.nio.ByteBuffer.allocate(total)
    bb.putInt(b.size())
    val it = b.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val s = e.getKey.getBytes
      bb.putInt(s.length)
      bb.put(s)
      bb.putLong(e.getValue()(0))
      bb.putLong(e.getValue()(1))
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[UTF8String, Array[Long]] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val b = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val s = new Array[Byte](len)
      bb.get(s)
      b.put(UTF8String.fromBytes(s), Array(bb.getLong, bb.getLong))
      i += 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): SpaceSaving =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SpaceSaving =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): SpaceSaving = copy(child = cs.head)
  override def prettyName: String = "space_saving"
}

object SpaceSaving {
  import org.apache.spark.sql.graftbridge.Bridge.{column, expression}
  def space_saving(c: Column, k: Int): Column =
    column(SpaceSaving(expression(c), k).toAggregateExpression())
}
