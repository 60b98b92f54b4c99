package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The k smallest DISTINCT strings, as a mergeable
  * TypedImperativeAggregate with O(k) state — the bounded engine
  * behind DQ failing-row samples ([[graft.dq.Expectations.run]]).
  *
  * collect_set would buffer EVERY distinct violating key before the
  * final slice — unbounded aggregation state at corpus scale; this
  * keeps at most k strings per partial buffer (update: insert+trim,
  * merge: union+trim), so the sample column costs O(k) memory per
  * partition regardless of how many rows violate. Output is the
  * sorted array of ≤ k smallest distinct values — identical to
  * DuckDB's list_slice(list_sort(list(DISTINCT …)), 1, k) as long as
  * both sides compare binary/ASCII (keys are rendered with CAST). */
case class MinKStrings(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[UTF8String]] {

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def createAggregationBuffer(): java.util.TreeSet[UTF8String] =
    new java.util.TreeSet[UTF8String]()

  private def trim(b: java.util.TreeSet[UTF8String]): Unit =
    while (b.size() > k) b.pollLast()

  override def update(b: java.util.TreeSet[UTF8String],
      input: InternalRow): java.util.TreeSet[UTF8String] = {
    val v = child.eval(input)
    if (v != null) {
      // clone: eval may return a buffer-backed UTF8String that the
      // scan reuses for the next row
      b.add(v.asInstanceOf[UTF8String].clone())
      trim(b)
    }
    b
  }

  override def merge(b: java.util.TreeSet[UTF8String],
      o: java.util.TreeSet[UTF8String]): java.util.TreeSet[UTF8String] = {
    b.addAll(o)
    trim(b)
    b
  }

  override def eval(b: java.util.TreeSet[UTF8String]): Any = {
    val arr = new Array[Any](b.size())
    val it = b.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    new GenericArrayData(arr)
  }

  override def serialize(b: java.util.TreeSet[UTF8String]): Array[Byte] = {
    var total = 4
    val it0 = b.iterator()
    while (it0.hasNext) total += 4 + it0.next().numBytes()
    val bb = java.nio.ByteBuffer.allocate(total)
    bb.putInt(b.size())
    val it = b.iterator()
    while (it.hasNext) {
      val s = it.next().getBytes
      bb.putInt(s.length)
      bb.put(s)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[UTF8String] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val b = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val s = new Array[Byte](len)
      bb.get(s)
      b.add(UTF8String.fromBytes(s))
      i += 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): MinKStrings =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MinKStrings =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): MinKStrings = copy(child = cs.head)
  override def prettyName: String = "min_k_strings"
}

object MinKStrings {
  import org.apache.spark.sql.graftbridge.Bridge.{column, expression}
  def min_k_strings(c: Column, k: Int): Column =
    column(MinKStrings(expression(c), k).toAggregateExpression())
}
