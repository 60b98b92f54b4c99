package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the text-hashing hot path.
  *
  * The dedup/similarity pipeline originally composed Spark's
  * higher-order array functions (transform/aggregate). Those are
  * CodegenFallback AND interpreted per element; worse, CollapseProject
  * inlines an upstream expression into every element-level reference,
  * turning O(tokens) work into O(tokens × refs) (measured: 66 s vs
  * ~1 s at sf0.1 for shingle hashing — and a repartition is NOT a
  * barrier, the optimizer folds projections straight through it).
  * These expressions run the same arithmetic as tight compiled loops:
  * one virtual call per ROW instead of per element.
  *
  * Semantics are bit-identical to the DuckDB oracle SQL in
  * [[graft.text.TextFunctions]] / [[graft.dedup.Dedup]]:
  *   normalize  = regexp_replace(lower(s), '[^a-z0-9 ]', '', 'g')
  *   tokens     = string_split_regex(trim(n), '\s+')
  *   tokenHash  = fold (h*131 + code) % 1e9+7 over chars (empty → [0])
  *   shingle    = fold (acc*131 + th[i+j]) % 1e9+7 over k-window
  *   minhash_i  = min over shingles of (A_i*h + B_i) % 2147483647
  *   simhash    = bit j set iff Σ tokens (±1 on bit j of hash) > 0
  */
object HashConstants {
  val M: Long = 1000000007L
  val P: Long = 2147483647L
  def hashA(i: Int): Long = 1103515245L + 997L * i
  def hashB(i: Int): Long = 12345L + 7919L * i
}

/** Codegen support shared by the graft kernels: instead of
  * CodegenFallback (which breaks whole-stage codegen for the whole
  * containing stage and routes rows through InternalRow conversion),
  * emit a direct call to this expression's compiled `compute` kernel —
  * the stage stays fused, the kernel loop stays compiled Scala. */
trait KernelCodegen { self: UnaryExpression =>
  import org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
  def compute(input: Any): Any
  override protected def nullSafeEval(input: Any): Any = compute(input)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("graftKernel", this, classOf[KernelCodegen].getName)
      val res = ctx.freshName("graftRes")
      val javaT = CodeGenerator.javaType(dataType)
      // janino rejects a direct Object→primitive cast; go through the
      // boxed type and unbox. Reference types cast directly.
      val assign =
        if (CodeGenerator.isPrimitiveType(dataType))
          s"${ev.value} = ((${CodeGenerator.boxedType(dataType)}) $res).${javaT}Value();"
        else
          s"${ev.value} = ($javaT) $res;"
      if (nullable)
        s"""Object $res = $ref.compute($c);
           |if ($res == null) { ${ev.isNull} = true; } else { $assign }""".stripMargin
      else
        s"""Object $res = $ref.compute($c);
           |$assign""".stripMargin
    })
}

/** text → array<long> of per-token polynomial hashes of the normalized
  * text (single pass, no intermediate strings). */
case class TokenPolyHashes(child: Expression)
    extends UnaryExpression with KernelCodegen {
  import HashConstants.M
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def compute(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString.toLowerCase
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var h = 0L
    var inTok = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        h = (h * 131 + c.toInt) % M
        inTok = true
      } else if (c == ' ') {
        if (inTok) { out += h; h = 0L; inTok = false }
      } // any other char: dropped by normalize (tokens glue together)
      i += 1
    }
    if (inTok) out += h
    if (out.isEmpty) out += 0L // split of empty text yields [''] → hash 0
    new GenericArrayData(out.toArray)
  }
  override protected def withNewChildInternal(c: Expression): TokenPolyHashes = copy(c)
}

/** array<long> token hashes → array<long> k-shingle hashes. */
case class ShinglePolyHashes(child: Expression, k: Int)
    extends UnaryExpression with KernelCodegen {
  import HashConstants.M
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def compute(input: Any): Any = {
    val th = input.asInstanceOf[ArrayData].toLongArray()
    val n = th.length - (k - 1)
    if (n <= 0) return new GenericArrayData(Array.empty[Long])
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      var acc = 0L
      var j = 0
      while (j < k) { acc = (acc * 131 + th(i + j)) % M; j += 1 }
      out(i) = acc
      i += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression): ShinglePolyHashes = copy(c)
}

/** array<long> shingle hashes → array<long> MinHash signature. */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression with KernelCodegen {
  import HashConstants._
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def compute(input: Any): Any = {
    val sh = input.asInstanceOf[ArrayData].toLongArray()
    if (sh.isEmpty) return null // matches array_min over empty
    val out = Array.fill(numHashes)(Long.MaxValue)
    var s = 0
    while (s < sh.length) {
      val h = sh(s)
      var i = 0
      while (i < numHashes) {
        val v = (hashA(i) * h + hashB(i)) % P
        if (v < out(i)) out(i) = v
        i += 1
      }
      s += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression): MinHashSignature = copy(c)
}

/** array<long> token hashes → long SimHash (bits-wide). */
case class SimHash(child: Expression, bits: Int)
    extends UnaryExpression with KernelCodegen {
  override def dataType: DataType = LongType
  override def compute(input: Any): Any = {
    val th = input.asInstanceOf[ArrayData].toLongArray()
    val counts = new Array[Int](bits)
    var t = 0
    while (t < th.length) {
      val h = th(t)
      var j = 0
      while (j < bits) {
        if (((h >> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
      t += 1
    }
    var sim = 0L
    var j = 0
    while (j < bits) { if (counts(j) > 0) sim |= (1L << j); j += 1 }
    java.lang.Long.valueOf(sim)
  }
  override protected def withNewChildInternal(c: Expression): SimHash = copy(c)
}

/** array<float> embedding → long LSH bucket id: sign bits of `planes`
  * deterministic pseudo-random hyperplane projections. Same arithmetic
  * as the DuckDB rendering in [[graft.ann.Ann.bucketSql]]: coefficient
  * c(p,d) from an LCG on p*dim+d, sequential double accumulation. */
case class HyperplaneBucket(child: Expression, planes: Int, dim: Int)
    extends UnaryExpression with KernelCodegen {
  override def dataType: DataType = LongType
  override def compute(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData].toFloatArray()
    var bucket = 0L
    var p = 0
    while (p < planes) {
      var s = 0.0
      var d = 0
      while (d < dim) {
        val c = ((1103515245L * (p * dim + d) + 12345L) % 2147483647L) / 2147483647.0 - 0.5
        s += c * v(d).toDouble
        d += 1
      }
      if (s > 0) bucket |= (1L << p)
      p += 1
    }
    java.lang.Long.valueOf(bucket)
  }
  override protected def withNewChildInternal(c: Expression): HyperplaneBucket = copy(c)
}

/** array<string> tokens → long count of tokens contained in a fixed
  * set (stopword/marker scoring) — replaces the interpreted
  * size(filter(toks, t -> t IN (...))) lambda in the text hot path. */
case class TokensInSetCount(child: Expression, set: Seq[String])
    extends UnaryExpression with KernelCodegen {
  override def dataType: DataType = LongType
  @transient private lazy val lookup: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](set.size * 2)
    set.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }
  override def compute(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    var n = 0L
    var i = 0
    val len = arr.numElements()
    while (i < len) {
      if (lookup.contains(arr.getUTF8String(i))) n += 1
      i += 1
    }
    java.lang.Long.valueOf(n)
  }
  override protected def withNewChildInternal(c: Expression): TokensInSetCount = copy(c)
}

/** Column-level wrappers (Spark 4: Columns wrap ColumnNodes, so
  * Expression-backed Columns go through classic.ExpressionUtils). */
object native {
  import org.apache.spark.sql.graftbridge.Bridge.{column, expression}
  def token_poly_hashes(c: Column): Column = column(TokenPolyHashes(expression(c)))
  def shingle_hashes(c: Column, k: Int): Column = column(ShinglePolyHashes(expression(c), k))
  def minhash_signature(c: Column, n: Int): Column = column(MinHashSignature(expression(c), n))
  def simhash(c: Column, bits: Int): Column = column(SimHash(expression(c), bits))
  def hyperplane_bucket(c: Column, planes: Int, dim: Int): Column =
    column(HyperplaneBucket(expression(c), planes, dim))
  def tokens_in_set_count(c: Column, set: Seq[String]): Column =
    column(TokensInSetCount(expression(c), set))
}
