package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** k-permutation MinHash signature as a single-pass custom Catalyst
  * aggregate.
  *
  * Buffer = k running minima. Each input token is hashed TWICE (seed-0
  * and seed-1 XXH64) and the k per-permutation hashes derive as
  * h_j = h1 + j·h2 (double hashing, Kirsch–Mitzenmacher) — the standard
  * construction whose collision behavior matches k independent hashes
  * for MinHash/Bloom use. Compared with k independent `min(xxhash64(s,
  * seed_j))` aggregate expressions this does 2 hash evaluations per row
  * instead of k (the dominant cost at corpus scale: the shingle
  * relation is ~|corpus| tokens), and partial aggregation still
  * applies — each map task reduces to one k·8-byte buffer per doc
  * before the shuffle, so the exchange never carries per-token rows. */
case class MinHashAggregate(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(k)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h1 = XxHash64Function.hash(v, child.dataType, 0L)
      // force the increment odd so the k derived hashes stay distinct
      val h2 = XxHash64Function.hash(v, child.dataType, 1L) | 1L
      var acc = h1
      var j = 0
      while (j < k) {
        if (acc < buf(j)) buf(j) = acc
        acc += h2
        j += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf.clone())

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(k * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(k)(bb.getLong)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes() =
    if (child.dataType == StringType && k > 0)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"minhash_agg needs a string token column and k > 0, got ${child.dataType}, k=$k")

  override def withNewMutableAggBufferOffset(o: Int): MinHashAggregate =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MinHashAggregate =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): MinHashAggregate =
    copy(child = c.head)
}

object MinHashAggregate {
  /** minhash_agg(token, k) → array<long> signature of k running minima
    * per group. */
  def minhash_agg(tokens: Column, k: Int): Column =
    GraftBridge.column(
      MinHashAggregate(GraftBridge.expression(tokens), k).toAggregateExpression())
}
