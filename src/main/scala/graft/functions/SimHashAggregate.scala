package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, LongType, StringType}

/** 64-bit SimHash as a single-pass custom Catalyst aggregate.
  *
  * Buffer = 64 vote counters; each input token adds ±1 per bit of its
  * seed-0 XXH64 (same hash as the rest of the Trino-compat pack, so
  * fingerprints equal the compositional explode/re-aggregate
  * formulation). Partial aggregation applies: each map task reduces its
  * rows to one 64-long buffer per group before the shuffle — at scale
  * the exchange carries 512 bytes per (partition, doc), never per
  * token. Replaces both a 64-column aggregate (huge codegen unit) and
  * an explode(64x) + double shuffle (row blowup). */
case class SimHashAggregate(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def createAggregationBuffer(): Array[Long] = new Array[Long](64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = XxHash64Function.hash(v, child.dataType, 0L)
      var b = 0
      while (b < 64) {
        buf(b) += (((h >>> b) & 1L) * 2 - 1)
        b += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < 64) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = {
    var fp = 0L
    var b = 0
    while (b < 64) {
      if (buf(b) > 0) fp |= (1L << b)
      b += 1
    }
    fp
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(64 * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(64)(bb.getLong)
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes() =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"simhash_agg needs a string token column, got ${child.dataType}")

  override def withNewMutableAggBufferOffset(o: Int): SimHashAggregate =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SimHashAggregate =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): SimHashAggregate =
    copy(child = c.head)
}

object SimHashAggregate {
  /** simhash_agg(token) → 64-bit fingerprint per group. */
  def simhash_agg(tokens: Column): Column =
    GraftBridge.column(
      SimHashAggregate(GraftBridge.expression(tokens)).toAggregateExpression())
}
