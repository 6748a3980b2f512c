package graft.functions

import org.apache.spark.sql.{Column, GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Trino-compatibility scalar functions.
  *
  * The reference's loader buckets rows with
  * `mod(bitwise_and(from_big_endian_64(xxhash64(to_utf8(cast(k as varchar)))),
  * 9223372036854775807), n)` (reference: data-loader/loader.py:213-218).
  * Trino's xxhash64 uses seed 0 and returns big-endian bytes; Spark's
  * built-in `xxhash64` uses seed 42 and returns a long. We reuse Spark's
  * codegen'd [[XxHash64]] hash expression with seed 0, so
  * `trino_xxhash64(string)` equals Trino's
  * `from_big_endian_64(xxhash64(to_utf8(x)))` composition directly —
  * whole-stage-codegen friendly, no UDF.
  */
object TrinoFunctions {

  /** Big-endian 8-byte binary -> signed long (Trino from_big_endian_64). */
  case class FromBigEndian64(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def checkInputDataTypes() = {
      if (child.dataType == BinaryType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"from_big_endian_64 needs binary input, got ${child.dataType}")
    }
    override def nullSafeEval(v: Any): Any =
      TrinoFunctions.bigEndianLong(v.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, b => s"graft.functions.TrinoFunctions.bigEndianLong($b)")
    override protected def withNewChildInternal(c: Expression): FromBigEndian64 = copy(c)
  }

  // Called from generated code — must stay public static-like.
  def bigEndianLong(bytes: Array[Byte]): Long = {
    require(bytes.length == 8, s"expected 8 bytes, got ${bytes.length}")
    java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.BIG_ENDIAN).getLong
  }

  /** Seed-0 XXH64 over any input, as a long (== Trino
    * from_big_endian_64(xxhash64(to_utf8(x))) for string input). */
  def trino_xxhash64(cols: Column*): Column =
    GraftBridge.column(XxHash64(cols.map(GraftBridge.expression), 0L))

  /** Trino to_utf8: string -> binary. */
  def to_utf8(c: Column): Column = encode(c, "UTF-8")

  def from_big_endian_64(c: Column): Column =
    GraftBridge.column(FromBigEndian64(GraftBridge.expression(c)))

  /** The loader's deterministic bucket id (loader.py:213-218 semantics):
    * pmod(xxh64_seed0(cast(key as string)) & Long.MaxValue, buckets). */
  def trino_bucket(key: Column, buckets: Int): Column =
    pmod(trino_xxhash64(key.cast("string")).bitwiseAND(lit(Long.MaxValue)), lit(buckets.toLong))

  /** Register SQL-callable versions in the session's function registry. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "trino_xxhash64", exprs => XxHash64(exprs, 0L), "built-in")
    reg.createOrReplaceTempFunction(
      "from_big_endian_64", exprs => FromBigEndian64(exprs.head), "built-in")
  }
}
