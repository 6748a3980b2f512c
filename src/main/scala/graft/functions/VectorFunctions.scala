package graft.functions

import org.apache.spark.sql.{Column, GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Vector similarity as native Catalyst expressions.
  *
  * The composable formulation (`aggregate(zip_with(...))`) is correct
  * but higher-order functions evaluate interpreted, outside whole-stage
  * codegen — too slow for the ANN hot loop. [[CosineSimilarity]] emits a
  * tight primitive loop via doGenCode, with double accumulation in
  * ascending index order, exactly matching the sequential fold the
  * DuckDB oracle uses — results are bit-identical to the composed form. */
object VectorFunctions {

  /** cosine(a, b) over array<float>/array<double>/array<tinyint>
    * columns → double. Null input array, differing array lengths, any
    * null element, or a zero-norm input (undefined cosine) → null —
    * mirroring the zip_with+aggregate formulation's null semantics
    * rather than returning a truncated or NaN value. The tinyint form
    * lets scalar-quantized int8 codes (s09) score inside the same
    * codegen'd loop — no interpreted transform-to-double in the hot
    * path. */
  case class CosineSimilarity(left: Expression, right: Expression)
      extends BinaryExpression {

    override def dataType: DataType = DoubleType

    // a null *element* also yields null, independent of input-array
    // nullability — keep isNull a real variable in codegen
    override def nullable: Boolean = true

    private def elemType(e: Expression): DataType =
      e.dataType.asInstanceOf[ArrayType].elementType

    override def checkInputDataTypes(): TypeCheckResult = {
      def ok(e: Expression) = e.dataType match {
        case ArrayType(FloatType | DoubleType | ByteType, _) => true
        case _ => false
      }
      if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"cosine_similarity needs array<float|double|tinyint>, got ${left.dataType}, ${right.dataType}")
    }

    private def getter(t: DataType): String = t match {
      case FloatType => "getFloat"
      case ByteType  => "getByte"
      case _         => "getDouble"
    }

    override def nullSafeEval(a: Any, b: Any): Any = {
      val arrA = a.asInstanceOf[ArrayData]
      val arrB = b.asInstanceOf[ArrayData]
      val n = arrA.numElements()
      if (arrB.numElements() != n) return null
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      def get(arr: ArrayData, i: Int, t: DataType): Double = t match {
        case FloatType => arr.getFloat(i).toDouble
        case ByteType  => arr.getByte(i).toDouble
        case _         => arr.getDouble(i)
      }
      val ta = elemType(left); val tb = elemType(right)
      while (i < n) {
        if (arrA.isNullAt(i) || arrB.isNullAt(i)) return null
        val x = get(arrA, i, ta)
        val y = get(arrB, i, tb)
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
      if (na == 0.0 || nb == 0.0) return null
      dot / (math.sqrt(na) * math.sqrt(nb))
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val getA = getter(elemType(left))
      val getB = getter(elemType(right))
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val dot = ctx.freshName("dot")
        val na = ctx.freshName("na")
        val nb = ctx.freshName("nb")
        s"""
           |int $n = $a.numElements();
           |if ($b.numElements() != $n) { ${ev.isNull} = true; }
           |double $dot = 0.0, $na = 0.0, $nb = 0.0;
           |if (!${ev.isNull}) {
           |  for (int $i = 0; $i < $n; $i++) {
           |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
           |    double x = (double) $a.$getA($i);
           |    double y = (double) $b.$getB($i);
           |    $dot += x * y; $na += x * x; $nb += y * y;
           |  }
           |}
           |if (!${ev.isNull} && ($na == 0.0 || $nb == 0.0)) { ${ev.isNull} = true; }
           |if (!${ev.isNull}) {
           |  ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
           |}
         """.stripMargin
      })
    }

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): CosineSimilarity =
      copy(left = newLeft, right = newRight)
  }

  /** squared L2 distance ‖a − b‖² over array<float|double|tinyint>
    * columns → double, accumulated in ascending index order — a pure
    * per-row function, so the result is the SAME double at any
    * partitioning (unlike a sum over exploded per-dimension rows,
    * whose accumulation order varies — the reason pqTrain's original
    * assignment needed decimal). Null/length semantics mirror
    * [[CosineSimilarity]]; zero-norm is meaningful here so no norm
    * guard. */
  case class SquaredL2(left: Expression, right: Expression)
      extends BinaryExpression {

    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true

    private def elemType(e: Expression): DataType =
      e.dataType.asInstanceOf[ArrayType].elementType

    override def checkInputDataTypes(): TypeCheckResult = {
      def ok(e: Expression) = e.dataType match {
        case ArrayType(FloatType | DoubleType | ByteType, _) => true
        case _ => false
      }
      if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"squared_l2 needs array<float|double|tinyint>, got ${left.dataType}, ${right.dataType}")
    }

    private def getter(t: DataType): String = t match {
      case FloatType => "getFloat"
      case ByteType  => "getByte"
      case _         => "getDouble"
    }

    override def nullSafeEval(a: Any, b: Any): Any = {
      val arrA = a.asInstanceOf[ArrayData]
      val arrB = b.asInstanceOf[ArrayData]
      val n = arrA.numElements()
      if (arrB.numElements() != n) return null
      def get(arr: ArrayData, i: Int, t: DataType): Double = t match {
        case FloatType => arr.getFloat(i).toDouble
        case ByteType  => arr.getByte(i).toDouble
        case _         => arr.getDouble(i)
      }
      val ta = elemType(left); val tb = elemType(right)
      var acc = 0.0
      var i = 0
      while (i < n) {
        if (arrA.isNullAt(i) || arrB.isNullAt(i)) return null
        val d = get(arrA, i, ta) - get(arrB, i, tb)
        acc += d * d
        i += 1
      }
      acc
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val getA = getter(elemType(left))
      val getB = getter(elemType(right))
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val acc = ctx.freshName("acc")
        val d = ctx.freshName("d")
        s"""
           |int $n = $a.numElements();
           |if ($b.numElements() != $n) { ${ev.isNull} = true; }
           |double $acc = 0.0;
           |if (!${ev.isNull}) {
           |  for (int $i = 0; $i < $n; $i++) {
           |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
           |    double $d = (double) $a.$getA($i) - (double) $b.$getB($i);
           |    $acc += $d * $d;
           |  }
           |}
           |if (!${ev.isNull}) { ${ev.value} = $acc; }
         """.stripMargin
      })
    }

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): SquaredL2 =
      copy(left = newLeft, right = newRight)
  }

  def cosine_similarity(a: Column, b: Column): Column =
    GraftBridge.column(CosineSimilarity(GraftBridge.expression(a), GraftBridge.expression(b)))

  def squared_l2(a: Column, b: Column): Column =
    GraftBridge.column(SquaredL2(GraftBridge.expression(a), GraftBridge.expression(b)))

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_similarity", exprs => CosineSimilarity(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "squared_l2", exprs => SquaredL2(exprs(0), exprs(1)), "built-in")
  }
}
