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

  /** cosine(a, b) over array<float>/array<double> columns → double.
    * Null input array, differing array lengths, any null element, or a
    * zero-norm input (undefined cosine) → null — mirroring the
    * zip_with+aggregate formulation's null semantics rather than
    * returning a truncated or NaN value. */
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
        case ArrayType(FloatType | DoubleType, _) => true
        case _ => false
      }
      if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"cosine_similarity needs array<float|double>, got ${left.dataType}, ${right.dataType}")
    }

    override def nullSafeEval(a: Any, b: Any): Any = {
      val arrA = a.asInstanceOf[ArrayData]
      val arrB = b.asInstanceOf[ArrayData]
      val n = arrA.numElements()
      if (arrB.numElements() != n) return null
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      val fa = elemType(left) == FloatType
      val fb = elemType(right) == FloatType
      while (i < n) {
        if (arrA.isNullAt(i) || arrB.isNullAt(i)) return null
        val x: Double = if (fa) arrA.getFloat(i).toDouble else arrA.getDouble(i)
        val y: Double = if (fb) arrB.getFloat(i).toDouble else arrB.getDouble(i)
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
      if (na == 0.0 || nb == 0.0) return null
      dot / (math.sqrt(na) * math.sqrt(nb))
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val getA = if (elemType(left) == FloatType) "getFloat" else "getDouble"
      val getB = if (elemType(right) == FloatType) "getFloat" else "getDouble"
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

  def cosine_similarity(a: Column, b: Column): Column =
    GraftBridge.column(CosineSimilarity(GraftBridge.expression(a), GraftBridge.expression(b)))

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_similarity", exprs => CosineSimilarity(exprs(0), exprs(1)), "built-in")
}
