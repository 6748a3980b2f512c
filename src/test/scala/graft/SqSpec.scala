package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, ByteType}

/** s09 scalar-quantization structural gates: the 1-byte-per-dimension
  * claim rests on the codes column actually being array<tinyint> with
  * every code in [-127, 127], and the (scale, codes) pair being a
  * faithful encoding — reconstruction within half a quantization step
  * per dimension. Recall quality is gated separately in RecallSpec. */
class SqSpec extends SparkSpec {

  private lazy val coded = Similarity.sqEncode(
    spark.read.parquet(s"$sf2/embeddings.parquet"))

  test("codes are array<tinyint> with every code in [-127, 127]") {
    assert(coded.schema("codes").dataType == ArrayType(ByteType, containsNull = false)
      || coded.schema("codes").dataType == ArrayType(ByteType, containsNull = true),
      s"codes type is ${coded.schema("codes").dataType}")
    val offenders = coded
      .select(explode(col("codes")).as("c"))
      .filter(col("c") > 127 || col("c") < -127)
      .count()
    assert(offenders == 0, s"$offenders codes outside [-127, 127]")
  }

  test("reconstruction error is within half a quantization step per dim") {
    // |x_i − code_i·scale| ≤ scale/2 for every dimension — round()'s
    // guarantee, surviving the float→double casts (tiny ulp headroom).
    val e = spark.read.parquet(s"$sf2/embeddings.parquet")
    val bad = Similarity.sqEncode(e)
      .join(e, Seq("vec_id"))
      .select(col("vec_id"), col("scale"),
        expr("aggregate(zip_with(embedding, codes, " +
          "(x, c) -> abs(CAST(x AS DOUBLE) - CAST(c AS DOUBLE) * scale)), " +
          "0D, (m, v) -> greatest(m, v))").as("maxerr"))
      .filter(col("maxerr") > col("scale") * 0.5 * 1.000001)
      .count()
    assert(bad == 0, s"$bad vectors reconstruct outside scale/2")
  }

  test("scale is strictly positive and zero vectors encode to zero codes") {
    assert(coded.filter(col("scale") <= 0d).count() == 0)
    // a synthetic zero vector goes through the scale floor, not NaN
    import spark.implicits._
    val z = Seq((0L, Array.fill(8)(0f))).toDF("vec_id", "embedding")
    val r = Similarity.sqEncode(z).select(col("codes")).collect()(0)
      .getSeq[Byte](0)
    assert(r.forall(_ == 0), s"zero vector encoded as $r")
  }
}
