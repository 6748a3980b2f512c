package graft

import graft.functions.VectorFunctions.{cosine_similarity, squared_l2}
import org.apache.spark.sql.functions._

/** The codegen'd CosineSimilarity expression must agree bit-for-bit
  * with the composable higher-order-function formulation it replaced
  * (that formulation is what the DuckDB oracle mirrors). */
class VectorFunctionsSpec extends SparkSpec {

  test("cosine expression equals the zip_with/aggregate fold exactly") {
    val e = Tables.embeddings(spark, sf1).limit(100)
    val pairs = e.select(col("vec_id").as("a_id"), col("embedding").as("ea"))
      .crossJoin(e.select(col("vec_id").as("b_id"), col("embedding").as("eb")))
      .filter(col("a_id") < col("b_id")).limit(2000)
    val cmp = pairs
      .withColumn("fast", cosine_similarity(col("ea"), col("eb")))
      .withColumn("ref",
        expr("aggregate(zip_with(ea, eb, (x, y) -> cast(x as double) * cast(y as double)), 0D, (acc, v) -> acc + v)") /
          (sqrt(expr("aggregate(ea, 0D, (acc, x) -> acc + cast(x as double) * cast(x as double))")) *
            sqrt(expr("aggregate(eb, 0D, (acc, x) -> acc + cast(x as double) * cast(x as double))"))))
    // bit-for-bit: same double ops in the same order
    assert(cmp.filter(col("fast") =!= col("ref")).count() == 0)
    assert(cmp.count() > 0)
  }

  test("null array or null element yields null") {
    val df = spark.sql(
      """SELECT * FROM VALUES
        |  (array(1.0F, 2.0F), array(2.0F, 3.0F)),
        |  (array(1.0F, NULL), array(2.0F, 3.0F)),
        |  (NULL, array(2.0F, 3.0F))
        |AS t(a, b)""".stripMargin)
    val got = df.select(cosine_similarity(col("a"), col("b"))).collect()
    assert(!got(0).isNullAt(0))
    assert(got(1).isNullAt(0) && got(2).isNullAt(0))
  }

  test("length mismatch or zero-norm input yields null, not a value") {
    val df = spark.sql(
      """SELECT * FROM VALUES
        |  (array(1.0F, 2.0F), array(2.0F)),
        |  (array(0.0F, 0.0F), array(2.0F, 3.0F)),
        |  (array(1.0F, 2.0F), array(0.0F, 0.0F))
        |AS t(a, b)""".stripMargin)
    val got = df.select(cosine_similarity(col("a"), col("b"))).collect()
    assert(got.forall(_.isNullAt(0)))
  }

  test("self-similarity is 1.0 within ulps") {
    val e = Tables.embeddings(spark, sf1).limit(50)
    val got = e.select(cosine_similarity(col("embedding"), col("embedding")).as("c"))
      .collect().map(_.getDouble(0))
    assert(got.forall(c => math.abs(c - 1.0) < 1e-12))
  }

  test("squared_l2 equals the zip_with/aggregate fold exactly, self-distance 0") {
    val e = Tables.embeddings(spark, sf1).limit(100)
    val pairs = e.select(col("vec_id").as("a_id"), col("embedding").as("ea"))
      .crossJoin(e.select(col("vec_id").as("b_id"), col("embedding").as("eb")))
      .filter(col("a_id") < col("b_id")).limit(2000)
    val cmp = pairs
      .withColumn("fast", squared_l2(col("ea"), col("eb")))
      .withColumn("ref", expr(
        "aggregate(zip_with(ea, eb, (x, y) -> (cast(x as double) - cast(y as double)) * " +
          "(cast(x as double) - cast(y as double))), 0D, (acc, v) -> acc + v)"))
    // bit-for-bit: same double ops in the same order
    assert(cmp.filter(col("fast") =!= col("ref")).count() == 0)
    assert(cmp.count() > 0)
    val self = e.select(squared_l2(col("embedding"), col("embedding")).as("d"))
      .collect().map(_.getDouble(0))
    assert(self.forall(_ == 0.0))
  }

  test("squared_l2 null and length-mismatch semantics match cosine's") {
    val df = spark.sql(
      """SELECT * FROM VALUES
        |  (array(1.0F, 2.0F), array(2.0F, 3.0F)),
        |  (array(1.0F, NULL), array(2.0F, 3.0F)),
        |  (NULL, array(2.0F, 3.0F)),
        |  (array(1.0F, 2.0F), array(2.0F))
        |AS t(a, b)""".stripMargin)
    val got = df.select(squared_l2(col("a"), col("b"))).collect()
    assert(got(0).getDouble(0) == 2.0)
    assert(got(1).isNullAt(0) && got(2).isNullAt(0) && got(3).isNullAt(0))
  }
}
