package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._

/** Salting utilities must be result-equivalent to their unsalted
  * forms on a synthetically skewed key distribution (~30% of rows on
  * one hot key). */
class SkewSpec extends SparkSpec {

  private lazy val skewed = Tables.lineitem(spark, sf1)
    .withColumn("k", when(col("l_orderkey") % 10 < 3, lit(1L)).otherwise(col("l_orderkey")))

  private lazy val dim = skewed.select(col("k")).distinct()
    .withColumn("payload", col("k") * 2)

  test("saltedJoin equals plain join on a skewed key") {
    val plain = skewed.join(dim, Seq("k"))
      .select(col("k"), col("l_orderkey"), col("l_linenumber"), col("payload"))
      .collect().map(_.toString).sorted.toSeq
    val salted = Skew.saltedJoin(skewed, dim, "k", col("l_orderkey") + col("l_linenumber"), 8)
      .select(col("k"), col("l_orderkey"), col("l_linenumber"), col("payload"))
      .collect().map(_.toString).sorted.toSeq
    assert(salted == plain && plain.nonEmpty)
  }

  test("saltedCountSum equals direct aggregation on a skewed key") {
    val direct = skewed.groupBy(col("k"))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("total"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val salted = Skew.saltedCountSum(skewed, "k", "l_quantity",
        col("l_orderkey") + col("l_linenumber"), 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(direct == salted && direct.nonEmpty)
  }
}
