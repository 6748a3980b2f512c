package graft

import graft.plans.GroupedTopK
import org.apache.spark.sql.functions._

/** The custom GroupedTopK physical operator must agree with the
  * window row_number formulation on every input shape. */
class GroupedTopKSpec extends SparkSpec {

  test("matches window row_number on orders (plan uses GroupedTopKExec)") {
    val custom = GroupedTopK.topK(
        Tables.orders(spark, sf1).select(col("o_custkey"), col("o_orderkey"), col("o_totalprice")),
        Seq("o_custkey"),
        Seq("o_totalprice" -> true, "o_orderkey" -> false), 3)
    // physical nodes print without the Exec suffix
    assert(custom.queryExecution.executedPlan.toString.contains("GroupedTopK "))
    val got = custom.collect().map(_.toString).sorted.toSeq
    val ref = SparkEntry.queries("q17_window_topk")(spark, sf1)
      .withColumnRenamed("rn", "rank")
      .collect().map(_.toString).sorted.toSeq
    assert(got == ref && got.nonEmpty)
  }

  test("k larger than any group returns all rows ranked") {
    val df = GroupedTopK.topK(
      Tables.nation(spark, sf1),
      Seq("n_regionkey"),
      Seq("n_nationkey" -> false), 1000)
    assert(df.count() == Tables.nation(spark, sf1).count())
    assert(df.agg(max(col("rank"))).head().getInt(0) <= 25)
  }

  test("k = 1 picks each group's best row") {
    val df = GroupedTopK.topK(
      Tables.lineitem(spark, sf1).select(col("l_suppkey"), col("l_orderkey"),
        col("l_linenumber"), col("l_quantity")),
      Seq("l_suppkey"),
      Seq("l_quantity" -> true, "l_orderkey" -> false, "l_linenumber" -> false), 1)
    val viaWindow = Tables.lineitem(spark, sf1)
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("l_suppkey"))
          .orderBy(col("l_quantity").desc, col("l_orderkey").asc, col("l_linenumber").asc)))
      .filter(col("rn") === 1)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      .collect().map(_.toString).sorted.toSeq
    val got = df.drop("rank").collect().map(_.toString).sorted.toSeq
    assert(got == viaWindow)
  }

  test("is invariant to input partitioning") {
    def run(parts: Int) = GroupedTopK.topK(
        Tables.orders(spark, sf1).repartition(parts)
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice")),
        Seq("o_custkey"),
        Seq("o_totalprice" -> true, "o_orderkey" -> false), 2)
      .collect().map(_.toString).sorted.toSeq
    assert(run(1) == run(13))
  }
}
