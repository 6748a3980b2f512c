package graft

/** Dual entry points (SURVEY.md §3.1): the same queries through
  * `spark.sql` text over registered views must equal the DataFrame-API
  * builders. */
class SqlSurfaceSpec extends SparkSpec {

  private def sorted(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("SQL text equals DataFrame API for representative queries") {
    Tables.registerViews(spark, sf1)
    val cases = Seq(
      "q02_scan_group_agg" ->
        """SELECT o_orderstatus,
          |       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sales,
          |       COUNT(*) AS n
          |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
      "q03_join_agg_topn" ->
        """SELECT n_name, COUNT(*) AS orders
          |FROM orders JOIN customer ON o_custkey = c_custkey
          |            JOIN nation ON c_nationkey = n_nationkey
          |GROUP BY n_name ORDER BY orders DESC, n_name LIMIT 20""".stripMargin,
      "q05_except_chain_count" ->
        """SELECT COUNT(*) AS cnt FROM (
          |  (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O')
          |  EXCEPT
          |  (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F')
          |  EXCEPT
          |  (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'P')
          |)""".stripMargin)
    cases.foreach { case (name, sql) =>
      val viaDf = sorted(SparkEntry.queries(name)(spark, sf1))
      val viaSql = sorted(spark.sql(sql))
      assert(viaDf == viaSql, s"$name SQL/DataFrame mismatch")
    }
  }

  test("vector expressions are callable from SQL text") {
    import graft.functions.VectorFunctions.{cosine_similarity, squared_l2}
    import org.apache.spark.sql.functions.col
    Tables.registerViews(spark, sf1)
    val viaSql = sorted(spark.sql(
      """SELECT vec_id,
        |       cosine_similarity(embedding, embedding) AS c,
        |       squared_l2(embedding, embedding) AS d
        |FROM embeddings WHERE vec_id < 20""".stripMargin))
    val viaDf = sorted(Tables.embeddings(spark, sf1).filter(col("vec_id") < 20)
      .select(col("vec_id"),
        cosine_similarity(col("embedding"), col("embedding")).as("c"),
        squared_l2(col("embedding"), col("embedding")).as("d")))
    assert(viaSql == viaDf && viaSql.nonEmpty)
  }
}
