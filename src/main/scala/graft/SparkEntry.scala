package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every implemented operator's [[QueryEntry]] from the
  * operator modules; each entry carries its own DuckDB oracle SQL where
  * the semantics are ANSI-SQL-expressible. */
object SparkEntry {

  def allEntries: Seq[QueryEntry] =
    operators.Relational.all ++ operators.TpchMore.all ++
      operators.TpchFull.all ++ operators.Fixtures.all ++
      operators.Temporal.all ++
      operators.TextAnalysis.all ++ operators.Dedup.all ++
      operators.Similarity.all ++ operators.Clustering.all ++
      operators.Multimodal.all ++
      operators.Pipeline.all ++
      operators.Loader.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    functions.TrinoFunctions.register(spark)
    operators.Relational.joinAggTopN.build(spark, "/root/testdata/sf0.001")
  }

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allEntries.map(e => e.name -> e.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allEntries.flatMap(e => e.oracle.map(e.name -> _)).toMap
}
