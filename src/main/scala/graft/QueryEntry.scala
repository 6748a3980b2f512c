package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator: a Spark builder plus (when SQL-expressible) the
  * equivalent DuckDB oracle SQL over the same parquet tables. Column names
  * must match between the two — the driver sorts columns by name before
  * hashing values. */
case class QueryEntry(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryEntry {
  def apply(name: String, oracle: String)(
      build: (SparkSession, String) => DataFrame): QueryEntry =
    QueryEntry(name, build, Some(oracle))

  def noOracle(name: String)(
      build: (SparkSession, String) => DataFrame): QueryEntry =
    QueryEntry(name, build, None)
}
