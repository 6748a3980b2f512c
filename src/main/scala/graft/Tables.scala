package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Accessors for the driver testdata tables (TESTDATA.md).
  *
  * Stands in for the reference's three federated catalogs
  * (reference: data-loader/loader.py:313-322 places TPC-DS tables across
  * PostgreSQL / MongoDB / Elasticsearch; here every table is a parquet
  * DSv2 scan, which preserves the property that matters for planning:
  * filters and required columns are pushed into the source scan).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  /** events.ts arrives in whatever physical type the generator chose
    * for that round — TIMESTAMP(NANOS) (read as long nanos under
    * legacy.parquet.nanosAsLong) or TIMESTAMP(MICROS) without UTC
    * adjustment (read as TIMESTAMP_NTZ) — normalize both to a session
    * TIMESTAMP so every consumer sees one type. The session timezone
    * is pinned to UTC (GraftSession), so the NTZ cast preserves the
    * instant; this is how DuckDB sees the same naive-µs data. */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }
  /** The events table as a stringly-typed source: every column cast to
    * string — the shape the reference's ES loader produces
    * (loader.py:144 `default=str` serializes numerics and timestamps as
    * strings), forcing consumers to cast on read. */
  def eventsStringly(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d)
    e.select(e.columns.map(c => org.apache.spark.sql.functions.col(c)
      .cast("string").as(c)).toSeq: _*)
  }

  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Register all tables as temp views so `spark.sql` works with the same
    * names the DuckDB oracle uses. */
  def registerViews(spark: SparkSession, dir: String): Unit =
    names.foreach(n => table(spark, dir, n).createOrReplaceTempView(n))
}
