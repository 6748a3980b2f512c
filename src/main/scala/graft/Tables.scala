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

  /** Spread a CPU-heavy per-row derivation across the session's cores
    * when its input arrives in FEWER splits than half the default
    * parallelism — the local small-file case, where a one-split scan
    * otherwise runs a whole hashing/shingling map stage in one task
    * (optimization guide §2.5: "input skew … repartition immediately
    * after the read"). Decided from the ACTUAL split/block count, so
    * at scale — where inputs already carry many splits — it is the
    * identity; hash keys keep the shuffle deterministic under task
    * retries. Callers that WRITE downstream must size their output
    * partitioning themselves (see Dedup.buildBandIndex): letting this
    * fan-out leak into a written layout multiplies file counts. */
  def spread(df: DataFrame, keys: org.apache.spark.sql.Column*): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions * 2 >= target) df
    else df.repartition(target, keys: _*)
  }

  /** Register all tables as temp views so `spark.sql` works with the same
    * names the DuckDB oracle uses. */
  def registerViews(spark: SparkSession, dir: String): Unit =
    names.foreach(n => table(spark, dir, n).createOrReplaceTempView(n))
}
