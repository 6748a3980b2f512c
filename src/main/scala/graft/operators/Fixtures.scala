package graft.operators

import graft.{QueryEntry, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Fixture-shaped operators mirroring reference behaviors the base
  * testdata schema does not exercise directly:
  *
  *  - char(n)/bpchar padded group-by with a NULL group (reference q003
  *    groups by `ca_state char(2)` and its golden output carries a NULL
  *    group row — results/q003/workers-1/results.txt:12). The padded
  *    representation is made explicit with rpad so both engines hash
  *    the same 2-char values; real Spark CharType pad/compare semantics
  *    are additionally covered by CharTypeSpec.
  *  - stringly-typed cast-on-read (reference loader.py:144 ships every
  *    ES field with `default=str`, so numeric/date columns arrive as
  *    strings and every query casts on read). The string round-trip is
  *    lossless for long/double/timestamp, so the DuckDB oracle can
  *    state the typed query directly.
  */
object Fixtures {

  /** char(2)-style padded group-by with a NULL group in the output. */
  val charGroupBy: QueryEntry = QueryEntry(
    "q68_char_groupby",
    """WITH c AS (
      |  SELECT CASE WHEN c_custkey % 11 = 0 THEN NULL
      |              ELSE rpad(substring(c_mktsegment, 1, 1), 2, ' ') END AS state,
      |         c_acctbal
      |  FROM customer)
      |SELECT state, COUNT(*) AS n,
      |       CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS bal
      |FROM c
      |WHERE state = rpad('B', 2, ' ') OR state = rpad('A', 2, ' ') OR state IS NULL
      |GROUP BY state ORDER BY state""".stripMargin
  ) { (s, d) =>
    val state = when(col("c_custkey") % 11 === 0, lit(null))
      .otherwise(rpad(substring(col("c_mktsegment"), 1, 1), 2, " "))
    Tables.customer(s, d)
      .withColumn("state", state)
      // padded comparison: the literal is blank-padded to the char width
      .filter(col("state") === rpad(lit("B"), 2, " ") ||
        col("state") === rpad(lit("A"), 2, " ") || col("state").isNull)
      .groupBy(col("state"))
      .agg(count(lit(1)).as("n"),
        sum(col("c_acctbal").cast(DecimalType(12, 2))).cast("double").as("bal"))
      .orderBy(col("state"))
  }

  /** Cast-on-read over a stringly-typed source: every column of events
    * arrives as a string (Tables.eventsStringly — the ES `default=str`
    * ingest shape) and the query casts back to typed values before
    * filtering and aggregating. Long/double/timestamp round-trip
    * losslessly through strings in both engines, so the oracle is the
    * typed query. */
  val stringlyCast: QueryEntry = QueryEntry(
    "q69_stringly_cast",
    """SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, COUNT(*) AS n,
      |       CAST(SUM(event_id) AS BIGINT) AS id_sum, MAX(value) AS max_val
      |FROM events
      |WHERE value > 50 AND user_id % 10 = 3
      |GROUP BY event_type, day ORDER BY event_type, day""".stripMargin
  ) { (s, d) =>
    // the stringly corpus now lives in a REAL index: bulk-loaded over
    // the ES wire once per dir (all-keyword dynamic mapping — the
    // loader's default=str ingest shape made protocol-true) and read
    // back through the scroll connector; every cast below runs
    // against wire-read strings
    s.conf.set("spark.sql.graft.root", d)
    val idx = "events_stringly_" + d.replaceAll("[^a-zA-Z0-9]", "_").toLowerCase
    if (!graft.sources.GraftElasticServer.hasIndex(idx))
      graft.sources.GraftElasticBulk.bulkIndex(Tables.eventsStringly(s, d), idx)
    s.sql(s"SELECT * FROM elastic.default.$idx")
      .filter(col("value").cast("double") > 50 &&
        col("user_id").cast("bigint") % 10 === 3)
      .withColumn("day", date_trunc("day", col("ts").cast("timestamp")))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n"),
        sum(col("event_id").cast("bigint")).as("id_sum"),
        max(col("value").cast("double")).as("max_val"))
      .orderBy(col("event_type"), col("day"))
  }

  val all: Seq[QueryEntry] = Seq(charGroupBy, stringlyCast)
}
