package graft

import org.apache.spark.sql.functions._

/** q78 query-profile gates: the emitted per-operator metrics must be
  * the PHYSICS of the profiled query, not decoration — scan rows equal
  * the table, the root operator's row count equals the query's actual
  * result, and the node indexes are the plan's dense preorder. */
class ProfileSpec extends SparkSpec {

  test("q78 profile rows reflect the profiled query's real row flow") {
    val rows = SparkEntry.queries("q78_query_profile")(spark, sf1).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(rows.nonEmpty)
    // dense preorder indexes
    assert(rows.map(_._1).toSeq == rows.indices.toSeq)
    // at least one scan with real output, equal to a base table's size
    val tableSizes = Seq("lineitem", "orders", "customer", "supplier",
      "nation", "region").map(t =>
      spark.read.parquet(s"$sf1/$t.parquet").count()).toSet
    val scans = rows.filter(_._2.toLowerCase.contains("scan"))
      .map(_._3).filter(_ > 0)
    assert(scans.nonEmpty, rows.mkString("\n"))
    assert(scans.exists(tableSizes.contains),
      s"no scan matches a base table size: $scans vs $tableSizes")
    // the TopN's input — the final aggregate — must report at least as
    // many groups as the query returns (the TopN itself carries no
    // numOutputRows metric in this Spark version)
    val result = SparkEntry.queries("q03_join_agg_topn")(spark, sf1).count()
    val aggs = rows.filter(r => r._2.contains("HashAggregate") && r._3 >= 0)
    assert(aggs.nonEmpty && aggs.forall(_._3 >= result),
      s"aggregate outputs ${aggs.mkString(",")} vs $result result rows")
  }

  test("streaming hourly agg drops late data beyond the watermark") {
    import spark.implicits._
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft-late").toString
    def write(rows: Seq[(Long, String, Long, String, Double, String)]): Unit =
      rows.toDF("event_id", "t", "user_id", "event_type", "value", "props")
        .select(col("event_id"), to_timestamp(col("t")).as("ts"),
          col("user_id"), col("event_type"), col("value"), col("props"))
        .coalesce(1).write.mode("append").parquet(dir)
    // batch 1: one event per hour 00..12 → watermark settles at 10:00
    write((0 to 12).map(h =>
      (h.toLong, f"2024-05-01 $h%02d:15:00", 1L, "view", 1.0, "{}")))
    val q = graft.streaming.EventsStreaming.hourlyAgg(
        graft.streaming.EventsStreaming.readStream(spark, dir))
      .writeStream.outputMode("append")
      .format("memory").queryName("late_out").start()
    try {
      q.processAllAvailable()
      // batch 2: a LATE duplicate into hour 03 (far below the 10:00
      // watermark) plus an on-time event at 13:15 to advance time
      write(Seq((100L, "2024-05-01 03:20:00", 2L, "view", 1.0, "{}"),
        (101L, "2024-05-01 13:15:00", 1L, "view", 1.0, "{}")))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("late_out")
      .select(col("h"), col("n")).collect()
      .map(r => r.getTimestamp(0).toString -> r.getLong(1)).toMap
    // hour 03 closed before the late event arrived: it stays n=1 —
    // the late row was dropped, not double-counted and not re-emitted
    assert(got("2024-05-01 03:00:00.0") == 1L, got.toString)
    // sanity: watermark advanced enough to close hour 03 in batch 1
    assert(got.contains("2024-05-01 09:00:00.0"))
  }
}
