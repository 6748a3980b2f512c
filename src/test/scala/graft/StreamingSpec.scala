package graft

import graft.streaming.EventsStreaming
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Streaming/batch equivalence: the streaming pipelines must produce the
  * same results as their batch twins on the same bounded input. */
class StreamingSpec extends SparkSpec {

  private lazy val streamDir: String = {
    val dir = Files.createTempDirectory("graft-events")
    Files.copy(Paths.get(s"$sf1/events.parquet"),
      dir.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)
    dir.toString
  }

  test("streaming hourly agg equals batch e01_events_hourly") {
    val q = EventsStreaming.hourlyAgg(EventsStreaming.readStream(spark, streamDir))
      .writeStream.outputMode("complete")
      .format("memory").queryName("hourly_out").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("hourly_out")
      .collect().map(_.toString).sorted.toSeq
    val batch = operators.Temporal.hourlyAgg(Tables.events(spark, sf1))
      .collect().map(_.toString).sorted.toSeq
    assert(streamed == batch)
  }

  test("gap sessionizer agrees with Spark's native session_window") {
    import org.apache.spark.sql.functions._
    val native = Tables.events(spark, sf1)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)))
      .groupBy(col("user_id")).agg(count(lit(1)).as("sessions"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val ours = SparkEntry.queries("e03_sessionize")(spark, sf1)
      .select(col("user_id"), col("sessions"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(native == ours)
  }

  test("streaming sessionize equals batch e03_sessionize") {
    val q = EventsStreaming.sessionize(EventsStreaming.readStream(spark, streamDir))
      .writeStream.outputMode("append")
      .format("memory").queryName("sess_out").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("sess_out")
      .selectExpr("user_id", "sessions", "events")
      .collect().map(_.toString).sorted.toSeq
    val batch = SparkEntry.queries("e03_sessionize")(spark, sf1)
      .collect().map(_.toString).sorted.toSeq
    assert(streamed == batch)
  }
}
