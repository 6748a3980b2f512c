package graft.streaming

import graft.operators.Temporal
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming surface over the `events` table (SURVEY.md §2.9:
  * absent from the reference — extension surface; builder brief).
  *
  * The batch and streaming paths share the same transforms: a bounded
  * parquet read and an unbounded file-stream read produce the same
  * logical plan, so correctness is checked by equating streaming output
  * with the batch twin (StreamingSpec). At scale the same pipeline runs
  * against a real unbounded source with the watermark bounding state. */
object EventsStreaming {

  /** Raw schema as the file source sees it (TIMESTAMP(NANOS) parquet is
    * read as long nanos under legacy.parquet.nanosAsLong). */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Unbounded read of an events parquet path. */
  def readStream(spark: SparkSession, path: String): DataFrame =
    spark.readStream.schema(rawSchema).parquet(path)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))

  /** Streaming tumbling-hour aggregation — same transform as the batch
    * e01_events_hourly, plus the watermark that bounds state. */
  def hourlyAgg(events: DataFrame): DataFrame =
    Temporal.hourlyAgg(events.withWatermark("ts", "2 hours"))

  case class SessionState(lastMs: Long, sessions: Long, events: Long)
  case class SessionCount(user_id: Long, sessions: Long, events: Long)

  /** Stateful gap sessionization via flatMapGroupsWithState — the
    * streaming twin of e03_sessionize. Emits the running per-user
    * session/event count after each micro-batch's worth of events. */
  def sessionize(events: DataFrame, gapMs: Long = 1800000L): Dataset[SessionCount] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.selectExpr("user_id", "unix_millis(ts) as ms").as[(Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[(Long, Long)], state: GroupState[SessionState]) =>
          val sorted = it.map(_._2).toArray.sorted
          var st = state.getOption.getOrElse(SessionState(Long.MinValue, 0L, 0L))
          sorted.foreach { ms =>
            val isNew = st.lastMs == Long.MinValue || ms - st.lastMs >= gapMs
            st = SessionState(ms, st.sessions + (if (isNew) 1 else 0), st.events + 1)
          }
          state.update(st)
          Iterator.single(SessionCount(uid, st.sessions, st.events))
      }
  }
}
