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

  /** Raw schema as the file source sees it (TIMESTAMP(MICROS) parquet
    * without UTC adjustment reads as TIMESTAMP_NTZ). */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampNTZType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Unbounded read of an events parquet path — ts normalized to a
    * session TIMESTAMP exactly like the batch Tables.events (session
    * timezone is UTC, so the NTZ cast preserves the instant).
    * `options` pass through to the file source (e.g.
    * `maxFilesPerTrigger` to bound a backlog drain's micro-batches —
    * the production knob for a bursty catch-up). */
  def readStream(spark: SparkSession, path: String,
      options: Map[String, String] = Map.empty): DataFrame =
    spark.readStream.schema(rawSchema).options(options).parquet(path)
      .withColumn("ts", col("ts").cast("timestamp"))

  /** Streaming tumbling-hour aggregation — same transform as the batch
    * e01_events_hourly, plus the watermark that bounds state. */
  def hourlyAgg(events: DataFrame): DataFrame =
    Temporal.hourlyAgg(events.withWatermark("ts", "2 hours"))

  case class FunnelState(t1: Long, t2: Long, t3: Long)
  case class FunnelRow(user_id: Long, t1: Option[Long], t2: Option[Long], t3: Option[Long])

  /** Stateful ordered funnel (view → click → purchase) — the streaming
    * twin of batch e08_funnel, via flatMapGroupsWithState with THREE
    * LONGS of state per user (the whole funnel position; nothing grows
    * with event count). Events are applied in event-time order within
    * each micro-batch; the strict ms>stage comparisons make the result
    * identical to the batch conditional-min formulation for in-order
    * arrival. Emits each user's current (t1, t2, t3) after every
    * micro-batch, users with at least one view. NoTimeout keeps state
    * for the bounded test input; an unbounded deployment would add an
    * event-time timeout to retire completed or expired funnels. */
  def funnel(events: DataFrame): Dataset[FunnelRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    val none = Long.MinValue
    events.selectExpr("user_id", "event_type", "unix_millis(ts) as ms")
      .as[(Long, String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[(Long, String, Long)], state: GroupState[FunnelState]) =>
          var st = state.getOption.getOrElse(FunnelState(none, none, none))
          it.toArray.sortBy(_._3).foreach { case (_, tpe, ms) =>
            tpe match {
              case "view" if st.t1 == none => st = st.copy(t1 = ms)
              case "click" if st.t1 != none && st.t2 == none && ms > st.t1 =>
                st = st.copy(t2 = ms)
              case "purchase" if st.t2 != none && st.t3 == none && ms > st.t2 =>
                st = st.copy(t3 = ms)
              case _ => ()
            }
          }
          state.update(st)
          if (st.t1 == none) Iterator.empty
          else Iterator.single(FunnelRow(uid,
            Some(st.t1).filter(_ != none),
            Some(st.t2).filter(_ != none),
            Some(st.t3).filter(_ != none)))
      }
  }

  case class TransState(lastMs: Long, lastEventId: Long, lastType: String)
  case class TransStep(src: String, dst: String)

  /** Stateful event-type transition counter — the streaming twin of
    * batch e11_transitions. Per-user state is ONE (ms, event_id, type)
    * triple: the stream's trailing edge. Each micro-batch emits the
    * user's new adjacent (src → dst) steps in (event-time, event_id)
    * order — including the step that straddles the batch boundary,
    * which is why the trailing edge is the state — and a downstream
    * streaming aggregation maintains the running transition matrix.
    * In-order arrival makes the counts identical to the batch LEAD
    * formulation (StreamingSpec equates them); an unbounded deployment
    * would add an event-time timeout to retire idle users. */
  def transitions(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val steps = events
      .selectExpr("user_id", "event_type", "unix_millis(ts) as ms", "event_id")
      .as[(Long, String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[(Long, String, Long, Long)],
            state: GroupState[TransState]) =>
          val sorted = it.toArray.sortBy(e => (e._3, e._4))
          var st = state.getOption.getOrElse(
            TransState(Long.MinValue, Long.MinValue, ""))
          val out = Seq.newBuilder[TransStep]
          sorted.foreach { case (_, tpe, ms, eid) =>
            if (st.lastMs != Long.MinValue) out += TransStep(st.lastType, tpe)
            st = TransState(ms, eid, tpe)
          }
          state.update(st)
          out.result().iterator
      }
    steps.groupBy(col("src"), col("dst")).agg(count(lit(1)).as("n"))
  }

  case class LocfState(lastMs: Long, lastEventId: Long, lastV: Double, hasV: Boolean)
  case class LocfRow(event_id: Long, user_id: Long, filled: Option[Double])

  /** Stateful last-observation-carried-forward fill — the streaming
    * twin of batch e10_locf_fill and the shape a streaming feature
    * store runs continuously. Per-user state is the trailing
    * (ms, event_id, last non-null value) edge — O(1) regardless of gap
    * length, exactly like the batch window's running frame. Each
    * micro-batch emits its events (event-time order within the batch)
    * with the carried value; 'view' events carry no amount and inherit
    * the user's previous priced event, or null before any. In-order
    * arrival gives batch-identical output (StreamingSpec equates). */
  def locfFill(events: DataFrame): Dataset[LocfRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .selectExpr("user_id", "event_id", "unix_millis(ts) as ms",
        "CASE WHEN event_type = 'view' THEN CAST(NULL AS DOUBLE) ELSE value END as v")
      .as[(Long, Long, Long, Option[Double])]
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[(Long, Long, Long, Option[Double])],
            state: GroupState[LocfState]) =>
          var st = state.getOption.getOrElse(
            LocfState(Long.MinValue, Long.MinValue, 0.0, hasV = false))
          val out = Seq.newBuilder[LocfRow]
          it.toArray.sortBy(e => (e._3, e._2)).foreach { case (_, eid, ms, v) =>
            v.foreach(x => st = st.copy(lastV = x, hasV = true))
            st = st.copy(lastMs = ms, lastEventId = eid)
            out += LocfRow(eid, uid, if (st.hasV) Some(st.lastV) else None)
          }
          state.update(st)
          out.result().iterator
      }
  }

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

  case class CepState(session: Long, lastMs: Long, rn: Long,
      curType: String, runStart: Long, runLen: Long)
  case class CepMatch(user_id: Long, session: Long, start_rn: Long, n_views: Long)

  /** Stateful CEP pattern matcher — the streaming twin of batch
    * e15_pattern_match (`view+ purchase` within a 30-min session).
    * Per-user state is ONE open run (type, start, length) plus the
    * session/row counters — O(1) regardless of stream length, the
    * Flink-CEP NFA state for this pattern. A match emits the moment
    * the adjacent purchase ARRIVES, so unlike the rate twin there is
    * no unclosable tail: streaming output equals the batch relation
    * exactly (StreamingSpec, including a run split across
    * micro-batches). In-order arrival per the other twins; an
    * unbounded deployment would add an event-time timeout to retire
    * idle users' state. */
  def patternMatch(events: DataFrame, gapMs: Long = 1800000L): Dataset[CepMatch] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.selectExpr("user_id", "event_id", "event_type", "unix_millis(ts) as ms")
      .as[(Long, Long, String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[(Long, Long, String, Long)],
         state: GroupState[CepState]) =>
          val sorted = it.toArray.sortBy(e => (e._4, e._2))
          var st = state.getOption.getOrElse(
            CepState(0L, Long.MinValue, 0L, "", 0L, 0L))
          val out = Seq.newBuilder[CepMatch]
          sorted.foreach { case (_, _, tpe, ms) =>
            if (st.lastMs == Long.MinValue || ms - st.lastMs >= gapMs) {
              // session boundary: no adjacency across it, open a fresh run
              st = CepState(st.session + 1, ms, 1L, tpe, 1L, 1L)
            } else {
              val rn = st.rn + 1
              if (tpe == st.curType)
                st = st.copy(lastMs = ms, rn = rn, runLen = st.runLen + 1)
              else {
                if (st.curType == "view" && tpe == "purchase")
                  out += CepMatch(uid, st.session, st.runStart, st.runLen)
                st = st.copy(lastMs = ms, rn = rn, curType = tpe,
                  runStart = rn, runLen = 1L)
              }
            }
          }
          state.update(st)
          out.result().iterator
      }
  }

  case class RateState(curHourMs: Long, curN: Long, hist: Seq[(Long, Long)])
  case class RateRow(h: java.sql.Timestamp, event_type: String, n: Long,
      base_mean: Double, z: Option[Double])

  /** Stateful rate-anomaly scorer — the streaming twin of batch
    * e13_rate_anomaly. Per-type state is the OPEN hour's running count
    * plus a ring of the last 6 CLOSED (hour, count) pairs — O(1)
    * regardless of stream length. An hour closes when a later-hour
    * event for that type arrives; at close it is scored against the
    * ring (exactly the batch frame: the 6 trailing OBSERVED hours,
    * never itself) with the identical double-expression shapes, so
    * scored rows match the batch z bit-for-bit. The still-open final
    * hour is unscored by construction — a stream never knows an hour
    * is over until the next one starts (StreamingSpec equates against
    * batch minus each type's last observed hour). In-order arrival
    * assumption as the other twins; an unbounded deployment would add
    * an event-time timeout to close hours on silence. */
  def rateAnomaly(events: DataFrame): Dataset[RateRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    val hourMs = 3600000L
    events.selectExpr("event_type", "unix_millis(ts) as ms")
      .as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (tpe: String, it: Iterator[(String, Long)], state: GroupState[RateState]) =>
          val sorted = it.map(_._2).toArray.sorted
          var st = state.getOption.getOrElse(RateState(Long.MinValue, 0L, Nil))
          val out = Seq.newBuilder[RateRow]
          sorted.foreach { ms =>
            val h = ms - ms % hourMs
            if (st.curHourMs == Long.MinValue) st = RateState(h, 1L, st.hist)
            else if (h == st.curHourMs) st = st.copy(curN = st.curN + 1)
            else {
              // close the open hour: score against the ring (batch
              // frame), then push it in and evict past 6
              if (st.hist.size == 6) {
                val s = st.hist.map(_._2).sum
                val ss = st.hist.map(c => c._2 * c._2).sum
                val m = 6L
                val varr = (ss.toDouble - s.toDouble * s.toDouble / m) / m
                val z = if (varr > 0)
                  Some((st.curN - s.toDouble / m) / math.sqrt(varr)) else None
                out += RateRow(new java.sql.Timestamp(st.curHourMs), tpe,
                  st.curN, s.toDouble / m, z)
              }
              st = RateState(h, 1L,
                (st.hist :+ ((st.curHourMs, st.curN))).takeRight(6))
            }
          }
          state.update(st)
          out.result().iterator
      }
  }

  /** e17's sliding distinct as a native streaming aggregation: 6h/1h
    * sliding windows whose state is ONE approximate-distinct sketch
    * per open window (HLL++ partials in the state store — O(windows)
    * state however many events arrive), the streaming dual of the
    * batch entry's sketch-per-hour + union plan. A window ending at
    * hour boundary h+1 covers events in [h−5h, h+1h) — exactly the
    * batch entry's trailing window anchored at h — so on a bounded
    * input the two agree wherever both are in their sketches' exact
    * regimes (SlidingHllSpec's anchor-hour equivalence gate). */
  def slidingDistinct(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "6 hours", "1 hour"))
      .agg(approx_count_distinct(col("user_id")).as("users_6h"))
      .select(col("window.end").as("wend"), col("users_6h"))
}
