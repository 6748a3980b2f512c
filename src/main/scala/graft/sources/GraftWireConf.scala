package graft.sources

/** Session-tunable knobs shared by the wire connectors (mongodb /
  * elastic). Read at use time from the active session's SQLConf so a
  * `SET` takes effect without rebuilding catalogs. */
private[graft] object GraftWireConf {

  /** Max literal count a runtime dynamic filter may fold into a wire
    * request (`$in` find clause / `terms` bool.filter clause). Past
    * this the key set is no longer selective enough to pay its wire
    * bytes and the store-side membership work — the same sizing
    * discipline Trino applies to its dynamic filters (and ES itself
    * hard-caps a `terms` lookup at 65,536 values). Runtime filtering
    * is an optimization: an oversized filter is simply not sent and
    * the join stays correct Spark-side. */
  val RuntimeFilterMaxKeysKey = "spark.sql.graft.wire.runtimeFilterMaxKeys"

  def runtimeFilterMaxKeys: Int =
    try org.apache.spark.sql.internal.SQLConf.get
      .getConfString(RuntimeFilterMaxKeysKey, "65536").toInt
    catch { case _: NumberFormatException => 65536 }

  /** Idle window after which a stand-in store reaps an abandoned
    * cursor (Mongo find cursor / ES scroll). A SYSTEM property, not a
    * session conf: the sweep runs on server socket/handler threads
    * that have no active SparkSession, and the window must be one
    * value for every client of the JVM-shared store. 600 s default —
    * well past any legitimate inter-getMore gap (GC pause, skewed
    * task, full-suite contention), matching the statement server's
    * query-state reap; r15 ADVICE flagged the old 120 s as tight
    * enough to kill a slow-but-correct scan. */
  def cursorIdleNanos: Long =
    try java.lang.Long.parseLong(
      System.getProperty("graft.wire.cursorIdleSeconds", "600")) *
      1000L * 1000 * 1000
    catch { case _: NumberFormatException => 600L * 1000 * 1000 * 1000 }

  /** Reaping is a memory bound, not a protocol behavior: skip the
    * sweep entirely while the live-cursor population is small so a
    * handful of slow readers can never be evicted by an eager clock. */
  val CursorReapMinPopulation = 32
}
