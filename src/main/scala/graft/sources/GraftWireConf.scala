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
}
