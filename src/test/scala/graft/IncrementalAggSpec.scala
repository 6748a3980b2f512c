package graft

import org.apache.spark.sql.functions._

/** Incremental-aggregate gates (e16). The DuckDB oracle proves
  * merged ≡ full recompute; these gates pin the INCREMENTAL claims:
  * the merge plan reads the raw events table exactly once (the
  * arriving slice — history enters only as the O(cells) state file),
  * and the refresh is idempotent. */
class IncrementalAggSpec extends SparkSpec {

  test("e16 merge plan scans raw events once and the state file once") {
    val df = SparkEntry.queries("e16_incremental_agg")(spark, sf1)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val scans = "Scan parquet".r.findAllIn(plan).length
    assert(scans == 2, s"expected events + state = 2 scans, got $scans\n$plan")
    assert(plan.contains("e16agg"), "state file scan missing from merge plan")
    // the raw-events side carries the arriving-slice residual filter
    assert(plan.contains("% 10) >= 8") || plan.contains("% 10) > 7"),
      s"arriving-slice filter missing:\n$plan")
  }

  test("e16 merged result equals the one-shot hourly aggregate and is idempotent") {
    val once = SparkEntry.queries("e16_incremental_agg")(spark, sf1)
      .collect().map(_.toString).toSeq
    val full = SparkEntry.queries("e01_events_hourly")(spark, sf1)
      .select(col("h"), col("event_type"), col("n"), col("v"))
      .collect().map(_.toString).toSeq
    assert(once == full, "merged state+delta diverges from full recompute")
    val again = SparkEntry.queries("e16_incremental_agg")(spark, sf1)
      .collect().map(_.toString).toSeq
    assert(again == once, "refresh is not idempotent")
  }
}
