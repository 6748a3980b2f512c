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

  test("q78 profile invariants hold with whole-stage codegen disabled") {
    // the relation walks executedPlan NODE NAMES; codegen wraps change
    // which wrappers appear (WholeStageCodegen spans vs bare operators),
    // and a Spark upgrade could silently alter that. Pin the contract:
    // the PHYSICS gates must hold under either plan shape, and the
    // codegen-off profile must still expose the scan and aggregate flow.
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val rows = SparkEntry.queries("q78_query_profile")(spark, sf1).collect()
        .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
      assert(rows.nonEmpty)
      assert(rows.map(_._1).toSeq == rows.indices.toSeq)
      assert(!rows.exists(_._2.contains("WholeStageCodegen")),
        "codegen wrappers present despite wholeStage=false")
      val tableSizes = Seq("lineitem", "orders", "customer", "supplier",
        "nation", "region").map(t =>
        spark.read.parquet(s"$sf1/$t.parquet").count()).toSet
      val scans = rows.filter(_._2.toLowerCase.contains("scan"))
        .map(_._3).filter(_ > 0)
      assert(scans.exists(tableSizes.contains),
        s"no scan matches a base table size: $scans vs $tableSizes")
      val result = SparkEntry.queries("q03_join_agg_topn")(spark, sf1).count()
      val aggs = rows.filter(r => r._2.contains("HashAggregate") && r._3 >= 0)
      assert(aggs.nonEmpty && aggs.forall(_._3 >= result),
        s"aggregate outputs ${aggs.mkString(",")} vs $result result rows")
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

}
