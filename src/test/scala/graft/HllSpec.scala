package graft

import org.apache.spark.sql.functions._

/** q36 HLL sketch lifecycle properties: merging per-group sketches must
  * reproduce the whole-corpus sketch (register-max merge semantics),
  * and estimates must sit within the sketch's theoretical relative
  * error of the exact distinct count. Default lgConfigK = 12 gives
  * RSE = 1.04/sqrt(2^12) ~= 1.63%; the gates use 5x RSE so they only
  * fire on a broken lifecycle, not estimator luck. */
class HllSpec extends SparkSpec {

  private val maxRelErr = 5 * 1.04 / math.sqrt(1 << 12)

  test("union of per-group sketches equals the whole-corpus sketch") {
    val li = Tables.lineitem(spark, sf2)
    def mergedEst(grouping: String, parts: Int): Long =
      li.repartition(parts).groupBy(col(grouping))
        .agg(expr("hll_sketch_agg(l_partkey)").as("sk"))
        .agg(expr("hll_sketch_estimate(hll_union_agg(sk))"))
        .head().getLong(0)
    val wholeEst = li
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(l_partkey))"))
      .head().getLong(0)
    // the union must be deterministic: same estimate no matter how the
    // corpus was split into parts or shuffled
    assert(mergedEst("l_returnflag", 4) == mergedEst("l_returnflag", 17))
    assert(mergedEst("l_returnflag", 4) == mergedEst("l_linestatus", 8))
    // vs the direct whole-corpus sketch the union may differ by the
    // library's internal representation switch (HLL_4 sketch vs HLL_8
    // union target — measured ~1 RSE here); both are separately pinned
    // to the exact count at 5x RSE below, so 2x RSE bounds the gap
    val rel = math.abs(mergedEst("l_returnflag", 4) - wholeEst).toDouble / wholeEst
    assert(rel < 2 * 1.04 / math.sqrt(1 << 12),
      s"merge-of-parts ${mergedEst("l_returnflag", 4)} vs whole $wholeEst")
  }

  test("estimates are within theoretical relative error of exact counts") {
    // the raw lifecycle relation (the oracled q36 entry gates the same
    // bounds as booleans; this reads the underlying estimates)
    val rows = operators.Relational.hllSketchRaw(spark, sf2).collect()
    assert(rows.length == 3)
    for (r <- rows) {
      val est = r.getLong(1).toDouble
      val exact = r.getLong(2).toDouble
      val rel = math.abs(est - exact) / exact
      assert(rel <= maxRelErr,
        s"flag ${r.getString(0)}: est $est vs exact $exact, relErr $rel > $maxRelErr")
    }
    // the merged total must also track the exact global distinct count
    val exactTotal = rows.head.getLong(4).toDouble
    val estTotal = rows.head.getLong(3).toDouble
    assert(math.abs(estTotal - exactTotal) / exactTotal <= maxRelErr,
      s"union estimate $estTotal vs exact total $exactTotal")
    // and the oracled entry's booleans are all true at this scale too
    val gated = SparkEntry.queries("q36_hll_sketch")(spark, sf2).collect()
    assert(gated.forall(g => g.getBoolean(2) && g.getBoolean(3)))
  }
}
