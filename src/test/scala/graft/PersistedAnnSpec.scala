package graft

import org.apache.spark.sql.execution.{FileSourceScanLike, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** s11 persisted-index gates: the stored index must answer exactly
  * like the freshly-built one (same quantizer, probe rule, rerank),
  * and the probe plan must actually PRUNE — a dynamic partition
  * pruning filter on the cell-partitioned index scan, so unprobed
  * cells' files are skipped at any scale. */
class PersistedAnnSpec extends SparkSpec {

  test("s11 returns exactly s03's results (stored index answers like fresh)") {
    val fresh = SparkEntry.queries("s03_ann_ivf")(spark, sf2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    val stored = SparkEntry.queries("s11_ann_persisted")(spark, sf2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(stored == fresh,
      s"diverging rows: ${stored.zip(fresh).filter(p => p._1 != p._2).take(3)}")
  }

  private def scans(p: SparkPlan): Seq[FileSourceScanLike] = p match {
    case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
    case f: FileSourceScanLike => f +: f.children.flatMap(scans)
    case other => other.children.flatMap(scans) ++
      other.subqueries.flatMap(scans)
  }

  private def assertPruned(name: String, marker: String): Unit = {
    val df = SparkEntry.queries(name)(spark, sf2)
    val indexScans = scans(df.queryExecution.executedPlan).filter(
      _.relation.location.rootPaths.exists(_.toString.contains(marker)))
    assert(indexScans.nonEmpty, s"no scan over the persisted index ($marker) found")
    val pruned = indexScans.filter(_.partitionFilters.exists(
      _.toString.toLowerCase.contains("dynamicpruning")))
    assert(pruned.nonEmpty,
      s"$name index scan carries no dynamicpruning partition filter:\n" +
        indexScans.map(s => s.partitionFilters.mkString(", ")).mkString("\n"))
  }

  test("s11 probe plan dynamically prunes the cell-partitioned index scan") {
    assertPruned("s11_ann_persisted", "s11index")
  }

  test("s12 returns exactly s08's results (stored compressed index answers like fresh)") {
    val fresh = SparkEntry.queries("s08_ann_ivfpq")(spark, sf2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    val stored = SparkEntry.queries("s12_ann_ivfpq_persisted")(spark, sf2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(stored == fresh,
      s"diverging rows: ${stored.zip(fresh).filter(p => p._1 != p._2).take(3)}")
  }

  test("s12 probe plan dynamically prunes the cell-partitioned codes scan") {
    assertPruned("s12_ann_ivfpq_persisted", "s12index")
  }
}
