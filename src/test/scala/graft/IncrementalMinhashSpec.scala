package graft

import org.apache.spark.sql.execution.{FileSourceScanLike, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions.col

import graft.operators.Dedup

/** d23 gates: the persisted band index must be TRANSPARENT (probe
  * results equal the index-free all-pairs computation restricted to
  * history×batch) and must actually PRUNE (dynamic partition pruning
  * on the bucket-partitioned band scan) — the two properties that make
  * "dedup an arriving batch against a 100 TB corpus without rescanning
  * it" true rather than aspirational. */
class IncrementalMinhashSpec extends SparkSpec {

  private def scans(p: SparkPlan): Seq[FileSourceScanLike] = p match {
    case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
    case f: FileSourceScanLike => f +: f.children.flatMap(scans)
    case other => other.children.flatMap(scans) ++
      other.subqueries.flatMap(scans)
  }

  test("d23 equals the index-free all-pairs result on the cross slice") {
    val rows = SparkEntry.queries("d23_incremental_minhash")(spark, sf2)
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)),
        r.getBoolean(3)))
    // novel ⇔ no match; matched rows carry jaccard ≥ 0.35
    rows.foreach { case (id, m, j, novel) =>
      assert(novel == m.isEmpty && m.isEmpty == j.isEmpty, s"row $id")
      j.foreach(v => assert(v >= 0.35, s"row $id jaccard $v"))
    }
    assert(rows.nonEmpty && rows.exists(!_._4),
      "corpus has near-dup structure; expected at least one match")
    // index-free mirror: d03's full verified-pairs machinery over the
    // whole corpus, restricted to (history, batch) pairs, same best-
    // match rule — if the stored probe dropped a band bucket, screened
    // differently, or verified against stale shingles, a row diverges
    val docs = Tables.documents(spark, sf2)
    val full = Dedup.minhashVerifiedPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val cross = full.flatMap { case (a, b, j) =>
      (a % 10 < 8, b % 10 < 8) match {
        case (true, false) => Some((a, b, j))
        case (false, true) => Some((b, a, j))
        case _ => None
      }
    }
    val best = cross.filter(_._3 >= 0.35)
      .groupBy(_._2).map { case (bt, ps) =>
        val w = ps.minBy(p => (-p._3, p._1))
        bt -> (w._1, w._3)
      }
    val got = rows.collect { case (id, Some(m), Some(j), _) => id -> (m, j) }
      .toMap
    assert(got == best,
      s"stored-index probe diverges from index-free mirror: " +
        s"extra=${got.keySet -- best.keySet} missing=${best.keySet -- got.keySet}")
  }

  test("d23 probe plan dynamically prunes the bucket-partitioned band scan") {
    val df = SparkEntry.queries("d23_incremental_minhash")(spark, sf2)
    val indexScans = scans(df.queryExecution.executedPlan).filter(
      _.relation.location.rootPaths.exists(_.toString.contains("graftindex/d23/")))
    val bandScans = indexScans.filter(
      _.relation.location.rootPaths.exists(_.toString.contains("/bands")))
    assert(bandScans.nonEmpty, "no scan over the persisted band index found")
    val pruned = bandScans.filter(_.partitionFilters.exists(
      _.toString.toLowerCase.contains("dynamicpruning")))
    assert(pruned.nonEmpty,
      "band-index scan carries no dynamicpruning partition filter:\n" +
        bandScans.map(s => s.partitionFilters.mkString(", ")).mkString("\n"))
  }
}
