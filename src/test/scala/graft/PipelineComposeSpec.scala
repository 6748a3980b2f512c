package graft

import graft.operators.{Dedup, Pipeline}
import org.apache.spark.sql.functions._

/** p12/p13 composed-pipeline chain-algebra gates. p12's values are
  * driver-oracled (exact SQL spine); these gates cover what the oracle
  * cannot: that the manifest really packs the spine's survivor set,
  * and that p13's probabilistic near-dup stage drops exactly the
  * larger ids of verified ≥0.85 pairs — nothing more, nothing less. */
class PipelineComposeSpec extends SparkSpec {

  private def manifestTotals(name: String): (Long, Long) = {
    val m = SparkEntry.queries(name)(spark, sf1).collect()
    (m.map(_.getLong(2)).sum, m.map(_.getLong(3)).sum)
  }

  test("p12 manifest packs exactly the gate→strip→dedup survivors") {
    val surv = Pipeline.composeSurvivors(spark, sf1)
      .select(col("doc_id"), size(split(col("text"), " ")).as("t"))
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    val (nDocs, toks) = manifestTotals("p12_pipeline_compose")
    assert(nDocs == surv.length,
      s"manifest covers $nDocs docs, spine has ${surv.length}")
    assert(toks == surv.map(_._2.toLong).sum, "manifest token total drifted")
    // the chain actually filters: some documents must have been gated,
    // stripped empty, or deduplicated away relative to the raw corpus
    val raw = spark.read.parquet(s"$sf1/documents.parquet").count()
    assert(nDocs < raw, s"composed pipeline dropped nothing ($nDocs of $raw)")
  }

  test("p13 drops exactly the larger ids of verified pairs and re-packs the rest") {
    val surv = Pipeline.composeSurvivors(spark, sf1).localCheckpoint()
    val pairs = Dedup.minhashVerifiedPairs(surv)
      .filter(col("jaccard") >= 0.85)
      .select(col("a_id"), col("b_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // the drop rule is keep-first: every verified pair is oriented
    pairs.foreach { case (a, b) => assert(a < b, s"pair ($a, $b) misoriented") }
    val drop = pairs.map(_._2).toSet
    val p12ids = surv.select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(drop.subsetOf(p12ids), "p13 dropped a doc that never survived the spine")
    val kept = surv
      .select(col("doc_id"), size(split(col("text"), " ")).as("t"))
      .collect().map(r => (r.getLong(0), r.getInt(1)))
      .filter(p => !drop.contains(p._1))
    val (nDocs, toks) = manifestTotals("p13_pipeline_full")
    assert(nDocs == kept.length,
      s"p13 manifest covers $nDocs docs, expected ${kept.length}")
    assert(toks == kept.map(_._2.toLong).sum, "p13 token total drifted")
  }
}
