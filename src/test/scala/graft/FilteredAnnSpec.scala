package graft

import graft.functions.VectorFunctions.cosine_similarity
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** s10 filtered-ANN gates: the predicate must be sound (every result
  * satisfies it), complete enough (no starvation — full top-5 per
  * query), and the index path must actually find the true
  * predicate-restricted neighbors (recall vs a brute-force scan
  * restricted to the same eligible set). */
class FilteredAnnSpec extends SparkSpec {

  /** Predicate-restricted brute-force ground truth, built from the
    * raw tables with the spec's own predicate copy — an independent
    * derivation, not a call into the operator's helper. */
  private def bruteTop5(d: String): Map[Long, Set[Long]] = {
    val docs = spark.read.parquet(s"$d/documents.parquet")
      .filter(col("lang") === "en" && col("n_chars") >= 200)
      .select(col("doc_id").as("vec_id"))
    val e = spark.read.parquet(s"$d/embeddings.parquet")
    val corpus = e.filter(col("vec_id") >= 10).join(docs, Seq("vec_id"), "left_semi")
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    corpus.crossJoin(broadcast(q))
      .withColumn("cos", cosine_similarity(col("qe"), col("embedding")))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))))
      .filter(col("rank") <= 5)
      .select(col("qid"), col("vec_id"))
      .collect().groupBy(_.getLong(0))
      .map { case (k, rs) => k -> rs.map(_.getLong(1)).toSet }
  }

  private def s10(d: String) =
    SparkEntry.queries("s10_ann_filtered")(spark, d).collect()

  test("every result satisfies the metadata predicate") {
    val eligible = spark.read.parquet(s"$sf2/documents.parquet")
      .filter(col("lang") === "en" && col("n_chars") >= 200)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val bad = s10(sf2).map(_.getLong(1)).filterNot(eligible.contains)
    assert(bad.isEmpty, s"results violating the predicate: ${bad.take(5).toSeq}")
  }

  test("no starvation: every query returns a full top-5") {
    val byQ = s10(sf2).groupBy(_.getLong(0))
    assert(byQ.size == 10, s"${10 - byQ.size} queries returned nothing")
    byQ.foreach { case (q, rs) =>
      assert(rs.length == 5, s"query $q returned ${rs.length}/5 results")
    }
  }

  test("s13 filter-at-probe: sound, un-starved, and measured against s10") {
    val eligible = spark.read.parquet(s"$sf2/documents.parquet")
      .filter(col("lang") === "en" && col("n_chars") >= 200)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val rows = SparkEntry.queries("s13_ann_filtered_probe")(spark, sf2).collect()
    val bad = rows.map(_.getLong(1)).filterNot(eligible.contains)
    assert(bad.isEmpty, s"results violating the predicate: ${bad.take(5).toSeq}")
    // at ~30% predicate density each probed cell holds plenty of
    // eligible members — filter-BEFORE-rank must deliver a full top-5
    // (post-RANK filtering would starve here, the shape s13 exists to
    // avoid); at adversarially sparse predicates s10 is the answer
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.size == 10 && byQ.values.forall(_.length == 5),
      s"starved queries: ${byQ.filter(_._2.length < 5).keys.toSeq.sorted}")
    val exact = bruteTop5(sf2)
    def recallOf(name: String): Double = {
      val ap = SparkEntry.queries(name)(spark, sf2).collect()
        .groupBy(_.getLong(0)).map { case (k, rs) => k -> rs.map(_.getLong(1)).toSet }
      exact.map { case (q, ex) =>
        ap.get(q).map(a => (a & ex).size.toDouble / ex.size).getOrElse(0.0) }.sum / exact.size
    }
    val (r13, r10) = (recallOf("s13_ann_filtered_probe"), recallOf("s10_ann_filtered"))
    info(f"s13 recall@5 = $r13%.3f vs s10 (pre-filtered index) = $r10%.3f")
    // s13 probes cells laid out for the FULL corpus, s10 for the
    // eligible corpus — s13's structural loss is eligible vectors in
    // unprobed cells, so it may trail s10; the floor catches collapse
    assert(r13 >= 0.35, s"s13 recall@5 = $r13")
  }

  test("recall@5 vs predicate-restricted brute force beats 0.45 at sf0.01") {
    // pre-filtering means the floor is s03's 2-probe cell recall on
    // the ELIGIBLE corpus, not diluted by selectivity — the property
    // a post-filtered top-k cannot deliver (see info line)
    val exact = bruteTop5(sf2)
    val approx = s10(sf2).groupBy(_.getLong(0))
      .map { case (k, rs) => k -> rs.map(_.getLong(1)).toSet }
    val per = exact.map { case (q, ex) =>
      approx.get(q).map(ap => (ap & ex).size.toDouble / ex.size).getOrElse(0.0) }
    val r = per.sum / per.size
    info(f"s10 recall@5 = $r%.3f")
    assert(r >= 0.45, s"s10 recall@5 = $r")
  }
}
