package graft

/** ANN quality gates: the approximate searchers must actually find the
  * true neighbors. Recall@5 is measured against the s01 brute-force
  * ground truth on the same corpus — the check a rows-only entry cannot
  * express in SQL. Measured at round 3: s02 ≈ 0.68, s03 ≈ 0.60 at
  * sf0.01; thresholds leave margin but would still catch a collapse
  * like the round-2 single-table LSH (recall ≈ 0). */
class RecallSpec extends SparkSpec {

  private def topSets(name: String, d: String): Map[Long, Set[Long]] =
    SparkEntry.queries(name)(spark, d).collect()
      .groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }

  private def recallAt5(name: String, d: String): Double = {
    val exact = topSets("s01_ann_bruteforce", d)
    val approx = topSets(name, d)
    val per = exact.map { case (q, ex) =>
      approx.get(q).map(ap => (ap & ex).size.toDouble / ex.size).getOrElse(0.0)
    }
    per.sum / per.size
  }

  test("multi-table LSH (s02) recall@5 beats 0.5 at sf0.01") {
    val r = recallAt5("s02_ann_lsh", sf2)
    assert(r >= 0.5, s"s02 recall@5 = $r")
  }

  test("IVF 2-probe (s03) recall@5 beats 0.45 at sf0.01") {
    val r = recallAt5("s03_ann_ivf", sf2)
    assert(r >= 0.45, s"s03 recall@5 = $r")
  }

  test("PQ ADC + rerank (s07) recall@5 beats 0.6 at sf0.01") {
    // candidates = 50 of ~5000 corpus vectors (1%) at sf0.01; the
    // floor catches an ADC scoring collapse (see info line for the
    // measured value).
    val r = recallAt5("s07_ann_pq", sf2)
    info(f"s07 recall@5 = $r%.3f")
    assert(r >= 0.6, s"s07 recall@5 = $r")
  }

  test("IVF-PQ (s08) recall@5 beats 0.45 at sf0.01") {
    // bounded above by s03's 2-probe cell recall; the top-50 exact
    // rerank absorbs residual-ADC ranking error, so the floors match.
    val r = recallAt5("s08_ann_ivfpq", sf2)
    info(f"s08 recall@5 = $r%.3f")
    assert(r >= 0.45, s"s08 recall@5 = $r")
  }

  test("int8 scalar quantization (s09) recall@5 beats 0.9 at sf0.01") {
    // int8 preserves vector direction to ≤ 0.4% per dim, and the
    // top-20 exact rerank absorbs what little ADC ordering error is
    // left — a drop below 0.9 means the encode or the code-scoring
    // path broke, not that the index got unlucky.
    val r = recallAt5("s09_ann_sq", sf2)
    info(f"s09 recall@5 = $r%.3f")
    assert(r >= 0.9, s"s09 recall@5 = $r")
  }

  test("s21 monitor reproduces this spec's own recall measurement of s03") {
    // independent computation paths: the monitor joins DataFrames
    // inside one plan; the spec collects both entries and intersects
    // sets driver-side — agreement pins the monitor's arithmetic
    val rows = SparkEntry.queries("s21_recall_eval")(spark, sf2).collect()
    assert(rows.length == 10, s"expected 10 query rows, got ${rows.length}")
    val mean = rows.map(_.getDouble(2)).sum / rows.length
    val viaSpec = recallAt5("s03_ann_ivf", sf2)
    assert(math.abs(mean - viaSpec) < 1e-12,
      s"monitor mean=$mean vs spec-computed $viaSpec")
    rows.foreach { r =>
      val rec = r.getDouble(2)
      assert(rec >= 0.0 && rec <= 1.0 && rec == r.getLong(1) / 5.0)
    }
  }

  test("s21 at probe-all is exact: recall 1.0 on every query") {
    val rows = operators.Similarity
      .ivfRecall(spark, sf1, operators.Similarity.ivfK).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getDouble(2) == 1.0,
      s"qid ${r.getLong(0)} recall ${r.getDouble(2)} != 1.0 at probe-all"))
  }

  test("approximate results are real corpus members with sane ranks") {
    Seq("s02_ann_lsh", "s03_ann_ivf", "s07_ann_pq", "s08_ann_ivfpq",
        "s09_ann_sq").foreach { name =>
      val rows = SparkEntry.queries(name)(spark, sf2).collect()
      assert(rows.nonEmpty, name)
      rows.foreach { r =>
        assert(r.getLong(1) >= 10, s"$name returned a query vector as neighbor")
        assert(r.getInt(2) >= 1 && r.getInt(2) <= 5, s"$name rank out of range")
      }
    }
  }
}
