package graft

/** Hybrid-retrieval gates (s22). The DuckDB oracle proves engine
  * parity end-to-end; these gates pin the FUSION algebra from the
  * entry's own emitted columns: RRF contributions recompute exactly
  * from the channel ranks, the per-query list is a dense top-5, and
  * the fixture genuinely exercises two-channel agreement (a doc
  * surfaced by BOTH channels outranks single-channel docs). */
class HybridSearchSpec extends SparkSpec {

  private lazy val rows = SparkEntry.queries("s22_hybrid_search")(spark, sf2)
    .collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5)))

  test("s22 emits a dense top-5 per query") {
    val byQ = rows.groupBy(_._1)
    assert(byQ.keySet == Set(0L, 1L, 2L))
    byQ.values.foreach { qs =>
      assert(qs.map(_._3).sorted.toSeq == Seq(1L, 2L, 3L, 4L, 5L))
    }
  }

  test("s22 rrf_nano recomputes exactly from the emitted channel ranks") {
    def contrib(rank: Long): Long =
      if (rank == 0L) 0L else math.round(1e9 / (60.0 + rank))
    rows.foreach { case (qid, doc, _, rrf, lex, vec) =>
      assert(rrf == contrib(lex) + contrib(vec),
        s"q$qid doc$doc: rrf=$rrf vs ${contrib(lex)}+${contrib(vec)}")
    }
  }

  test("s22 fused order follows rrf desc with doc_id ties, and fusion fires") {
    rows.groupBy(_._1).values.foreach { qs =>
      val sorted = qs.sortBy(_._3)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._4 > b._4 || (a._4 == b._4 && a._2 < b._2),
            s"fused order violated: $a then $b")
        case _ =>
      }
    }
    assert(rows.exists(r => r._5 > 0 && r._6 > 0),
      "no document surfaced by both channels — fusion untested by fixture")
  }
}
