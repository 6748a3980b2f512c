package graft

import org.apache.spark.sql.functions._

/** Count-Min heavy-hitter gates (q76). The sketch is deterministic under
  * any partitioning (counter addition commutes), so its guarantees are
  * hard asserts, not probability statements: CMS never undercounts, and
  * every true heavy hitter must surface in the top-20 because its
  * estimate is at least its true count while light words can only be
  * inflated, never deflated below a heavy word's floor. */
class SketchSpec extends SparkSpec {

  private lazy val rows = SparkEntry.queries("q76_cms_topk")(spark, sf1)
    .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))

  test("q76 returns 20 candidates and never undercounts (est >= exact)") {
    assert(rows.length == 20, s"expected 20 rows, got ${rows.length}")
    rows.foreach { case (w, exact, est) =>
      assert(est >= exact, s"CMS undercounted '$w': est=$est < exact=$exact")
    }
  }

  test("q76 top-20 by estimate contains the true top-10 words") {
    val trueTop = Tables.documents(spark, sf1)
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").count()
      .orderBy(col("count").desc, col("w"))
      .limit(10).collect().map(_.getString(0)).toSet
    val got = rows.map(_._1).toSet
    assert(trueTop.subsetOf(got),
      s"missing true heavy hitters: ${trueTop -- got}")
  }

  test("q76 estimates are partitioning-independent (two runs agree)") {
    val again = SparkEntry.queries("q76_cms_topk")(spark, sf1)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSeq == again.toSeq)
  }
}
