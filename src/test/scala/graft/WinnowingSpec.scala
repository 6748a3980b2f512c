package graft

import org.apache.spark.sql.functions._

/** d13 winnowing guarantee: with k=3-word grams and window w=4, any two
  * documents sharing a contiguous run of >= k+w-1 = 6 words must share
  * at least one fingerprint (the window fully inside the shared run
  * selects the same minimum in both), while documents with no shared
  * 3-gram share nothing. */
class WinnowingSpec extends SparkSpec {

  private def fps(docs: Seq[(Long, String)]): Map[Long, Set[String]] = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("winnow").toString
    docs.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    SparkEntry.queries("d13_winnowing")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getString(1))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
  }

  test("documents sharing a 6-word run share a fingerprint; disjoint docs don't") {
    val shared = "alpha bravo charlie delta echo foxtrot"
    val m = fps(Seq(
      1L -> s"one two three four five $shared six seven eight nine",
      2L -> s"ten eleven twelve $shared thirteen fourteen fifteen",
      3L -> "sixteen seventeen eighteen nineteen twenty twentyone twentytwo"))
    assert((m(1L) intersect m(2L)).nonEmpty, "shared run produced no common fingerprint")
    assert((m(1L) intersect m(3L)).isEmpty, "disjoint docs share a fingerprint")
    assert((m(2L) intersect m(3L)).isEmpty)
  }

  test("selection density is ~2/(w+1), never empty") {
    val words = (1 to 500).map(i => s"w$i").mkString(" ")
    val m = fps(Seq(1L -> words))
    val n = m(1L).size
    // 498 k-grams, 495 windows; distinct minima for random-ish hashes
    // concentrate near 2/(w+1) of positions = ~200; allow wide slack
    assert(n > 50 && n < 400, s"selected $n fingerprints from 500 words")
  }
}
