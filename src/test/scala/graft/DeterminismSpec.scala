package graft

import org.apache.spark.sql.DataFrame

/** The reference's strongest correctness property: identical results at
  * different cluster sizes (SURVEY.md §5.2 — q001..q005 match at 1 and 5
  * workers). Ported as: identical results under different shuffle
  * partitioning. */
class DeterminismSpec extends SparkSpec {

  private def collectSorted(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  // every registered operator must satisfy the property; the sketch
  // estimators are deterministic too (fixed algorithms, fixed seeds)
  private val probed = SparkEntry.allEntries.map(_.name)

  probed.foreach { name =>
    test(s"$name is invariant to shuffle partitioning") {
      val build = SparkEntry.queries(name)
      spark.conf.set("spark.sql.shuffle.partitions", "3")
      val a = collectSorted(build(spark, sf1))
      spark.conf.set("spark.sql.shuffle.partitions", "17")
      val b = collectSorted(build(spark, sf1))
      spark.conf.set("spark.sql.shuffle.partitions", "8")
      assert(a == b)
    }
  }
}
