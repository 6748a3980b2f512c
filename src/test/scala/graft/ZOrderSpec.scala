package graft

import org.apache.spark.sql.functions._

/** p21 Z-order layout gates: the bit-dilation against an independent
  * Scala reference, and the locality property that justifies the
  * layout — fixing a z-bucket bounds BOTH dimensions' ranges, which is
  * exactly the file-level min/max pruning a rewritten table gets. */
class ZOrderSpec extends SparkSpec {

  /** Independent Morton reference: interleave bit-by-bit. */
  private def mortonRef(x: Long, y: Long): Long =
    (0 until 32).foldLeft(0L) { (z, i) =>
      z | ((x >> i) & 1L) << (2 * i) | ((y >> i) & 1L) << (2 * i + 1)
    }

  test("magic-mask dilation matches bit-by-bit interleave") {
    // the entry's spread is private; recompute through the same SQL ops
    val samples = Seq((0L, 0L), (1L, 0L), (0L, 1L), (14999L, 1999L),
      (149999L, 19999L), (0x7FFFL, 0x7FFFL), (0xFFFFFFFFL, 0L),
      (123456789L, 987654321L), (0xAAAAAAAAL, 0x55555555L))
    import spark.implicits._
    val got = samples.toDF("x", "y").selectExpr(
      """((s4x | (s4x << 1)) & 6148914691236517205) |
         (((s4y | (s4y << 1)) & 6148914691236517205) << 1) as z"""
        .replace("s4x", dilate("x")).replace("s4y", dilate("y")))
      .as[Long].collect()
    samples.zip(got).foreach { case ((x, y), z) =>
      assert(z == mortonRef(x, y), s"interleave($x, $y)")
    }
  }

  /** The entry's 4-step prefix of the dilation, as SQL text. */
  private def dilate(c: String): String = {
    val s1 = s"(($c | ($c << 16)) & 281470681808895)"
    val s2 = s"(($s1 | ($s1 << 8)) & 71777214294589695)"
    val s3 = s"(($s2 | ($s2 << 4)) & 1085102592571150095)"
    s"(($s3 | ($s3 << 2)) & 3689348814741910323)"
  }

  test("every z-bucket's envelope is narrow on BOTH dimensions") {
    // bucket = z >> 22 fixes all z-bits >= 22; the surviving free bits
    // are x-bits 0..10 and y-bits 0..10, so within any bucket
    // max-min < 2048 on both columns — the data-skipping guarantee.
    val rows = SparkEntry.queries("p21_zorder_layout")(spark, sf2).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (minOk, maxOk) = (r.getAs[Long]("min_ok"), r.getAs[Long]("max_ok"))
      val (minPk, maxPk) = (r.getAs[Long]("min_pk"), r.getAs[Long]("max_pk"))
      assert(maxOk - minOk < 2048, s"orderkey envelope ${maxOk - minOk}")
      assert(maxPk - minPk < 2048, s"partkey envelope ${maxPk - minPk}")
    }
    // and the buckets partition the table: counts sum to the row count
    val total = rows.map(_.getAs[Long]("n")).sum
    val expected = spark.read.parquet(s"$sf2/lineitem.parquet").count()
    assert(total == expected, "z-buckets lost or duplicated rows")
  }
}
