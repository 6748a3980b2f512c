package graft

import graft.functions.TrinoFunctions._
import org.apache.spark.sql.functions._

/** Trino-compat hash semantics (SURVEY.md §2.8, §7.4.4): seed-0 XXH64
  * against the public reference vectors, and the loader's bucket
  * function properties (complete, in-range, deterministic —
  * loader.py:213-229 semantics). */
class TrinoFunctionsSpec extends SparkSpec {

  private def hashOf(s: String): Long =
    spark.range(1).select(trino_xxhash64(lit(s))).head().getLong(0)

  test("seed-0 xxhash64 matches public XXH64 reference vectors") {
    // Public XXH64 test vectors (xxHash spec, seed 0).
    assert(hashOf("") == 0xEF46DB3751D8E999L)
    assert(hashOf("abc") == 0x44BC2CF5AD770999L)
  }

  test("from_big_endian_64 inverts big-endian encoding") {
    val vals = Seq(0L, 1L, -1L, Long.MaxValue, Long.MinValue, 123456789L)
    vals.foreach { v =>
      val bytes = java.nio.ByteBuffer.allocate(8).putLong(v).array()
      val got = spark.range(1).select(from_big_endian_64(lit(bytes))).head().getLong(0)
      assert(got == v, s"roundtrip of $v")
    }
  }

  test("to_utf8 ∘ from_big_endian_64 ∘ xxhash64 composition collapses") {
    // Trino: from_big_endian_64(xxhash64(to_utf8(x))) — our long-valued
    // trino_xxhash64 must equal the composed form by construction.
    val df = spark.range(100).selectExpr("cast(id as string) as k")
    val a = df.select(trino_xxhash64(col("k")).as("h")).collect().map(_.getLong(0))
    assert(a.distinct.length == 100) // no trivial collisions
  }

  test("bucket assignment is complete, in-range, deterministic") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val keys = List.fill(2000)(rnd.nextLong()) ++
      List(0L, 1L, -1L, Long.MaxValue, Long.MinValue)
    val df = keys.toDF("k").select(trino_bucket(col("k"), 8).as("b"))
    val got = df.collect().map(_.getLong(0))
    assert(got.length == keys.length)
    assert(got.forall(b => b >= 0 && b < 8))
    val again = keys.toDF("k").select(trino_bucket(col("k"), 8).as("b"))
      .collect().map(_.getLong(0))
    assert(got.toSeq == again.toSeq)
  }

  test("bucket histogram is stable across runs and partitioning") {
    def hist(parts: Int): Map[Long, Long] =
      Tables.orders(spark, sf1).repartition(parts)
        .select(trino_bucket(col("o_orderkey"), 8).as("b"))
        .groupBy("b").count()
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hist(2) == hist(13))
  }
}
