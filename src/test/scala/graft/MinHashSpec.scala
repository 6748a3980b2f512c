package graft

import graft.functions.MinHashAggregate.minhash_agg
import org.apache.spark.sql.functions._

/** MinHashAggregate properties: partitioning invariance (partial-agg
  * merge correctness), signature determinism, and the similarity
  * estimate actually tracking Jaccard. */
class MinHashSpec extends SparkSpec {

  private def sigOf(tokens: Seq[String], parts: Int): Seq[Long] = {
    import spark.implicits._
    tokens.toDF("w").repartition(parts)
      .agg(minhash_agg(col("w"), 32).as("sig"))
      .head().getSeq[Long](0)
  }

  test("signature is invariant to partitioning (merge is correct)") {
    val toks = (1 to 500).map(i => s"tok$i")
    assert(sigOf(toks, 1) == sigOf(toks, 7))
    assert(sigOf(toks, 1) == sigOf(toks, 32))
  }

  test("signature is a multiset-insensitive min (duplicates ignored)") {
    val toks = (1 to 100).map(i => s"tok$i")
    assert(sigOf(toks, 3) == sigOf(toks ++ toks, 3))
  }

  test("signature agreement tracks Jaccard similarity") {
    val base = (1 to 200).map(i => s"tok$i")
    val near = (1 to 190).map(i => s"tok$i") ++ (1 to 10).map(i => s"other$i")
    val far = (1 to 200).map(i => s"zzz$i")
    def agree(a: Seq[Long], b: Seq[Long]): Int = a.zip(b).count { case (x, y) => x == y }
    val (sb, sn, sf) = (sigOf(base, 4), sigOf(near, 4), sigOf(far, 4))
    assert(agree(sb, sn) >= 20, s"near-dup agreement too low: ${agree(sb, sn)}/32")
    assert(agree(sb, sf) <= 4, s"disjoint agreement too high: ${agree(sb, sf)}/32")
  }

  test("d03 still yields candidate pairs with high jaccard first") {
    val rows = SparkEntry.queries("d03_minhash_lsh")(spark, sf2).collect()
    assert(rows.nonEmpty)
    val js = rows.map(_.getDouble(2))
    assert(js.head >= js.last, "not sorted by jaccard desc")
    assert(js.head > 0.8, s"top candidate jaccard ${js.head} suspiciously low")
  }
}
