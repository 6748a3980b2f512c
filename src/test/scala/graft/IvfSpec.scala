package graft

import graft.operators.{Clustering, Similarity}

/** Scale-structure gate for the s03 IVF index (round-3 verdict item 1):
  * the centroid relation — the broadcast side of the assignment join —
  * must be O(k), independent of corpus size. The previous modulo-sample
  * scheme produced n/125 centroids (O(n) broadcast, O(n²) assignment);
  * these tests pin the fixed-k property at two corpus sizes so any
  * regression back to corpus-proportional centroids fails loudly. */
class IvfSpec extends SparkSpec {

  test("IVF centroid relation has exactly ivfK rows at sf0.01") {
    val cent = Similarity.ivfCentroids(Tables.embeddings(spark, sf2))
    assert(cent.count() === Similarity.ivfK.toLong)
  }

  test("centroid count does not grow with the corpus (sf0.001 == sf0.01 == k)") {
    val small = Similarity.ivfCentroids(Tables.embeddings(spark, sf1)).count()
    val big = Similarity.ivfCentroids(Tables.embeddings(spark, sf2)).count()
    assert(small === big)
    assert(big === Similarity.ivfK.toLong)
  }

  test("centroids are dense trained means, not corpus members") {
    val dim = Tables.embeddings(spark, sf2)
      .selectExpr("size(embedding) AS d").limit(1).collect()(0).getInt(0)
    val rows = Similarity.ivfCentroids(Tables.embeddings(spark, sf2)).collect()
    rows.foreach { r =>
      val ce = r.getSeq[Double](1)
      assert(ce.length === dim, "centroid dimensionality mismatch")
      assert(ce.forall(x => !x.isNaN && !x.isInfinite))
    }
  }

  test("trainCentroids is deterministic across shuffle partitionings") {
    def run(parts: String): Map[Long, Seq[Double]] = {
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      try Clustering.trainCentroids(Tables.embeddings(spark, sf1), 4, iters = 2)
        .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
      finally spark.conf.set("spark.sql.shuffle.partitions", "8")
    }
    assert(run("1") === run("8"))
  }
}
