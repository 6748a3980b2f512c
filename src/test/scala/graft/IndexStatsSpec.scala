package graft

import org.apache.spark.sql.functions._

/** s24 stored-index statistics gates: the relation must be a faithful
  * summary of the stored index — counts partition the corpus, every
  * cell is a stored centroid, shares are a distribution — computed
  * from the index files alone. */
class IndexStatsSpec extends SparkSpec {

  test("s24 stats partition the corpus and align with the stored centroids") {
    val rows = SparkEntry.queries("s24_index_stats")(spark, sf1).collect()
    assert(rows.nonEmpty)
    val nCorpus = spark.read.parquet(s"$sf1/embeddings.parquet").count()
    assert(rows.map(_.getAs[Long]("n_vectors")).sum == nCorpus,
      "cell counts do not partition the corpus")
    assert(math.abs(rows.map(_.getAs[Double]("share")).sum - 1.0) < 1e-9)
    // every reported cell is a stored centroid id
    val idxRoot = spark.conf.get("graft.index.root", "/dev/shm/graftindex")
    val cids = spark.read
      .parquet(s"$idxRoot/s11/${sf1.replaceAll("[^a-zA-Z0-9]", "_")}/centroids")
      .select(col("cid")).collect().map(_.getLong(0)).toSet
    rows.foreach { r =>
      // the partition column reads back as int; centroid cids are long
      assert(cids.contains(r.getAs[Number]("cluster").longValue), r.toString)
      assert(r.getAs[Long]("min_id") <= r.getAs[Long]("max_id"))
    }
    // stats never rescan the corpus: the plan reads only index files
    val plan = SparkEntry.queries("s24_index_stats")(spark, sf1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("embeddings.parquet"), plan)
  }
}
