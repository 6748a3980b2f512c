package graft.operators

import graft.{QueryEntry, Tables}
import graft.functions.TrinoFunctions
import org.apache.spark.sql.functions._

/** Loader-pipeline parity (reference: data-loader/loader.py).
  *
  * The reference exports `web_sales` to Elasticsearch in 8 deterministic
  * hash buckets, one Kubernetes Indexed-Job pod per bucket
  * (loader.py:202-248, job-loader-es.yaml:6-21). In Spark the whole
  * orchestration collapses into one partitioned job: bucket id =
  * `pmod(xxh64_seed0(cast(key as string)) & Long.MaxValue, 8)` — the
  * exact Trino expression (loader.py:213-218) via the seed-0 hash in
  * [[TrinoFunctions]]. */
object Loader {

  /** Bucket histogram over orders keys — proves bucketing is complete
    * and deterministic (property-tested in BucketingSpec); rows-only
    * check, DuckDB has no XXH64. */
  val bucketCounts: QueryEntry = QueryEntry.noOracle("l01_bucket_counts") { (s, d) =>
    Tables.orders(s, d)
      .select(TrinoFunctions.trino_bucket(col("o_orderkey"), 8).as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
      .orderBy(col("bucket"))
  }

  val all: Seq[QueryEntry] = Seq(bucketCounts)
}
