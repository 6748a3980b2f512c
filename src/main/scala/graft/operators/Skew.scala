package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for the 100 TB posture: AQE's skew-join
  * handling (on by default in GraftSession) covers sort-merge joins;
  * explicit salting covers the cases AQE can't re-plan (e.g. a skewed
  * broadcast-ineligible build side or grouped aggregation on a hot key).
  */
object Skew {

  /** Salted equi-join on `key`: the big (skewed) side is split into
    * `buckets` salt partitions by a deterministic hash of `saltBy`;
    * the small side is replicated once per salt value. Result equals
    * `big.join(small, key)` exactly, but the hot key's rows spread
    * across `buckets` tasks instead of one straggler. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      saltBy: Column, buckets: Int): DataFrame = {
    val salted = big.withColumn("__salt", pmod(xxhash64(saltBy), lit(buckets)))
    val replicated = small.withColumn("__salt",
      explode(array((0 until buckets).map(i => lit(i.toLong)): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-stage (salted partial → final) aggregation for hot grouping
    * keys: count/sum-style aggregates pre-combine per (key, salt) and
    * then merge, bounding any single task's input. */
  def saltedCountSum(df: DataFrame, key: String, valueCol: String,
      saltBy: Column, buckets: Int): DataFrame =
    df.withColumn("__salt", pmod(xxhash64(saltBy), lit(buckets)))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__n"), sum(col(valueCol)).as("__s"))
      .groupBy(col(key))
      .agg(sum(col("__n")).as("n"), sum(col("__s")).as("total"))
}
