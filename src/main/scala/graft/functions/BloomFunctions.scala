package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** Column wrappers over Spark's internal Bloom-filter expressions — the
  * same [[BloomFilterAggregate]]/[[BloomFilterMightContain]] pair the
  * optimizer injects for runtime join pruning (and the engine-level
  * analogue of the reference's dynamic filtering, reference:
  * results/q003/workers-1/explain.txt:53-54), exposed here for EXPLICIT
  * use: build a compact membership sketch over a key set once, broadcast
  * it, and prune a much larger relation map-side before any join.
  * Neither function is SQL-registered by Spark (4.1), hence the bridge.
  */
object BloomFunctions {

  /** Aggregate a `bigint` column (pre-hash with xxhash64) into a serialized
    * Bloom filter sized for `items` expected distinct values and `bits`
    * filter bits. */
  def bloom_agg(c: Column, items: Long, bits: Long): Column =
    GraftBridge.column(new BloomFilterAggregate(
      GraftBridge.expression(c), Literal(items), Literal(bits))
      .toAggregateExpression())

  /** Membership probe: true if `v` (same hashing as the build side) MIGHT
    * be in the filter `bf`; false is a guarantee of absence. */
  def might_contain(bf: Column, v: Column): Column =
    GraftBridge.column(BloomFilterMightContain(
      GraftBridge.expression(bf), GraftBridge.expression(v)))
}
