package graft

import graft.functions.SimHashAggregate.simhash_agg
import graft.functions.TrinoFunctions.trino_xxhash64
import org.apache.spark.sql.functions._

/** SimHashAggregate properties: partitioning invariance (partial-agg
  * merge correctness), a hand-computed bit-vote fingerprint (hash layer
  * pinned independently by TrinoFunctionsSpec's public XXH64 vectors),
  * and a d05 recall gate — 4x16-bit chunk banding must find EVERY pair
  * within Hamming distance 3 (pigeonhole: 3 flipped bits touch at most
  * 3 chunks, so one chunk stays identical). */
class SimHashSpec extends SparkSpec {

  private def fpOf(tokens: Seq[String], parts: Int): Long = {
    import spark.implicits._
    tokens.toDF("w").repartition(parts)
      .agg(simhash_agg(col("w")).as("fp"))
      .head().getLong(0)
  }

  /** Seed-0 XXH64 per token via the registered function (verified
    * against public vectors elsewhere) — the independent hash source
    * for the hand-computed majority vote below. */
  private def hashes(tokens: Seq[String]): Seq[Long] = {
    import spark.implicits._
    tokens.toDF("w").select(trino_xxhash64(col("w"))).collect().map(_.getLong(0)).toSeq
  }

  private def referenceSimhash(tokens: Seq[String]): Long = {
    val hs = hashes(tokens)
    var fp = 0L
    var b = 0
    while (b < 64) {
      val vote = hs.map(h => ((h >>> b) & 1L) * 2 - 1).sum
      if (vote > 0) fp |= (1L << b)
      b += 1
    }
    fp
  }

  test("fingerprint is invariant to partitioning (merge is correct)") {
    val toks = (1 to 500).map(i => s"tok$i")
    assert(fpOf(toks, 1) == fpOf(toks, 7))
    assert(fpOf(toks, 1) == fpOf(toks, 32))
  }

  test("single-token fingerprint equals the token's seed-0 XXH64") {
    // with one vote per bit the majority IS the hash bit, so the
    // aggregate must reproduce the hash exactly
    for (t <- Seq("alpha", "beta", "")) {
      assert(fpOf(Seq(t), 1) == hashes(Seq(t)).head, s"token '$t'")
    }
  }

  test("fingerprint matches hand-computed bit-vote majority (ties clear the bit)") {
    // duplicates exercise tf-weighting: every occurrence votes; the
    // even-sized disjoint half guarantees genuine tie bits exist
    val toks = (1 to 9).map(i => s"dup$i") ++ (1 to 9).map(i => s"dup$i") ++
      (1 to 4).map(i => s"only$i")
    assert(fpOf(toks, 3) == referenceSimhash(toks))
    val two = Seq("alpha", "beta")
    assert(fpOf(two, 1) == referenceSimhash(two))
  }

  test("near-identical token multisets give close fingerprints, disjoint give far") {
    val base = (1 to 200).map(i => s"tok$i")
    val near = (1 to 195).map(i => s"tok$i") ++ (1 to 5).map(i => s"other$i")
    val far = (1 to 200).map(i => s"zzz$i")
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    val (fb, fn, ff) = (fpOf(base, 4), fpOf(near, 4), fpOf(far, 4))
    assert(ham(fb, fn) <= 16, s"near-dup hamming too high: ${ham(fb, fn)}")
    assert(ham(fb, ff) >= 20, s"disjoint hamming too low: ${ham(fb, ff)}")
  }

  test("d05 banding finds every pair within Hamming distance 3 (exact recall)") {
    val fps = graft.operators.Dedup.simhashDf(spark, sf2)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // exact all-pairs Hamming over the collected fingerprints (500 docs
    // at sf0.01 — 125k pairs, test-side only)
    val exact = for {
      (ida, fa) <- fps; (idb, fb) <- fps if ida < idb
      h = java.lang.Long.bitCount(fa ^ fb) if h <= 3
    } yield (ida, idb, h)
    val got = SparkEntry.queries("d05_simhash_pairs")(spark, sf2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val gotPairs = got.map(t => (t._1, t._2)).toSet
    // d05 returns candidates ordered by hamming asc, limit 50: a <=3
    // pair may only be absent if the cut already happened below 3
    val cutH = if (got.length < 50) Int.MaxValue else got.map(_._3).max
    for ((a, b, h) <- exact if h < cutH) {
      assert(gotPairs.contains((a, b)),
        s"banding missed pair ($a,$b) at hamming $h (cut at $cutH)")
    }
    // and the reported hamming values must agree with the exact ones
    val fpMap = fps.toMap
    for ((a, b, h) <- got) {
      assert(java.lang.Long.bitCount(fpMap(a) ^ fpMap(b)) == h,
        s"pair ($a,$b) reported hamming $h != exact")
    }
  }
}
