package graft

import org.apache.spark.sql.functions._

/** Fuzzy record-linkage gates (d21). The DuckDB oracle proves engine
  * parity; these gates prove the BLOCKING is sound against the ground
  * truth only a test can afford: the full O(n²) pair space at sf0.001.
  */
class EntityResolutionSpec extends SparkSpec {

  private def names(d: String) =
    Tables.customer(spark, d).select("c_custkey", "c_name")
      .collect().map(r => (r.getLong(0), r.getString(1)))

  private def lev(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1)(i => i)
    for (j <- 1 to b.length) {
      var prev = dp(0); dp(0) = j
      for (i <- 1 to a.length) {
        val cur = dp(i)
        dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = cur
      }
    }
    dp(a.length)
  }

  test("d21 equals the brute-force pair space restricted to its blocks") {
    val cs = names(sf1)
    val expected = (for {
      (ka, na) <- cs; (kb, nb) <- cs
      if ka < kb && na.dropRight(2) == nb.dropRight(2) && lev(na, nb) <= 1
    } yield (ka, kb)).toSet
    val got = SparkEntry.queries("d21_entity_resolution")(spark, sf1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected,
      s"missing=${expected -- got} spurious=${got -- expected}")
    assert(got.nonEmpty, "fixture produced no candidate pairs")
  }

  test("d21's blocking trade is exactly the cross-prefix pairs") {
    // every true distance<=1 pair NOT reported must differ inside the
    // blocked prefix — blocking loses nothing else
    val cs = names(sf1)
    val all1 = (for {
      (ka, na) <- cs; (kb, nb) <- cs
      if ka < kb && lev(na, nb) <= 1
    } yield (ka, kb, na, nb)).toSeq
    val got = SparkEntry.queries("d21_entity_resolution")(spark, sf1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    all1.filterNot(p => got.contains((p._1, p._2))).foreach {
      case (_, _, na, nb) =>
        assert(na.dropRight(2) != nb.dropRight(2),
          s"blocked pair shares its block: $na / $nb")
    }
  }
}
