package graft

import org.apache.spark.sql.functions._

/** p08's BPE merge training against an independent in-JVM reference:
  * plain-collections BPE (count weighted adjacent pairs → argmax by
  * (count desc, pair lex) → leftmost-nonoverlapping merge) on the
  * classic low/lower/newest/widest corpus, plus hand-derived constants
  * for the first merges so the spec is not two implementations agreeing
  * on the same mistake. The DuckDB oracle separately replays all 10
  * rounds on the real documents table (Verify gate). */
class BpeSpec extends SparkSpec {

  /** Reference BPE on (word → count), returning (pa, pb, count) per merge. */
  private def naive(words: Map[String, Long], steps: Int): Seq[(String, String, Long)] = {
    var ws: Seq[(Vector[String], Long)] =
      words.toSeq.map { case (w, n) => (w.map(_.toString).toVector, n) }
    val out = Seq.newBuilder[(String, String, Long)]
    for (_ <- 1 to steps) {
      val counts = scala.collection.mutable.LinkedHashMap[(String, String), Long]()
      for ((syms, n) <- ws; i <- 0 until syms.length - 1) {
        val k = (syms(i), syms(i + 1))
        counts(k) = counts.getOrElse(k, 0L) + n
      }
      if (counts.nonEmpty) {
        val ((pa, pb), c) = counts.toSeq.sortBy { case ((a, b), n) => (-n, a, b) }.head
        out += ((pa, pb, c))
        ws = ws.map { case (syms, n) =>
          val nb = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == pa && syms(i + 1) == pb) {
              nb += pa + pb; i += 2
            } else { nb += syms(i); i += 1 }
          }
          (nb.result(), n)
        }
      }
    }
    out.result()
  }

  private val corpus = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)

  private def trained(steps: Int): Seq[(Long, String, String, String, Long)] = {
    import spark.implicits._
    val words = corpus.toSeq.toDF("w", "n")
    graft.operators.Pipeline.bpeMerges(words, steps).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
      .toSeq
  }

  test("first two merges match the hand-derived classic-example answer") {
    // pairs at round 1: es=6+3=9, st=9, we=2+6=8, lo=5+2=7, ow=7 … —
    // (e,s) wins the 9-tie lexicographically; round 2 then has (es,t)=9
    val got = trained(2)
    assert(got(0) == ((1L, "e", "s", "es", 9L)), got.toString)
    assert(got(1) == ((2L, "es", "t", "est", 9L)), got.toString)
  }

  test("10-merge sequence matches the independent naive implementation") {
    val expected = naive(corpus, 10).zipWithIndex.map { case ((a, b, c), i) =>
      (i + 1L, a, b, a + b, c)
    }
    assert(trained(10) == expected)
  }

  test("merge application is leftmost-nonoverlapping ('aaa' + (a,a) → aa,a)") {
    import spark.implicits._
    // 'aaaa' has 3 overlapping (a,a) pairs counted, but merging yields
    // exactly two 'aa' symbols; round 2's top pair is then (aa,aa)
    val words = Seq(("aaaa", 4L), ("ab", 1L)).toDF("w", "n")
    val got = graft.operators.Pipeline.bpeMerges(words, 2).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    assert(got(0) == ((1L, "a", "a", "aa", 12L)), got.mkString(","))
    assert(got(1) == ((2L, "aa", "aa", "aaaa", 4L)), got.mkString(","))
  }

  /** Reference encoder: apply the trained merges greedily left-to-right
    * (same loop as [[naive]]'s application step) and count symbols. */
  private def naiveEncode(word: String, rules: Seq[(String, String)]): Int = {
    var syms = word.map(_.toString).toVector
    for ((pa, pb) <- rules) {
      val nb = Vector.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == pa && syms(i + 1) == pb) {
          nb += pa + pb; i += 2
        } else { nb += syms(i); i += 1 }
      }
      syms = nb.result()
    }
    syms.length
  }

  test("p09 token counts match the independent encoder on a synthetic corpus") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bpe9").toString
    val docs = Seq(
      1L -> "low low low low low lower lower",
      2L -> "newest newest newest newest newest newest widest",
      3L -> "widest widest lowest newest")
    docs.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val wordFreq = docs.flatMap(_._2.split(" ")).groupBy(identity)
      .map { case (w, g) => w -> g.size.toLong }
    val rules = naive(wordFreq, 10).map { case (a, b, _) => (a, b) }
    val expected = docs.map { case (id, text) =>
      val words = text.split(" ").filter(_.nonEmpty)
      id -> ((id, words.map(w => naiveEncode(w, rules).toLong).sum, words.length.toLong))
    }.toMap
    val got = SparkEntry.queries("p09_bpe_encode")(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(0), r.getLong(1), r.getLong(2)))).toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (id, e) =>
      assert(got(id) == e, s"doc $id: got ${got(id)}, expected $e")
    }
  }
}
