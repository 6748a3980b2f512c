package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** d16/d17 paragraph-granularity dedup gates. d16 is driver-oracled
  * (exact SQL over an exploded chunk CTE); these gates cover the parts
  * no SQL oracle reaches: the chunker's reassembly identity, d17's
  * verification exactness, and its recall against brute force. */
class ParagraphDedupSpec extends SparkSpec {

  private def paras(dir: String) =
    Dedup.paragraphs(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getInt(1)), r.getString(2)))

  test("chunker partitions every document exactly (reassembly identity)") {
    // paragraphs joined back in index order must reproduce the text
    // verbatim — no dropped, duplicated, or reordered words
    val byDoc = paras(sf1).groupBy(_._1._1)
    val docs = spark.read.parquet(s"$sf1/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(byDoc.keySet == docs.keySet, "chunker lost or invented documents")
    byDoc.foreach { case (doc, rows) =>
      val rebuilt = rows.sortBy(_._1._2).map(_._2).mkString(" ")
      assert(rebuilt == docs(doc), s"doc $doc reassembly mismatch")
    }
    // every chunk except a doc's last has exactly paraWords words
    byDoc.values.foreach { rows =>
      rows.sortBy(_._1._2).dropRight(1).foreach { case ((doc, i), p) =>
        assert(p.split(" ").length == Dedup.paraWords,
          s"non-final chunk ($doc, $i) is not ${Dedup.paraWords} words")
      }
    }
  }

  /** Brute-force paragraph-TYPE-pair Jaccard over word 2-gram
    * shingles — the truth d17's banding approximates. Exact-duplicate
    * paragraphs collapse to their d16 survivor key (min packed key per
    * distinct text) exactly as the entry does, so the truth space is
    * distinct types. */
  private def brutePairs(dir: String): Map[(Long, Long), Double] = {
    val sh = paras(dir)
      .groupBy(_._2).toSeq
      .map { case (p, rows) =>
        val key = rows.map { case ((doc, i), _) =>
          doc * Dedup.paraKeyStride + i }.min
        val w = p.split(" ")
        (key, w.zip(w.drop(1)).map { case (a, b) => s"${a}_$b" }.toSet)
      }.filter(_._2.nonEmpty)
    (for {
      (ka, sa) <- sh; (kb, sb) <- sh if ka < kb
      j = (sa & sb).size.toDouble / (sa | sb).size if j >= 0.5
    } yield (ka, kb) -> j).toMap
  }

  test("d17 reported jaccards are exact and above the report threshold") {
    val truth = brutePairs(sf1)
    val got = SparkEntry.queries("d17_paragraph_neardup")(spark, sf1).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    assert(got.nonEmpty, "d17 found no paragraph near-dups on testdata")
    got.foreach { case (pair, j) =>
      assert(truth.contains(pair), s"pair $pair reported but below threshold")
      assert(math.abs(truth(pair) - j) < 1e-12,
        s"pair $pair jaccard $j != brute ${truth(pair)} — verification not exact")
    }
  }

  test("d17 recall vs brute force is measured and sane") {
    val truth = brutePairs(sf1)
    val got = SparkEntry.queries("d17_paragraph_neardup")(spark, sf1).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // top-50 cap: recall is measured against the 50 highest-jaccard
    // true pairs, the set the entry is defined to report
    val top = truth.toSeq.sortBy { case ((a, b), j) => (-j, a, b) }
      .take(50).map(_._1).toSet
    val recall = (got & top).size.toDouble / top.size
    info(f"d17 recall@50: ${(got & top).size}/${top.size} = $recall%.3f")
    assert(recall >= 0.8, f"d17 recall $recall%.3f collapsed")
  }

  test("d18 plan ships paragraph text through exactly one exchange") {
    // the df computation must exchange digests only; the PARAGRAPH
    // text crosses once (the doc_id repartition serving both the
    // keep-join and the reassembly groupBy — HashPartitioning(doc_id)
    // satisfies both). The final rangepartitioning of the REASSEMBLED
    // output (`text`) is the oracle's ORDER BY delivery sort, present
    // in every ordered entry — excluded by matching `para` only.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val plan = SparkEntry.queries("d18_boilerplate_strip")(spark, sf1)
      .queryExecution.executedPlan
    def collectEx(p: SparkPlan): Seq[ShuffleExchangeExec] = p match {
      case a: AdaptiveSparkPlanExec => collectEx(a.executedPlan)
      case e: ShuffleExchangeExec if e.output.exists(_.name == "para") =>
        e +: e.children.flatMap(collectEx)
      case other => other.children.flatMap(collectEx)
    }
    val textExchanges = collectEx(plan)
    assert(textExchanges.size == 1,
      s"paragraph text crosses ${textExchanges.size} exchanges, want 1:\n" +
        textExchanges.map(_.outputPartitioning).mkString("\n"))
  }

  test("d18 strips exactly the over-df paragraphs and reassembles in order") {
    val all = paras(sf1)
    val df = all.groupBy(_._2).map { case (p, rs) =>
      p -> rs.map(_._1._1).distinct.length }
    val expected = all.filter { case (_, p) => df(p) <= Dedup.boilerplateMaxDf }
      .groupBy(_._1._1)
      .map { case (doc, rs) =>
        doc -> rs.sortBy(_._1._2).map(_._2).mkString(" ") }
    val got = SparkEntry.queries("d18_boilerplate_strip")(spark, sf1).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == expected, s"docs differing: ${
      (expected.keySet ++ got.keySet).filter(k => expected.get(k) != got.get(k)).take(5)}")
  }

  test("d16 survivors cover every distinct paragraph digest exactly once") {
    val d16 = SparkEntry.queries("d16_paragraph_dedup")(spark, sf1).collect()
    val digests = d16.map(_.getString(2))
    assert(digests.distinct.length == digests.length, "digest reported twice")
    val nDistinct = paras(sf1).map(_._2).distinct.length
    assert(digests.length == nDistinct,
      s"${digests.length} survivors != $nDistinct distinct paragraphs")
    // survivor is the lexicographically-first (doc, para) bearer;
    // an independent JVM-side sha256 keys the comparison
    def sha(s: String): String = java.security.MessageDigest
      .getInstance("SHA-256").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val byDigest = paras(sf1).groupBy(p => sha(p._2))
    d16.foreach { r =>
      val expect = byDigest(r.getString(2)).map(_._1).min
      assert((r.getLong(0), r.getLong(1).toInt) == expect,
        s"digest ${r.getString(2).take(8)} survivor ${(r.getLong(0), r.getLong(1))} != first bearer $expect")
    }
  }

  test("d20 clusters are exactly the transitive closure of d17's pair space") {
    val pairs = Dedup.paraNearDupPairs(spark, sf1).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "no near-dup pairs on sf0.001")
    // driver-side union-find (union by min ⇒ each root is its
    // component's min key, matching the engine's min-label closure)
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // per-type herd sizes (d16's digest pass, recomputed locally)
    val herd = paras(sf1).groupBy(_._2).map { case (_, rows) =>
      val keys = rows.map { case ((doc, i), _) => doc * Dedup.paraKeyStride + i }
      keys.min -> keys.size.toLong
    }
    val expected = pairs.flatMap(p => Seq(p._1, p._2)).distinct
      .groupBy(find).map { case (root, nodes) =>
        (root, nodes.length.toLong, nodes.map(herd).sum) }.toSet
    val got = SparkEntry.queries("d20_para_clusters")(spark, sf1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSet == expected,
      s"cluster partitions diverge: got ${got.toSet.size}, expected ${expected.size}; " +
        s"sample diff ${(expected -- got.toSet).take(2)} / ${(got.toSet -- expected).take(2)}")
    // delivery order: instances desc, then cluster label
    assert(got.sortBy(c => (-c._3, c._1)).toSeq == got.toSeq, "output order wrong")
  }
}
