package graft

import org.apache.spark.sql.functions._

/** Independent Scala re-derivations for the round-10 corpus metrics
  * (d22 novelty, t16 readability, p22 loss mask, s23 range search).
  * Each is driver-oracled against DuckDB; these gates recompute the
  * same answers through a SECOND independent implementation path
  * (driver-side Scala over collected rows), so a bug shared by the
  * Spark plan and the oracle SQL (same mis-transcribed formula twice)
  * cannot hide. */
class CorpusMetricsSpec extends SparkSpec {

  private lazy val docs: Array[(Long, String)] =
    spark.read.parquet(s"$sf1/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1))

  test("d22 novelty matches a brute-force first-occurrence scan") {
    val grams = docs.map { case (id, t) =>
      // limit -1 keeps trailing empty tokens — Spark split()'s semantics
      id -> t.split(" ", -1).sliding(3).filter(_.length == 3)
        .map(_.mkString("_")).toSet
    }.toMap
    val firstDoc = scala.collection.mutable.Map.empty[String, Long]
    grams.toSeq.sortBy(_._1).foreach { case (id, gs) =>
      gs.foreach(g => if (!firstDoc.contains(g)) firstDoc(g) = id)
    }
    val got = SparkEntry.queries("d22_ngram_novelty")(spark, sf1).collect()
      .map(r => r.getLong(0) -> (r.getAs[Long]("n_grams"),
        r.getAs[Long]("n_novel"))).toMap
    val expected = grams.filter(_._2.nonEmpty).map { case (id, gs) =>
      id -> (gs.size.toLong, gs.count(g => firstDoc(g) == id).toLong)
    }
    assert(got == expected)
    // the metric is non-trivial on this corpus: both novel-heavy and
    // duplicate-heavy documents exist
    val ratios = got.map { case (_, (n, nov)) => nov.toDouble / n }
    assert(ratios.exists(_ > 0.9) && ratios.exists(_ < 0.5))
  }

  test("t16 readability matches a regex re-derivation") {
    val got = SparkEntry.queries("t16_readability")(spark, sf1).collect()
      .map(r => r.getLong(0) -> ((r.getAs[Int]("n_words"),
        r.getAs[Int]("n_sent"), r.getAs[Long]("n_syl")),
        r.getAs[Double]("flesch"))).toMap
    docs.foreach { case (id, t) =>
      val words = t.split(" ", -1)
      val sent = math.max("[.!?]".r.findAllIn(t).size, 1)
      val syl = words.map(w =>
        math.max("[aeiouy]+".r.findAllIn(w.toLowerCase).size, 1).toLong).sum
      val ((gw, gs, gy), gf) = got(id)
      assert((gw, gs, gy) == (words.length, sent, syl), s"counts for doc $id")
      val flesch = 206.835 - 1.015 * (words.length.toDouble / sent) -
        84.6 * (syl.toDouble / words.length)
      assert(gf == flesch, s"flesch for doc $id")
    }
  }

  test("p22 mask is deterministic, position-exact, and ~15% dense") {
    // mask_positions is emitted comma-joined (oracle-hashable form);
    // parse it back for the position-exact comparison
    def parsePos(s: String): Vector[Long] =
      if (s.isEmpty) Vector.empty else s.split(",").map(_.toLong).toVector
    val got = SparkEntry.queries("p22_loss_mask")(spark, sf1).collect()
      .map(r => r.getLong(0) -> (r.getAs[Int]("n_tokens"),
        parsePos(r.getString(3)))).toMap
    var masked = 0L; var total = 0L
    docs.foreach { case (id, t) =>
      val n = t.split(" ", -1).length
      val pos = (0L until n.toLong).filter { i =>
        ((1103515245L * ((id * 65536L + i) % 2147483648L) + 12345L)
          % 2147483648L) % 100 < 15
      }.toVector
      assert(got(id) == ((n, pos)), s"mask for doc $id")
      masked += pos.length; total += n
    }
    val rate = masked.toDouble / total
    assert(rate > 0.13 && rate < 0.17, s"global mask rate $rate")
    // partitioning invariance: same masks under a different layout
    val re = SparkEntry.queries("p22_loss_mask")(spark, sf1)
    val re12 = re.repartition(12).orderBy(col("doc_id")).collect()
      .map(r => r.getLong(0) -> parsePos(r.getString(3))).toMap
    assert(re12 == got.map { case (k, (_, p)) => k -> p })
  }

  test("t17 char entropy matches a driver-side recompute") {
    val got = SparkEntry.queries("t17_char_entropy")(spark, sf1).collect()
      .map(r => r.getLong(0) -> (r.getAs[Long]("n"),
        r.getAs[Double]("entropy_nats"))).toMap
    docs.foreach { case (id, t) =>
      val counts = t.toCharArray.groupBy(identity).map(_._2.length.toLong)
      val n = counts.sum
      val s = counts.map(m => m * math.round(math.log(m.toDouble) * 1e6)).sum
      val ent = (n * math.round(math.log(n.toDouble) * 1e6) - s).toDouble /
        (n.toDouble * 1e6)
      assert(got(id) == ((n, ent)), s"entropy for doc $id")
      // sanity: entropy of real text sits between degenerate bounds
      assert(ent >= 0.0 && ent <= math.log(counts.size.toDouble) + 1e-9)
    }
  }

  test("p23 interleave matches a driver-side stride schedule and is mixture-faithful") {
    val sources = spark.read.parquet(s"$sf1/documents.parquet")
      .select(col("doc_id"), col("source")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val n = sources.length.toLong
    val bySource = sources.groupBy(_._2)
    val expected = bySource.toSeq.flatMap { case (src, ds) =>
      ds.map(_._1).sorted.zipWithIndex.map { case (id, rk) =>
        val vt = ((2L * rk + 1) * 1000000000L) / (2L * ds.length)
        (vt, src, id)
      }
    }.sorted.take(200).zipWithIndex
      .map { case ((vt, src, id), i) => (id, src, vt, (i + 1).toLong) }
    val got = SparkEntry.queries("p23_epoch_interleave")(spark, sf1).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected)
    // stride scheduling's fairness bound: every source appears in the
    // 200-prefix within ~1 slot of its exact corpus proportion
    bySource.foreach { case (src, ds) =>
      val want = 200.0 * ds.length / n
      val have = got.count(_._2 == src)
      assert(math.abs(have - want) <= 2, s"$src: $have vs $want")
    }
  }

  test("s23 range search matches brute-force cosine over doubles") {
    val embs = spark.read.parquet(s"$sf1/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val qs = embs.filter(_._1 < 8)
    val corpus = embs.filter(_._1 >= 8)
    val expected = (for {
      (qid, qe) <- qs; (nid, ne) <- corpus
      if cos(qe, ne) >= 0.30
    } yield (qid, nid)).toSet
    val got = SparkEntry.queries("s23_range_search")(spark, sf1).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected)
    // no knife-edge pairs: every cosine is comfortably away from τ,
    // so engine ULP differences cannot flip membership
    val margin = (for { (_, qe) <- qs; (_, ne) <- corpus }
      yield math.abs(cos(qe, ne) - 0.30)).min
    assert(margin > 1e-6, s"cosine within $margin of threshold")
  }

  private def sha256hex(s: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("t18 classifier matches a driver-side hashed-linear recompute") {
    def weight(b: Long): Long = (b * 1103515245L + 12345L) % 2001L - 1000L
    val expected = docs.map { case (id, t) =>
      val toks = t.split(" ", -1)
      val score = toks.map { w =>
        weight(java.lang.Integer.parseInt(sha256hex(w).take(4), 16) % 256)
      }.sum
      id -> ((toks.length.toLong, score, score > 0))
    }.toMap
    val got = SparkEntry.queries("t18_hashed_classifier")(spark, sf1)
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("score_milli"),
          r.getAs[Boolean]("keep")))).toMap
    assert(got == expected)
    // the decision is non-trivial on this corpus: both classes occur
    val kept = got.values.count(_._3)
    assert(kept > 0 && kept < got.size, s"degenerate filter: $kept/${got.size}")
  }

  test("p24 overlap matrix matches driver-side pairwise set intersections") {
    val bySrc = spark.read.parquet(s"$sf1/documents.parquet")
      .select(col("source"), col("text")).collect()
      .map(r => r.getString(0) -> r.getString(1))
      .groupBy(_._1).map { case (src, rows) =>
        src -> rows.flatMap { case (_, t) =>
          t.split(" ", -1).sliding(5).filter(_.length == 5).map(_.mkString(" "))
        }.toSet
      }
    val expected = (for {
      (a, ga) <- bySrc.toSeq; (b, gb) <- bySrc.toSeq if a != b
      n = ga.intersect(gb).size if n > 0
    } yield (a, b) -> ((ga.size.toLong, n.toLong, n.toDouble / ga.size))).toMap
    val got = SparkEntry.queries("p24_source_overlap")(spark, sf1)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getAs[Long]("n_grams"), r.getAs[Long]("n_overlap"),
          r.getAs[Double]("frac")))).toMap
    assert(got == expected)
    assert(got.nonEmpty, "no overlapping source pair at sf0.001")
  }

  test("q80 recursive CTE matches a driver-side ancestor walk") {
    val chars = spark.read.parquet(s"$sf1/documents.parquet")
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = chars.keys.filter(_ >= 1).map { id =>
      var cur = id; var depth = 0L; var path = chars(id)
      while (cur > 1) { cur /= 2; depth += 1; path += chars(cur) }
      id -> ((depth, path))
    }.toMap
    val got = SparkEntry.queries("q80_recursive_cte")(spark, sf1)
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[Int]("depth").toLong, r.getAs[Long]("path_chars")))).toMap
    assert(got == expected)
    // the hierarchy is genuinely deep: a heap over n docs has lg(n) levels
    assert(got.values.map(_._1).max >= 7)
  }
}
