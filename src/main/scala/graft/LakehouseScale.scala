package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.{GraftMerge, GraftVersions}

/** Empirical scale check for the LAKEHOUSE VERBS (dev tool, the
  * ScaleProof companion): every l-family scaladoc claims "cost is
  * O(touched files), never O(table)" — this measures it. Two versioned
  * tables are built from the sf0.1 documents corpus, one at 1× (32
  * range-clustered files) and one at 10× rows AND 10× files (320), and
  * each verb performs the SAME absolute work on both:
  *
  *  - MERGE upserts a fixed ~n/32 of the base id range (≈ 1 file's
  *    key span at both scales — range clustering is the layout that
  *    makes the touched set scale-invariant, p21's argument);
  *  - DELETE / UPDATE hit a fixed narrow id band (≈ 1 file);
  *  - COMPACT bin-packs the same 5 small appended files at both scales
  *    (the big base files sit above the threshold);
  *  - EXPIRE retires the same number of snapshots.
  *
  * If the verbs were O(table), every ratio would read ≈ 10 (10× files
  * AND 10× rows); O(touched files) predicts ratios ≈ 1 plus the honest
  * sublinear terms that DO scale with the table — the touched-file
  * DISCOVERY pass (a predicate scan whose parquet footer min/max stats
  * skip non-matching files when the predicate correlates with the
  * range layout) and the O(files) manifest write. The uncorrelated-
  * predicate case (discovery degrades to a full scan) is documented in
  * SCALEPROOF.md, not measured here — range clustering is the
  * prescribed layout for takedown predicates.
  *
  * Usage: runMain graft.LakehouseScale [--copies N] */
object LakehouseScale {

  private def rmTree(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(rmTree)); f.delete()
  }

  /** Build a versioned table: the (possibly scaled) corpus as `files`
    * range-clustered files on doc_id (snapshot 1), plus 5 small
    * appends (snapshots 2–6) for compaction to pack. */
  private def build(spark: SparkSession, dir: String, docs: DataFrame,
      files: Int): Unit = {
    rmTree(new java.io.File(dir))
    new java.io.File(dir).mkdirs()
    GraftVersions.commit(dir,
      docs.repartitionByRange(files, col("doc_id")), overwrite = false)
    (1 to 5).foreach { i =>
      GraftVersions.commit(dir,
        docs.filter(col("doc_id") < 20)
          .withColumn("doc_id", col("doc_id") + lit(20000000L + i * 100L)),
        overwrite = false)
    }
  }

  def main(args: Array[String]): Unit = {
    val copies = args.sliding(2).collectFirst {
      case Array("--copies", n) => n.toInt }.getOrElse(10)
    val sf = "/root/testdata/sf0.1"
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val base = spark.read.parquet(s"$sf/documents.parquet")
    val span = 5000L // sf0.1 doc_id range; fixed verb work = span/32 ids
    val band = span / 32

    // fixed-work verb suite, identical absolute inputs at both scales
    def verbs(dir: String): Seq[(String, () => Unit)] = Seq(
      "merge" -> (() => {
        val src = base.filter(col("doc_id") < band)
          .withColumn("text", concat(lit("u_"), col("text")))
        GraftMerge.mergeInto(spark, dir, src, "doc_id"): Unit
      }),
      "delete" -> (() =>
        GraftMerge.deleteFrom(spark, dir,
          col("doc_id") >= band && col("doc_id") < 2 * band): Unit),
      "update" -> (() =>
        GraftMerge.updateWhere(spark, dir,
          col("doc_id") >= 2 * band && col("doc_id") < 3 * band,
          Seq("lang" -> lit("xx"))): Unit),
      // 16 KB: above the 5 tiny appended files, BELOW the ~46 KB
      // range-clustered base files — compaction must pack the appends
      // only, at both scales, or the measurement degrades to O(table)
      "compact" -> (() =>
        GraftMerge.compact(spark, dir, smallBytes = 16 * 1024L): Unit),
      // the honest degradation case: an UNANALYZABLE predicate (a
      // function call — no conjunct bounds extractable) forces the
      // discovery pass to scan every file — matches zero rows,
      // isolating the pure discovery cost the layout argument (p21)
      // and the stats channels exist to avoid. Expect growth here;
      // that is the measurement's point. (A plain `lang = 'zz'` no
      // longer degrades: string stats prune impossible values from
      // the manifest alone.)
      "delete-uncorr" -> (() =>
        GraftMerge.deleteFrom(spark, dir, length(col("lang")) === -1): Unit),
      "expire" -> (() =>
        GraftVersions.expire(dir, keepLast = 2, orphanGraceMillis = 0L): Unit))

    def run(copies: Int, files: Int, dir: String): Map[String, Double] = {
      val docs = if (copies == 1) base else ScaleProof.scaleDocs(base, copies)
      build(spark, dir, docs, files)
      verbs(dir).map { case (name, f) =>
        val t0 = System.nanoTime()
        f()
        name -> (System.nanoTime() - t0) / 1e9
      }.toMap
    }

    // the bloom point channel, measured on an id-UNCORRELATED layout
    // (hash-partitioned by lang: every file's doc_id range spans the
    // whole corpus, so min/max stats prune nothing): a point DELETE
    // without sidecars is the honest O(table) discovery caveat; with
    // sidecars it reads the manifest + the files that actually hold
    // the id — the before/after pair for GraftBlooms
    def pointDelete(copies: Int, files: Int, dir: String,
        bloom: Boolean): Double = {
      val docs = if (copies == 1) base else ScaleProof.scaleDocs(base, copies)
      rmTree(new java.io.File(dir))
      new java.io.File(dir).mkdirs()
      if (bloom) spark.conf.set("spark.sql.graft.bloom.columns", "doc_id")
      // scatter by text (high-cardinality): every file non-empty with
      // a doc_id range spanning the corpus — the layout where min/max
      // cannot serve a point predicate
      try GraftVersions.commit(dir,
        docs.repartition(files, col("text")), overwrite = false)
      finally spark.conf.unset("spark.sql.graft.bloom.columns")
      val t0 = System.nanoTime()
      GraftMerge.deleteFrom(spark, dir, col("doc_id") === band)
      (System.nanoTime() - t0) / 1e9
    }

    val root = "/dev/shm/graft-lakescale"
    // warm-up pass absorbs codegen/JIT so the 1× measurement is honest
    run(1, 32, s"$root/warm")
    val t1 = run(1, 32, s"$root/x1")
    val tN = run(copies, 32 * copies, s"$root/x$copies")
    println(f"${"verb"}%-10s ${"1x(32f)"}%9s ${copies + "x(" + 32 * copies + "f)"}%12s  ratio")
    Seq("merge", "delete", "update", "compact", "delete-uncorr",
        "expire").foreach { v =>
      println(f"$v%-10s ${t1(v)}%9.2f ${tN(v)}%12.2f  ${tN(v) / t1(v)}%5.1f")
    }
    pointDelete(1, 32, s"$root/pwarm", bloom = true) // warm the path
    val p1b = pointDelete(1, 32, s"$root/p1b", bloom = true)
    val pNb = pointDelete(copies, 32 * copies, s"$root/pNb", bloom = true)
    val p1n = pointDelete(1, 32, s"$root/p1n", bloom = false)
    val pNn = pointDelete(copies, 32 * copies, s"$root/pNn", bloom = false)
    println(f"${"point-delete (uncorrelated layout)"}%-34s")
    println(f"${"  with blooms"}%-34s ${p1b}%6.2f ${pNb}%6.2f  ${pNb / p1b}%5.1f")
    println(f"${"  without"}%-34s ${p1n}%6.2f ${pNn}%6.2f  ${pNn / p1n}%5.1f")
    rmTree(new java.io.File(root))
    spark.stop()
  }
}
