package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Third leg of the SCALECURVE (verdict r15 #6): the compute-bound
  * scale-out story so far covers the near-dup family (d17) and a text
  * probe (t11); this main extends it to the two remaining families a
  * production pipeline leans on at 100 TB — RETRIEVAL (a batch ANN
  * probe of a stored s11-layout index) and DML (a MERGE whose source
  * scatters across every file of a 100×-file versioned table).
  *
  * ANN leg — `s11_batch_probe`: the index over a scaled corpus
  * (ScaleProof.scaleEmb, per-copy orthogonal transforms keep
  * within-copy cosine structure intact) is built ONCE, untimed — the
  * production economics s11's scaladoc argues for. The timed probe is
  * a ~corpus/30 query batch (the serving shape; the entries' fixed
  * `vec_id < 10` probe set is a correctness harness, not a workload)
  * through [[operators.Similarity.probeStoredCellsBatch]]: broadcast
  * the query-probe relation, read only probed cells, exact-rerank,
  * top-5 per query. Per-task work is real (hundreds of thousands of
  * scored candidates per shuffle partition), so executor count should
  * pay.
  *
  * DML leg — `merge_allfiles`: LakehouseScale measures the verbs'
  * O(touched-files) economics with FIXED absolute work; this leg
  * measures the other regime — touched = ALL files (a source hitting
  * every file's key span of a 3,200-file table, the l-family's 100×
  * shape), where the rewrite is the workload and should scale with
  * executors. Each timed run starts from a byte-identical PRISTINE
  * copy of the table (manifests hold relative file names, so a
  * directory copy is a valid table) so every topology times the same
  * merge against the same state.
  *
  * Protocol per N (= 1, 2, 4 executor JVMs on the real standalone
  * scheduler, fixed 64 shuffle partitions — identical task
  * decomposition): one untimed warm pass per leg, then timed twice,
  * min taken. Outputs canonicalized and required BIT-IDENTICAL across
  * topologies (probe: the collected top-5 rows; merge: row-count +
  * xor-of-row-hashes + sum(n_chars) over the merged table — xor, not
  * sum, because ANSI sum(long) over 500k 64-bit hashes would
  * overflow).
  *
  * Run: `SPARK_SCALA_VERSION=2.13 SPARK_HOME=/opt/spark
  *       ./run-main.sh graft.ScaleCurveFamilies [--ann-copies N]
  *       [--dml-copies N]`
  * Prints one JSON line
  * `{"metric":"scale_curve_families", ..., "workers":{...},
  *   "ratio_n4_ann":..., "ratio_n4_merge":...}`; exits nonzero on
  * divergence. */
object ScaleCurveFamilies {

  private val root = "/dev/shm/graft-scale-fam"

  private def rmTree(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(rmTree)); f.delete()
  }

  private def copyTree(src: java.io.File, dst: java.io.File): Unit = {
    if (src.isDirectory) {
      dst.mkdirs()
      src.listFiles().foreach(c => copyTree(c, new java.io.File(dst, c.getName)))
    } else java.nio.file.Files.copy(src.toPath, dst.toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  private def canonical(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toIndexedSeq

  /** Read the current snapshot of a versioned table directly off its
    * manifest (the harness-side mirror of readSnapshot). */
  private def snapshot(spark: SparkSession, dir: String): DataFrame = {
    val files = sources.GraftVersions.manifest(
      dir, sources.GraftVersions.current(dir))
    spark.read.parquet(files: _*)
  }

  private def tableChecksum(spark: SparkSession, dir: String): String = {
    val t = snapshot(spark, dir)
    val cols = t.columns.sorted.map(col)
    t.agg(count(lit(1)).as("n"),
        bit_xor(xxhash64(cols: _*)).as("x"),
        sum(col("n_chars")).as("s"))
      .head().toString
  }

  def main(args: Array[String]): Unit = {
    def arg(name: String, dflt: Int): Int = args.sliding(2).collectFirst {
      case Array(`name`, n) => n.toInt }.getOrElse(dflt)
    val annCopies = arg("--ann-copies", 30)
    val dmlCopies = arg("--dml-copies", 100)
    val dmlFiles = 32 * dmlCopies
    val sf = "/root/testdata/sf0.1"
    val annDir = s"$root/ann$annCopies"
    val pristine = s"$root/dml$dmlCopies-pristine"
    val srcPq = s"$root/dml$dmlCopies-source.parquet"
    val qPq = s"$annDir/queries.parquet"

    // ---- one-time prep (plain local session, not part of the curve).
    // The ANN cache is keyed on an explicit completion SENTINEL
    // (annDir/_done, written last) rather than bare directory
    // existence: a run killed mid-prep leaves a partial cells/ dir
    // that would otherwise pass the guard and silently benchmark a
    // corrupt corpus. No sentinel → delete and rebuild. (The pristine
    // leg is already safe this way: _current is written last by
    // commit.)
    val annDone = new java.io.File(annDir, "_done")
    if (!annDone.exists() ||
        !new java.io.File(pristine, "_current").exists()) {
      val b = GraftSession.local("8")
      try {
        functions.VectorFunctions.register(b)
        if (!annDone.exists()) {
          rmTree(new java.io.File(annDir))
          val corpus = ScaleProof.scaleEmb(
            Tables.embeddings(b, sf), annCopies)
          val cent = operators.Similarity.ivfCentroids(corpus)
          operators.Similarity.nearestCells(corpus, cent)
            .write.mode("overwrite").partitionBy("cluster")
            .parquet(s"$annDir/cells")
          cent.write.mode("overwrite").parquet(s"$annDir/centroids")
          corpus.filter(pmod(col("vec_id"), lit(30)) === 7)
            .select(col("vec_id"), col("embedding"))
            .write.mode("overwrite").parquet(qPq)
          annDone.createNewFile()
        }
        if (!new java.io.File(pristine, "_current").exists()) {
          rmTree(new java.io.File(pristine))
          new java.io.File(pristine).mkdirs()
          val docs = ScaleProof.scaleDocs(
            b.read.parquet(s"$sf/documents.parquet"), dmlCopies)
          sources.GraftVersions.commit(pristine,
            docs.repartitionByRange(dmlFiles, col("doc_id")),
            overwrite = false)
          // source: every doc_id ≡ 0 (mod 50) — ~2% of rows, but the
          // copy stride (10^7) is a multiple of 50, so every file's
          // ~156-id contiguous span holds matches: touched = ALL files
          docs.filter(pmod(col("doc_id"), lit(50)) === 0)
            .withColumn("text", concat(lit("u_"), col("text")))
            .write.mode("overwrite").parquet(srcPq)
        }
      } finally b.stop()
    }

    val executorCounts = Seq(1, 2, 4)
    // name -> (seconds, canonical) per N
    val results = executorCounts.map { n =>
      val spark = ScaleCurveCompute.cluster(n)
      try {
        // ANN probe: warm, then timed ×2 min
        def probe(): DataFrame = operators.Similarity
          .probeStoredCellsBatch(spark, annDir, spark.read.parquet(qPq))
        canonical(probe())
        var probeRows: Seq[String] = Seq.empty
        val probeSec = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          probeRows = canonical(probe())
          (System.nanoTime() - t0) / 1e9
        }.min

        // MERGE: each run on a fresh pristine copy (copy untimed)
        val src = spark.read.parquet(srcPq)
        def mergeRun(tag: String): (Double, Int, String) = {
          val dir = s"$root/dml-run-$n-$tag"
          rmTree(new java.io.File(dir))
          copyTree(new java.io.File(pristine), new java.io.File(dir))
          val t0 = System.nanoTime()
          val (_, _, touched) =
            sources.GraftMerge.mergeInto(spark, dir, src, "doc_id")
          val sec = (System.nanoTime() - t0) / 1e9
          val sum = tableChecksum(spark, dir)
          rmTree(new java.io.File(dir))
          (sec, touched, sum)
        }
        mergeRun("warm")
        val timed = Seq(mergeRun("t1"), mergeRun("t2"))
        require(timed.map(_._3).distinct.size == 1,
          s"merge checksum diverged WITHIN N=$n: ${timed.map(_._3)}")
        timed.foreach { case (_, touched, _) =>
          require(touched == dmlFiles,
            s"merge touched $touched of $dmlFiles files — the leg is " +
              "specified as the rewrite-everything regime") }
        n -> Map(
          "s11_batch_probe" -> (probeSec, probeRows),
          "merge_allfiles" -> (timed.map(_._1).min, Seq(timed.head._3)))
      } finally spark.stop()
    }.toMap

    val probes = Seq("s11_batch_probe", "merge_allfiles")
    val base = results(executorCounts.head)
    val diverged = for {
      n <- executorCounts.tail
      q <- probes if results(n)(q)._2 != base(q)._2
    } yield s"$q@$n"
    if (diverged.nonEmpty) {
      System.err.println(
        s"[scale-families] diverged: ${diverged.mkString(", ")}")
      println(s"""{"metric":"scale_curve_families","status":"diverged","failed":"${diverged.mkString(",")}"}""")
      sys.exit(1)
    }
    val workers = executorCounts.map { n =>
      val qs = probes.map(q => s""""$q":${JsonNum.f3(results(n)(q)._1)}""")
        .mkString(",")
      s""""$n":{$qs}"""
    }.mkString(",")
    def ratio(q: String): Double = results(4)(q)._1 / results(1)(q)._1
    println(s"""{"metric":"scale_curve_families","ann_copies":$annCopies,""" +
      s""""dml_copies":$dmlCopies,"status":"ok","workers":{$workers},""" +
      s""""ratio_n4_ann":${JsonNum.f3(ratio("s11_batch_probe"))},""" +
      s""""ratio_n4_merge":${JsonNum.f3(ratio("merge_allfiles"))}}""")
  }
}
