package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Positive-scaling leg of the SCALECURVE (verdict r14 #7): the r14
  * curve was honestly FLAT because sf0.1 per-task work is milliseconds
  * — fixed per-stage cost dominates, which is the correct reading at
  * that size but completes only half the reference's workers-1→5 story
  * (q003: 64.2→47.8 min — scale-out PAYS when per-task work is real).
  * This main builds that regime: a `--copies`× document corpus (the
  * ScaleProof construction — per-copy word prefixes keep the duplicate
  * structure exactly copies × the base, no quadratic cross-copy term)
  * and two COMPUTE-bound probes over it, run on the REAL standalone
  * scheduler at `local-cluster[N,4,2048]` for N = 1, 2, 4 executor
  * JVM processes.
  *
  * Probes: d17_paragraph_neardup (banded-minhash paragraph pairs — the
  * dedup family's hot loop) and t11_bigram_coverage (per-doc bigram
  * set statistics — the text family's). Both are per-row CPU with
  * bounded shuffles, so task work in SECONDS should show real
  * speedup with executor count — the claim this main measures.
  *
  * Protocol per N: one untimed warm pass, then each probe timed twice,
  * min taken; outputs canonicalized and required BIT-IDENTICAL across
  * topologies (a curve point from a diverging plan is meaningless).
  *
  * Run: `SPARK_SCALA_VERSION=2.13 SPARK_HOME=/opt/spark
  *       ./run-main.sh graft.ScaleCurveCompute [--copies N]`
  * Prints one JSON line
  * `{"metric":"scale_curve_compute","copies":…,"workers":{…},
  *   "ratio_n4":…}`; exits nonzero on divergence. */
object ScaleCurveCompute {

  // t11 first: measured after d17's heap churn it reads 2-3× its own
  // cost (the copies-30 N=4 artifact in BENCH.md) — light probe before
  // heavy keeps each measurement on a settled heap
  val probes: Seq[String] = Seq("t11_bigram_coverage", "d17_paragraph_neardup")

  private def canonical(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toIndexedSeq

  private[graft] def cluster(executors: Int): SparkSession = {
    val localDir = new java.io.File("/dev/shm/graft-spark")
    localDir.mkdirs()
    val spark = GraftSession.configure(
      SparkSession.builder()
        .master(s"local-cluster[$executors,4,4096]")
        .appName(s"graft-scale-compute-$executors")
        .config("spark.local.dir", localDir.getAbsolutePath)
        // FIXED partition count across topologies: identical task
        // decomposition at every N, so the curve isolates executor
        // count (and small tasks bound per-task memory — the 30×
        // banded self-join OOMs a 1.5g executor at 4 partitions)
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.executor.memory", "3584m")
        .config("spark.executor.extraClassPath",
          System.getProperty("java.class.path"))
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    functions.TrinoFunctions.register(spark)
    functions.VectorFunctions.register(spark)
    spark
  }

  def main(args: Array[String]): Unit = {
    val copies = args.sliding(2).collectFirst {
      case Array("--copies", n) => n.toInt }.getOrElse(30)
    val sf = "/root/testdata/sf0.1"
    val outDir = s"target/scalecompute$copies"

    // corpus build once, plain local session (not part of the curve)
    if (!new java.io.File(s"$outDir/documents.parquet").exists()) {
      val b = GraftSession.local("8")
      try ScaleProof.scaleDocs(
          b.read.parquet(s"$sf/documents.parquet"), copies)
        // 16 input files: enough splits to feed 16 cores at N=4
        .repartition(16).write.mode("overwrite")
        .parquet(s"$outDir/documents.parquet")
      finally b.stop()
    }

    val executorCounts = Seq(1, 2, 4)
    val results = executorCounts.map { n =>
      val spark = cluster(n)
      try {
        probes.foreach(q => canonical(SparkEntry.queries(q)(spark, outDir)))
        n -> probes.map { q =>
          val fn = SparkEntry.queries(q)
          var rows: Seq[String] = Seq.empty
          val times = (1 to 2).map { _ =>
            val t0 = System.nanoTime()
            rows = canonical(fn(spark, outDir))
            (System.nanoTime() - t0) / 1e9
          }
          q -> (times.min, rows)
        }.toMap
      } finally spark.stop()
    }.toMap

    val base = results(executorCounts.head)
    val diverged = for {
      n <- executorCounts.tail
      q <- probes if results(n)(q)._2 != base(q)._2
    } yield s"$q@$n"
    if (diverged.nonEmpty) {
      System.err.println(
        s"[scale-compute] diverged: ${diverged.mkString(", ")}")
      println(s"""{"metric":"scale_curve_compute","status":"diverged","failed":"${diverged.mkString(",")}"}""")
      sys.exit(1)
    }
    val workers = executorCounts.map { n =>
      val qs = probes.map(q => s""""$q":${JsonNum.f3(results(n)(q)._1)}""")
        .mkString(",")
      s""""$n":{$qs}"""
    }.mkString(",")
    // headline ratio: total probe seconds at N=4 over N=1
    val t1 = probes.map(q => results(1)(q)._1).sum
    val t4 = probes.map(q => results(4)(q)._1).sum
    println(s"""{"metric":"scale_curve_compute","copies":$copies,""" +
      s""""status":"ok","workers":{$workers},""" +
      s""""ratio_n4":${JsonNum.f3(t4 / t1)}}""")
  }
}
