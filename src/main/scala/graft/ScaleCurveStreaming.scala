package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming leg of the SCALECURVE: the batch families now all have a
  * measured compute-bound scale-out story (d17 near-dup, s11 batch
  * probe, all-files MERGE — BENCH.md); this main adds the LAST family
  * still gated only by equivalence specs — the Structured Streaming
  * twins — on the same protocol: `local-cluster[N,4,4096]` for
  * N = 1, 2, 4 executor JVM processes, fixed shuffle partitioning,
  * warm pass + min of 2, results required BIT-IDENTICAL across N.
  *
  * Probe — `sessionize_drain`: drain a `--copies`× ScaleProof events
  * backlog (disjoint per-copy user populations, so session structure
  * is exactly copies × sf0.1) through the stateful gap sessionizer
  * (flatMapGroupsWithState), `Trigger.AvailableNow` with
  * `maxFilesPerTrigger` bounding the drain to 4 micro-batches — the
  * production catch-up shape: a bursty backlog consumed in bounded
  * batches, per-user state carried across them. The stateful exchange
  * (hash by user) and per-group session folds are the work that
  * should scale with executor count.
  *
  * Canonicalization: the FINAL per-user (sessions, events) counters.
  * The sessionizer emits a running counter per user per batch-with-
  * activity; counters are monotone, so max == final, and the final
  * state is a pure function of each user's event multiset — invariant
  * to micro-batch boundaries AND to executor topology. (Intermediate
  * emissions are batch-boundary-dependent by design; boundaries are
  * identical across N here because the same corpus and the same
  * `maxFilesPerTrigger` drive the same file-source batching.)
  *
  * Run: `SPARK_SCALA_VERSION=2.13 SPARK_HOME=/opt/spark
  *       ./run-main.sh graft.ScaleCurveStreaming [--copies N]`
  * Prints one JSON line
  * `{"metric":"scale_curve_streaming", ..., "ratio_n4":...}`;
  * exits nonzero on divergence. */
object ScaleCurveStreaming {

  private val root = "/dev/shm/graft-scale-stream"

  private def rmTree(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(rmTree)); f.delete()
  }

  def main(args: Array[String]): Unit = {
    val copies = args.sliding(2).collectFirst {
      case Array("--copies", n) => n.toInt }.getOrElse(100)
    val sf = "/root/testdata/sf0.1"
    val corpus = s"$root/events$copies"

    // ---- one-time corpus build (plain local session, untimed):
    // 32 files so maxFilesPerTrigger=8 gives exactly 4 micro-batches;
    // ts written as NTZ micros — the layout rawSchema declares
    if (!new java.io.File(corpus).exists()) {
      val b = GraftSession.local("8")
      try ScaleProof.scaleEvents(Tables.events(b, sf), copies)
        .withColumn("ts", col("ts").cast("timestamp_ntz"))
        .repartition(32)
        .write.mode("overwrite").parquet(corpus)
      finally b.stop()
    }

    def drain(spark: SparkSession, tag: String): (Double, Seq[String]) = {
      val ckpt = s"$root/ckpt-$tag"
      val sinkDir = s"$root/sink-$tag"
      rmTree(new java.io.File(ckpt)); rmTree(new java.io.File(sinkDir))
      val t0 = System.nanoTime()
      // parquet FILE sink — emissions land executor-side, the
      // production shape. (A first cut used the memory sink: its
      // per-batch driver collect serialized every executor's output
      // through one JVM and REVERSED the curve at copies=300 — a
      // harness artifact, not a property of the operator.)
      val q = streaming.EventsStreaming.sessionize(
          streaming.EventsStreaming.readStream(spark, corpus,
            Map("maxFilesPerTrigger" -> "8")))
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .format("parquet").option("path", sinkDir)
        .trigger(Trigger.AvailableNow())
        .start()
      try q.awaitTermination() finally if (q.isActive) q.stop()
      val sec = (System.nanoTime() - t0) / 1e9
      // final per-user counters (monotone running emissions: max==final)
      val rows = spark.read.parquet(sinkDir)
        .groupBy(col("user_id"))
        .agg(max(col("sessions")).as("sessions"), max(col("events")).as("events"))
        .collect().map(_.toString).sorted.toIndexedSeq
      rmTree(new java.io.File(ckpt)); rmTree(new java.io.File(sinkDir))
      (sec, rows)
    }

    val executorCounts = Seq(1, 2, 4)
    val results = executorCounts.map { n =>
      val spark = ScaleCurveCompute.cluster(n)
      try {
        drain(spark, s"warm_$n")
        val timed = (1 to 2).map(i => drain(spark, s"t${i}_$n"))
        // within-N determinism gate (mirrors the families leg's
        // checksum require): both timed drains must produce the SAME
        // canonical rows BEFORE taking the faster one — otherwise
        // intra-N nondeterminism could hide behind a lucky min
        require(timed.map(_._2).distinct.size == 1,
          s"[scale-streaming] the two timed drains diverged within N=$n")
        n -> timed.minBy(_._1)
      } finally spark.stop()
    }.toMap

    val base = results(executorCounts.head)._2
    val diverged = executorCounts.tail.filter(n => results(n)._2 != base)
    if (diverged.nonEmpty) {
      System.err.println(s"[scale-streaming] diverged at N=${diverged.mkString(",")}")
      println(s"""{"metric":"scale_curve_streaming","status":"diverged","failed":"${diverged.mkString(",")}"}""")
      sys.exit(1)
    }
    val workers = executorCounts.map { n =>
      s""""$n":${JsonNum.f3(results(n)._1)}""" }.mkString(",")
    println(s"""{"metric":"scale_curve_streaming","copies":$copies,""" +
      s""""status":"ok","users":${base.size},""" +
      s""""workers":{$workers},""" +
      s""""ratio_n4":${JsonNum.f3(results(4)._1 / results(1)._1)}}""")
  }
}
