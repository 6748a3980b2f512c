package graft

/** Benchmark main (driver contract): times every registered query on
  * SPARK_GRAFT_SF_DIR and prints one JSON line.
  *
  * Each query is forced through a `noop` sink so the full pipeline
  * (scan → transform → result) materializes — `.count()` alone lets
  * Catalyst prune projections that a real consumer would pay for. A
  * session warm-up runs first so JVM/codegen startup is not billed to
  * the first query.
  *
  * Failure handling: a query that throws is NOT timed — it is omitted
  * from the `queries` map, listed in `failed`, and the process exits
  * nonzero, so a broken query can never silently improve the published
  * total. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.local(cpus)
    import org.apache.spark.sql.functions._
    // warm up session, codegen, and the parquet footer caches
    spark.range(1000000).agg(sum(col("id"))).collect()
    Tables.names.foreach(n => Tables.table(spark, sfDir, n).count())
    val failed = scala.collection.mutable.ListBuffer[String]()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      // min of two runs: single-run numbers on this VM carry multi-second
      // JIT/compile noise; the min is the stable per-query cost
      val times = (1 to 2).flatMap { _ =>
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            false
          }
        val dt = (System.nanoTime() - t0) / 1e9
        // per-query caches must not leak into the next measurement
        spark.catalog.clearCache()
        if (ok) Some(dt) else None
      }
      if (times.isEmpty) { failed += name; None }
      else {
        // one-off multi-second VM stalls can hit both samples' neighbor:
        // when the two runs disagree by >3x, take a third and keep the min
        val min2 = times.min
        val extra = if (times.size == 2 && times.max > 3 * min2) {
          val t0 = System.nanoTime()
          val ok =
            try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
            catch { case _: Throwable => false }
          val dt = (System.nanoTime() - t0) / 1e9
          spark.catalog.clearCache()
          // a failed tie-breaker run must not contribute its (fast)
          // failure latency to the min
          if (ok) Some(dt) else None
        } else None
        Some(name -> (extra.toSeq :+ min2).min)
      }
    }
    // 3-decimal (ms) resolution keeps the JSON line compact enough for
    // tail-window parsers; sub-ms per-query precision is noise anyway
    def fmt(v: Double): String = "%.3f".format(v)
    val qs = results.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val line =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir"}"""
    // file copy survives stdout-capture truncation by the harness
    try java.nio.file.Files.write(
      java.nio.file.Paths.get("bench_last.json"),
      (line + "\n").getBytes("UTF-8"))
    catch { case _: Throwable => () }
    println(line)
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
