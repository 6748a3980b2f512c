package graft

/** Benchmark main (driver contract): times every registered query on
  * SPARK_GRAFT_SF_DIR and prints one JSON line.
  *
  * Each query is forced through a `noop` sink so the full pipeline
  * (scan → transform → result) materializes — `.count()` alone lets
  * Catalyst prune projections that a real consumer would pay for. A
  * session warm-up runs first so JVM/codegen startup is not billed to
  * the first query. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.local(cpus)
    import org.apache.spark.sql.functions._
    // warm up session, codegen, and the parquet footer caches
    spark.range(1000000).agg(sum(col("id"))).collect()
    Tables.names.foreach(n => Tables.table(spark, sfDir, n).count())
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      // min of two runs: single-run numbers on this VM carry multi-second
      // JIT/compile noise; the min is the stable per-query cost
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
        }
        val dt = (System.nanoTime() - t0) / 1e9
        // per-query caches must not leak into the next measurement
        spark.catalog.clearCache()
        dt
      }
      name -> times.min
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
