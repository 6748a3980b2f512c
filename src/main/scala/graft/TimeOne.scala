package graft

/** Times individual registered queries (dev tool; Bench is the driver
  * surface). Usage: runMain graft.TimeOne <sfDir> <name> [<name>...] */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1)
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.range(1000000).agg(org.apache.spark.sql.functions.sum("id")).collect()
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        println(f"TIMING $n run$i ${(System.nanoTime() - t0) / 1e9}%.3f s")
        // same inter-measurement hygiene as Bench: table cache AND
        // leaked localCheckpoint blocks (adjudication runs must see
        // the same clean block manager the ledger protocol assumes)
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
      }
    }
    spark.stop()
  }
}
