package graft

/** Prints the formatted physical plan of registered queries (dev tool).
  * Usage: runMain graft.ExplainOne <sfDir> <name> [<name>...] */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.local("8")
    args.drop(1).foreach { n =>
      println(s"===== $n =====")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
