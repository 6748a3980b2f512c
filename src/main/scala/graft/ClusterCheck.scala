package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Multi-executor scheduler check — the closest one machine gets to the
  * reference's 1-vs-5-worker runs (reference: `results/q00N/workers-
  * {1,5}` record identical results at both cluster sizes).
  *
  * `local[N]` runs every task in the driver JVM; `local-cluster
  * [2,4,2048]` is Spark's REAL standalone scheduler with two SEPARATE
  * executor JVM processes: tasks serialize over the wire, shuffle
  * blocks move through netty between processes, and the DAG scheduler
  * does genuine multi-executor placement. Running a representative
  * query slice on both and requiring bit-identical results proves the
  * §5.2 worker-count-invariance property across PROCESS topology — not
  * just across shuffle partitioning (DeterminismSpec's axis): closures
  * and custom Catalyst expressions must actually serialize, codegen
  * must compile in executor JVMs, and exchanges must round-trip the
  * network stack.
  *
  * The slice spans the engine's shapes: scans+agg, broadcast and
  * shuffled joins, TopN, windows, set ops, exact + MinHash dedup,
  * brute-force ANN, sequence packing, and a versioned-catalog
  * commit+time-travel lifecycle (executors write the snapshot files).
  * JDBC-backed entries are excluded — embedded Derby is single-JVM by
  * nature (separate executor processes cannot share its file lock),
  * which is a property of the stand-in store, not of the engine.
  *
  * Run: `ClusterCheck <sfDir>` — exits nonzero on any divergence.
  * LocalClusterSpec forks this as its own JVM (the suite's shared
  * SparkContext cannot coexist with a second master in-process). */
object ClusterCheck {

  val checkQueries: Seq[String] = Seq(
    "q02_scan_group_agg", "q03_join_agg_topn", "q04_left_join_case_agg",
    "q05_except_chain_count", "q15_shuffled_join_agg", "q17_window_topk",
    "q23_tpch_q1", "d01_dedup_exact", "d03_minhash_lsh",
    "s01_ann_bruteforce", "p03_pack_sequences", "l02_time_travel",
    // the two riskiest paths under a process topology: a CUSTOM
    // physical operator (GroupedTopKExec) serialized to executor JVMs,
    // and a stored-index probe whose dynamic partition pruning must
    // fire across processes (executors also WRITE the index partitions)
    "q25_grouped_topk_custom", "s11_ann_persisted",
    // r17: the broadcast-probe inverted-index joins — t09 additionally
    // localCheckpoints the shared tf index, so its checkpointed blocks
    // must serve all four downstream subtrees from EXECUTOR storage
    // under a real process topology
    "d02_word_jaccard", "t09_tf_cosine_pairs",
    // r13: the band-index probe (custom TypedImperativeAggregate
    // signatures + DPP across processes) and the bloom point DELETE
    // (sidecar build is a distributed aggregate; probe is driver-side)
    "d23_incremental_minhash", "l12_bloom_point_delete",
    // r18: the round's riskiest new paths under a process topology —
    // the connected-components loop now RELEASES superseded label
    // snapshots mid-query (executor-resident checkpoint blocks must
    // come and go without breaking the live lineage), and the IVF-PQ
    // build materializes its index relations via localCheckpoint whose
    // blocks every probe stage must read back across executor JVMs
    "d20_para_clusters", "s08_ann_ivfpq",
    // r15: runtime dynamic filtering into WIRE scans across processes —
    // the DPP subquery evaluates driver-side, scan.filter() narrows the
    // partition plan, and executor JVMs dial the store with the
    // narrowed request (mongo $in via q82's stats-driven join; ES
    // terms via q85's q005 shape)
    "q82_cbo_stats_join", "q85_elastic_runtime_filter",
    // r19: the MMR rerank loop now materializes its growing selection
    // per iteration AND releases each superseded snapshot mid-query —
    // five checkpoint/release cycles whose blocks live in executor
    // JVMs; s17 feeds it from a corpus pass, s20 from the full stored-
    // index pipeline (build + DPP probe + eligible semi-join upstream)
    "s17_ann_mmr", "s20_retrieval_pipeline")

  private def canonical(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toIndexedSeq

  private def runAll(master: String, sfDir: String,
      extra: Map[String, String]): Map[String, Seq[String]] = {
    val localDir = new java.io.File("/dev/shm/graft-spark")
    localDir.mkdirs()
    var b = SparkSession.builder()
      .master(master)
      .appName(s"graft-cluster-check")
      .config("spark.local.dir", localDir.getAbsolutePath)
      .config("spark.sql.shuffle.partitions", "8")
    extra.foreach { case (k, v) => b = b.config(k, v) }
    val spark = GraftSession.configure(b).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    functions.TrinoFunctions.register(spark)
    functions.VectorFunctions.register(spark)
    try checkQueries.map { n =>
      n -> canonical(SparkEntry.queries(n)(spark, sfDir))
    }.toMap
    finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    // pass 1: single-process reference
    val single = runAll("local[8]", sfDir, Map.empty)
    // pass 2: real standalone scheduler, two executor JVM processes —
    // the executor processes need the application classes on THEIR
    // classpath (nothing ships a jar in this mode)
    val cluster = runAll("local-cluster[2,4,2048]", sfDir, Map(
      "spark.executor.memory" -> "1536m",
      "spark.executor.extraClassPath" -> System.getProperty("java.class.path")))
    val diverged = checkQueries.filter(n => single(n) != cluster(n))
    val rowCounts = checkQueries.map(n => s"$n=${single(n).size}").mkString(",")
    if (diverged.isEmpty) {
      println(s"""{"metric":"cluster_check","status":"ok","queries":${checkQueries.size},"rows":"$rowCounts"}""")
    } else {
      diverged.foreach { n =>
        System.err.println(s"[cluster-check] $n diverged: " +
          s"single=${single(n).take(3)}... cluster=${cluster(n).take(3)}...")
      }
      println(s"""{"metric":"cluster_check","status":"diverged","failed":"${diverged.mkString(",")}"}""")
      sys.exit(1)
    }
  }
}
