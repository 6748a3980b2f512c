package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Empirical scale check for the dedup/ANN/pipeline families (dev
  * tool): build a 10× corpus from sf0.1 and compare per-query wall
  * time against sf0.1 in the same JVM. A query whose cost grows much
  * faster than the 10× row growth has a super-linear term that would
  * kill it at 100 TB — this is the cheapest falsifier for every "at
  * scale" claim in the operator scaladocs.
  *
  * The 10× corpus is 10 copies of sf0.1 documents/embeddings with
  * disjoint id ranges; copies c>0 get every WORD prefixed with the
  * copy tag, so no shingle/trigram ever matches across copies and the
  * duplicate-pair structure is exactly 10 × the sf0.1 structure
  * (verbatim replication would instead create 45 cross-copy dup pairs
  * per document — quadratic by construction, not a scale test).
  * Embedding copies keep their vectors (ANN probe sets pin vec_id <
  * 10, so query count stays fixed while the corpus grows 10×).
  *
  * Usage: runMain graft.ScaleProof [outDir] [name ...]
  */
object ScaleProof {

  private val defaultNames = Seq(
    "d01_dedup_exact", "d02_word_jaccard", "d03_minhash_lsh", "d04_simhash",
    "d05_simhash_pairs", "d06_embed_neardup", "d07_incremental_dedup",
    "d08_dedup_keep_best", "d09_dup_clusters", "d10_ppjoin_allpairs",
    "s01_ann_bruteforce", "s02_ann_lsh", "s03_ann_ivf",
    "s04_embed_doc_search", "s05_kmeans_train",
    "p01_decontaminate", "p02_stratified_sample", "p03_pack_sequences",
    "p04_repetition_score", "p05_mixture_stats", "p06_mixture_sample",
    "p07_vocab_build", "s06_semantic_dedup", "t10_rank_score",
    "d12_bloom_incremental_dedup", "d13_winnowing", "d14_clone_pairs",
    "p08_bpe_train", "s07_ann_pq", "s08_ann_ivfpq", "s09_ann_sq",
    "d15_containment", "t11_bigram_coverage", "t12_max_run",
    "p09_bpe_encode", "p10_quality_funnel",
    "e03_sessionize", "e08_funnel", "e09_retention", "e10_locf_fill",
    "e11_transitions", "e12_gap_stats", "p11_mixture_temperature",
    "m02_decode_features", "m04_batch_embed")

  private def scaleDocs(docs: DataFrame, copies: Int): DataFrame = docs
    .select(col("*"), explode(sequence(lit(0), lit(copies - 1))).as("c"))
    .select(
      (col("doc_id") + col("c").cast("long") * 10000000L).as("doc_id"),
      when(col("c") === 0, col("text")).otherwise(array_join(
        transform(split(col("text"), " "),
          w => concat(lit("c"), col("c"), lit("_"), w)), " ")).as("text"),
      col("lang"), col("source"), col("n_chars"))

  /** Copy c's vectors are circularly shifted by c coordinates — an
    * orthogonal permutation, so every WITHIN-copy cosine is exactly the
    * sf0.1 value (each copy carries an identical duplicate-pair
    * structure) while CROSS-copy cosines scramble to noise. This is the
    * embedding analogue of the word-prefix trick: before round 8 copies
    * kept vectors verbatim, so cross-copy cos=1 pairs made the true
    * pair structure grow quadratically in the copy count and s06's
    * ratio measured that adversarial truth (3.6 single-probe, 9.5
    * multi-probe), not the operator's scaling. ANN probe sets still pin
    * vec_id < 10 (copy 0), so query count stays fixed. */
  private def scaleEmb(emb: DataFrame, copies: Int): DataFrame = emb
    .select(col("*"), explode(sequence(lit(0), lit(copies - 1))).as("c"))
    .select((col("vec_id") + col("c").cast("long") * 10000000L).as("vec_id"),
      when(col("c") === 0, col("embedding")).otherwise(concat(
        slice(col("embedding"), col("c") + 1, size(col("embedding")) - col("c")),
        slice(col("embedding"), lit(1), col("c")))).as("embedding"),
      col("label"))

  /** Copy c's events keep their timestamps but get disjoint user_id /
    * event_id ranges — each copy is an identical, independent user
    * population, so per-user session/funnel/transition structure is
    * exactly 10 × the sf0.1 structure (users never straddle copies;
    * windows partition by user_id). This extends the falsifier to the
    * temporal family, which rounds ≤ 7 never scale-tested. */
  private def scaleEvents(ev: DataFrame, copies: Int): DataFrame = ev
    .select(col("*"), explode(sequence(lit(0), lit(copies - 1))).as("c"))
    .select(
      (col("event_id") + col("c").cast("long") * 10000000L).as("event_id"),
      col("ts"),
      (col("user_id") + col("c").cast("long") * 10000000L).as("user_id"),
      col("event_type"), col("value"), col("props"))

  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("target/scale10")
    val names = if (args.length > 1) args.drop(1).toSeq else defaultNames
    val sf = "/root/testdata/sf0.1"
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))

    if (!new java.io.File(s"$outDir/documents.parquet").exists()) {
      scaleDocs(spark.read.parquet(s"$sf/documents.parquet"), 10)
        .repartition(32).write.mode("overwrite").parquet(s"$outDir/documents.parquet")
      scaleEmb(spark.read.parquet(s"$sf/embeddings.parquet"), 10)
        .repartition(32).write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
    }
    if (!new java.io.File(s"$outDir/events.parquet").exists()) {
      scaleEvents(spark.read.parquet(s"$sf/events.parquet"), 10)
        .repartition(32).write.mode("overwrite").parquet(s"$outDir/events.parquet")
    }

    def time(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      spark.catalog.clearCache()
      (System.nanoTime() - t0) / 1e9
    }

    // JIT/codegen warmup on the small dir
    time(names.head, sf)
    println(f"${"query"}%-24s ${"sf0.1"}%8s ${"10x"}%8s  ratio")
    names.foreach { n =>
      val t1 = math.min(time(n, sf), time(n, sf))
      val t10 = math.min(time(n, outDir), time(n, outDir))
      println(f"$n%-24s $t1%8.2f $t10%8.2f  ${t10 / t1}%5.1f")
    }
    spark.stop()
  }
}
