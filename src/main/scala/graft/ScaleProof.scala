package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Empirical scale check for the dedup/ANN/pipeline families (dev
  * tool): build a `copies`× corpus from sf0.1 and compare per-query
  * wall time against sf0.1 in the same JVM. A query whose cost grows
  * much faster than the row growth has a super-linear term that would
  * kill it at 100 TB — this is the cheapest falsifier for every "at
  * scale" claim in the operator scaladocs.
  *
  * The scaled corpus is `copies` copies of sf0.1 documents/embeddings
  * with disjoint id ranges; copies c>0 get every WORD prefixed with the
  * copy tag, so no shingle/trigram ever matches across copies and the
  * duplicate-pair structure is exactly copies × the sf0.1 structure
  * (verbatim replication would instead create C(copies,2) cross-copy
  * dup pairs per document — quadratic by construction, not a scale
  * test). Embedding copies get per-copy orthogonal transforms (see
  * [[scaleEmb]]), so ANN probe sets pin vec_id < 10 and query count
  * stays fixed while the corpus grows.
  *
  * Usage: runMain graft.ScaleProof [outDir] [--copies N] [name ...]
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
    "m02_decode_features", "m04_batch_embed",
    "d16_paragraph_dedup", "d17_paragraph_neardup", "s10_ann_filtered",
    "d18_boilerplate_strip", "s11_ann_persisted", "s12_ann_ivfpq_persisted",
    "s13_ann_filtered_probe", "s14_ann_persisted_append",
    "p12_pipeline_compose", "p13_pipeline_full",
    "t13_lexical_diversity", "p14_global_shuffle", "s15_index_compact",
    "s16_index_drift", "p15_token_budget", "t14_redact", "s17_ann_mmr",
    "d19_dup_spans", "p16_dsir_weights", "s18_index_delete",
    "e13_rate_anomaly", "s19_ivfpq_append", "p17_curriculum",
    "m05_image_decode", "p18_chunk_split", "d20_para_clusters",
    "s20_retrieval_pipeline",
    "t15_unigram_nll", "d21_entity_resolution", "q76_cms_topk",
    "s21_recall_eval", "e15_pattern_match", "p19_dataset_card",
    "s22_hybrid_search", "m06_audio_frames", "p20_multimodal_pack", "e16_incremental_agg",
    "d22_ngram_novelty", "t16_readability", "p22_loss_mask", "s23_range_search",
    "e17_sliding_hll_distinct", "p21_zorder_layout", "t17_char_entropy",
    "p23_epoch_interleave", "s24_index_stats",
    "t18_hashed_classifier", "p24_source_overlap", "q80_recursive_cte",
    "d23_incremental_minhash")

  /** Copy id-range stride. Copies only stay disjoint while every base
    * id is below it — asserted at corpus-build time, so a grown base
    * corpus fails loudly instead of silently colliding ids and
    * invalidating the ×copies-structure claim. */
  private val idOffset = 10000000L

  private def assertIdsBelowOffset(df: DataFrame, cols: Seq[String]): Unit =
    cols.foreach { c =>
      val mx = df.agg(max(col(c))).head.getLong(0)
      require(mx < idOffset,
        s"base corpus $c max $mx >= copy stride $idOffset — raise idOffset")
    }

  private[graft] def scaleDocs(docs: DataFrame, copies: Int): DataFrame = {
    assertIdsBelowOffset(docs, Seq("doc_id"))
    docs
      .select(col("*"), explode(sequence(lit(0), lit(copies - 1))).as("c"))
      .select(
        (col("doc_id") + col("c").cast("long") * idOffset).as("doc_id"),
        when(col("c") === 0, col("text")).otherwise(array_join(
          transform(split(col("text"), " "),
            w => concat(lit("c"), col("c"), lit("_"), w)), " ")).as("text"),
        col("lang"), col("source"), col("n_chars"))
  }

  /** Copy c's vectors get an ORTHOGONAL per-copy transform — circular
    * shift by c mod dim, with an alternating sign flip once shifts wrap
    * (copies ≥ dim) — so every WITHIN-copy cosine is exactly the sf0.1
    * value (each copy carries an identical duplicate-pair structure)
    * while CROSS-copy cosines scramble to noise. This is the embedding
    * analogue of the word-prefix trick: before round 8 copies kept
    * vectors verbatim, so cross-copy cos=1 pairs made the true pair
    * structure grow quadratically in the copy count and s06's ratio
    * measured that adversarial truth (3.6 single-probe, 9.5
    * multi-probe), not the operator's scaling. ANN probe sets still pin
    * vec_id < 10 (copy 0), so query count stays fixed. */
  private[graft] def scaleEmb(emb: DataFrame, copies: Int): DataFrame = {
    assertIdsBelowOffset(emb, Seq("vec_id"))
    // derive the shift modulus from the data: a hardcoded dim with a
    // smaller real embedding would build negative-length slices —
    // empty vectors, silently invalidating the scale corpus
    val dims = emb.select(size(col("embedding")).as("d")).distinct()
      .collect().map(_.getInt(0))
    require(dims.length == 1,
      s"mixed embedding dimensions ${dims.toSeq} — cannot build scale corpus")
    val dim = dims.head
    require(copies <= 2 * dim,
      s"per-copy orthogonal transforms are distinct only for <= ${2 * dim} copies")
    emb
      .select(col("*"), explode(sequence(lit(0), lit(copies - 1))).as("c"))
      .select((col("vec_id") + col("c").cast("long") * idOffset).as("vec_id"),
        when(col("c") === 0, col("embedding")).otherwise {
          val sh = (col("c") % dim).cast("int")
          val rot = concat(
            slice(col("embedding"), sh + lit(1), size(col("embedding")) - sh),
            slice(col("embedding"), lit(1), sh))
          // copies dim..2·dim−1 reuse shifts 0..dim−1: an alternating
          // sign flip (itself orthogonal) keeps those copies' cross-copy
          // cosines scrambled instead of verbatim-identical
          when(col("c") < dim, rot).otherwise(
            transform(rot, (x, i) => when(i % 2 === 0, x).otherwise(-x)))
        }.as("embedding"),
        col("label"))
  }

  /** Copy c's events keep their timestamps but get disjoint user_id /
    * event_id ranges — each copy is an identical, independent user
    * population, so per-user session/funnel/transition structure is
    * exactly copies × the sf0.1 structure (users never straddle copies;
    * windows partition by user_id). This extends the falsifier to the
    * temporal family, which rounds ≤ 7 never scale-tested. */
  private[graft] def scaleEvents(ev: DataFrame, copies: Int): DataFrame = {
    assertIdsBelowOffset(ev, Seq("event_id", "user_id"))
    ev
      .select(col("*"), explode(sequence(lit(0), lit(copies - 1))).as("c"))
      .select(
        (col("event_id") + col("c").cast("long") * idOffset).as("event_id"),
        col("ts"),
        (col("user_id") + col("c").cast("long") * idOffset).as("user_id"),
        col("event_type"), col("value"), col("props"))
  }

  /** Customer copies for the record-linkage family: disjoint key
    * ranges, and copy c>0 names carry the copy tag as a PREFIX — same
    * rationale as [[scaleDocs]]'s word prefixes: verbatim name
    * replication would make every cross-copy namesake a distance-0
    * link (quadratic in copies by construction); prefixed names land
    * in per-copy blocks, so the true link structure is exactly
    * copies × the sf0.1 structure. */
  private def scaleCustomer(cust: DataFrame, copies: Int): DataFrame = {
    assertIdsBelowOffset(cust, Seq("c_custkey"))
    cust
      .select(col("*"), explode(sequence(lit(0), lit(copies - 1))).as("c"))
      .select(
        (col("c_custkey") + col("c").cast("long") * idOffset).as("c_custkey"),
        when(col("c") === 0, col("c_name"))
          .otherwise(concat(lit("c"), col("c"), lit("_"), col("c_name")))
          .as("c_name"),
        col("c_nationkey"), col("c_acctbal"), col("c_mktsegment"))
  }

  /** Lineitem copies for the layout family (p21): l_orderkey gets
    * disjoint per-copy ranges (fact keys grow with the table) while
    * l_partkey is kept VERBATIM (dimension keys are bounded however
    * large the fact table gets) — so the scaled table is exactly what
    * a growing fact table looks like to a z-order audit: a wider
    * orderkey axis over the same partkey axis, bucket count growing
    * linearly in copies, per-bucket envelopes unchanged. Only the two
    * layout columns are carried; p21 reads nothing else. */
  private def scaleLineitem(li: DataFrame, copies: Int): DataFrame = {
    assertIdsBelowOffset(li, Seq("l_orderkey"))
    li.select(col("l_orderkey"), col("l_partkey"),
        explode(sequence(lit(0), lit(copies - 1))).as("c"))
      .select(
        (col("l_orderkey") + col("c").cast("long") * idOffset).as("l_orderkey"),
        col("l_partkey"))
  }

  def main(args: Array[String]): Unit = {
    val copies = args.sliding(2).collectFirst {
      case Array("--copies", n) => n.toInt }.getOrElse(10)
    val rest = {
      val i = args.indexOf("--copies")
      if (i < 0) args.toSeq else args.toSeq.patch(i, Nil, 2)
    }
    val outDir = rest.headOption.getOrElse(s"target/scale$copies")
    val names = if (rest.length > 1) rest.drop(1) else defaultNames
    val sf = "/root/testdata/sf0.1"
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))

    // build only the tables the selected queries read (a 100× docs
    // table is GBs — skip it for an embeddings-only spot run)
    // every s-family entry is embeddings-only except the three that
    // join documents (s04's text fetch, s10/s13's metadata predicate)
    val docsReadingAnn = Set(
      "s04_embed_doc_search", "s10_ann_filtered", "s13_ann_filtered_probe")
    val needsDocs = names.exists(n => !n.startsWith("s") || docsReadingAnn(n))
    val needsEvents = names.exists(_.startsWith("e"))
    val needsCustomer = names.contains("d21_entity_resolution")
    if (!new java.io.File(s"$outDir/embeddings.parquet").exists())
      scaleEmb(spark.read.parquet(s"$sf/embeddings.parquet"), copies)
        .repartition(32).write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
    if (needsDocs && !new java.io.File(s"$outDir/documents.parquet").exists())
      scaleDocs(spark.read.parquet(s"$sf/documents.parquet"), copies)
        .repartition(32).write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    if (needsEvents && !new java.io.File(s"$outDir/events.parquet").exists())
      scaleEvents(spark.read.parquet(s"$sf/events.parquet"), copies)
        .repartition(32).write.mode("overwrite").parquet(s"$outDir/events.parquet")
    if (needsCustomer && !new java.io.File(s"$outDir/customer.parquet").exists())
      scaleCustomer(spark.read.parquet(s"$sf/customer.parquet"), copies)
        .repartition(32).write.mode("overwrite").parquet(s"$outDir/customer.parquet")
    val needsLineitem = names.contains("p21_zorder_layout")
    if (needsLineitem && !new java.io.File(s"$outDir/lineitem.parquet").exists())
      scaleLineitem(spark.read.parquet(s"$sf/lineitem.parquet"), copies)
        .repartition(32).write.mode("overwrite").parquet(s"$outDir/lineitem.parquet")

    def time(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      spark.catalog.clearCache()
      (System.nanoTime() - t0) / 1e9
    }

    println(f"${"query"}%-24s ${"sf0.1"}%8s ${copies + "x"}%8s  ratio")
    names.foreach { n =>
      // same-query warm-up before the 1× measurement: without it the 1×
      // run pays this query's codegen/JIT and the ratio reads below 1
      time(n, sf)
      val t1 = math.min(time(n, sf), time(n, sf))
      val tN = math.min(time(n, outDir), time(n, outDir))
      println(f"$n%-24s $t1%8.2f $tN%8.2f  ${tN / t1}%5.1f")
    }
    spark.stop()
  }
}
