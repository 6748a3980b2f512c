package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

/** m04 batched-inference plumbing gates: the batch shape must be what
  * an accelerator actually sees (full batches except at most one short
  * tail per partition), every row must survive batching exactly once,
  * and results must be independent of batch composition — the property
  * that lets a deploy retune batch size or fleet parallelism without
  * changing outputs. */
class MultimodalBatchSpec extends SparkSpec {

  private lazy val out = Multimodal.batchEmbedRaw(spark, sf2)

  test("every document survives batching exactly once") {
    val n = spark.read.parquet(s"$sf2/documents.parquet").count()
    assert(out.count() == n)
    assert(out.select(col("doc_id")).distinct().count() == n)
  }

  test("batches are full except short tails, and sizes are self-consistent") {
    // a batch's advertised size must equal the number of rows carrying
    // it: rows grouped by (bidx, bsize) aggregate same-shaped batches
    // across partitions, so the row count must be a multiple of bsize
    val offenders = out.groupBy(col("bidx"), col("bsize"))
      .agg(count(lit(1)).as("rows"))
      .collect()
      .filter(r => r.getLong(2) % r.getInt(1) != 0)
    assert(offenders.isEmpty,
      s"batch size vs carried rows mismatch: ${offenders.take(5).mkString(", ")}")
    // never oversized, and short batches only where a partition ran out
    assert(out.filter(col("bsize") > Multimodal.embedBatchSize).count() == 0)
    val shortBatches = out.filter(col("bsize") < Multimodal.embedBatchSize)
      .select(col("bidx"), col("bsize")).distinct().count()
    assert(shortBatches <= 8, s"$shortBatches short batches for 8 partitions")
  }

  test("embeddings are a pure function of the payload, not the batch") {
    import spark.implicits._
    val a = out.select(col("doc_id"), col("emb")).as[(Long, Seq[Float])]
      .collect().toMap
    // re-running the whole raw pipeline must reproduce embeddings bit-for-bit
    val recomputed = Multimodal.batchEmbedRaw(spark, sf2)
      .select(col("doc_id"), col("emb")).as[(Long, Seq[Float])]
      .collect().toMap
    assert(a == recomputed)
    assert(a.values.forall(v => v.size == 8 && v.forall(x => x >= 0f && x < 1f)))
  }

  test("WAV synthesizer and parser round-trip any payload, including RIFF edge shapes") {
    val cases = Seq(
      Array.empty[Byte],                       // empty data chunk
      Array[Byte](0x41),                       // odd length -> pad byte
      Array[Byte](0, 127, -128, -1),           // full unsigned range
      ("word " * 50).trim.getBytes("UTF-8"))   // text-like payload
    for (samples <- cases; rate <- Seq(8000, 12000, 16000)) {
      val wav = Multimodal.wavBytes(rate, samples)
      // word alignment: every RIFF file is an even number of bytes
      assert(wav.length % 2 == 0, s"odd WAV length ${wav.length}")
      val (r, ch, bits, data) = Multimodal.parseWav(wav)
      assert(r == rate && ch == 1 && bits == 8)
      assert(data.toSeq == samples.toSeq,
        s"data round-trip lost bytes at rate $rate, n=${samples.length}")
    }
    // a parser that trusts offsets instead of walking chunks would
    // misread this: an unknown chunk inserted before fmt/data
    val base = Multimodal.wavBytes(8000, Array[Byte](1, 2, 3, 4))
    val junk = "LIST".getBytes("US-ASCII") ++
      Array[Byte](6, 0, 0, 0) ++ Array[Byte](9, 9, 9, 9, 9, 9)
    val shifted = base.take(12) ++ junk ++ base.drop(12)
    val (r2, _, _, d2) = Multimodal.parseWav(shifted)
    assert(r2 == 8000 && d2.toSeq == Seq[Byte](1, 2, 3, 4))
    // malformed input fails loudly
    intercept[IllegalArgumentException] {
      Multimodal.parseWav("not a wav at all".getBytes("UTF-8"))
    }
  }

  test("BMP synthesizer and parser round-trip every stride-padding shape") {
    // widths 8..16 sweep stride padding 0..3; h=3 makes bottom-up
    // storage load-bearing (a top-down reader returns reversed rows)
    for (w <- 8 to 16; h <- Seq(0, 1, 3)) {
      val px = Array.tabulate(3 * w * h)(i => ((i * 7) % 251).toByte)
      val bmp = Multimodal.bmpBytes(w, h, px)
      val stride = (3 * w + 3) / 4 * 4
      assert(bmp.length == 54 + stride * h, s"w=$w h=$h file size")
      val (rw, rh, rpx) = Multimodal.parseBmp(bmp)
      assert(rw == w && rh == h)
      assert(rpx.toSeq == px.toSeq,
        s"pixel round-trip mangled at w=$w h=$h (stride pad ${stride - 3 * w})")
    }
    // malformed input fails loudly
    intercept[IllegalArgumentException] {
      Multimodal.parseBmp("not a bitmap".getBytes("UTF-8"))
    }
  }

  test("m02 decode matches an independent per-document recompute") {
    val docs = spark.read.parquet(s"$sf2/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = SparkEntry.queries("m02_decode_features")(spark, sf2).collect()
    assert(got.length == docs.size, "decode lost or invented documents")
    got.foreach { r =>
      val id = r.getLong(0)
      val bytes = docs(id).getBytes("UTF-8")
      assert(r.getInt(1) == 8000 + (id % 3).toInt * 4000, s"doc $id rate")
      assert(r.getInt(2) == 1 && r.getInt(3) == 8, s"doc $id fmt fields")
      assert(r.getLong(4) == bytes.length.toLong, s"doc $id sample count")
      val mx = if (bytes.isEmpty) 0 else bytes.map(_ & 0xFF).max
      assert(r.getInt(7) == mx, s"doc $id max sample")
    }
  }

  test("m06 frames tile each payload exactly and recompute per-document") {
    val docs = spark.read.parquet(s"$sf2/documents.parquet")
      .filter(col("doc_id") < 50)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).getBytes("UTF-8")).toMap
    val got = SparkEntry.queries("m06_audio_frames")(spark, sf2).collect()
      .groupBy(_.getLong(0))
    docs.foreach { case (id, bytes) =>
      val frames = got.getOrElse(id, Array.empty).sortBy(_.getInt(1))
      val expFrames = (bytes.length + 159) / 160
      assert(frames.length == expFrames, s"doc $id frame count")
      // frames tile the payload: dense indexes, full interiors, exact tail
      assert(frames.map(_.getInt(1)).toSeq == (0 until expFrames),
        s"doc $id frame indexes not dense")
      assert(frames.map(_.getLong(2)).sum == bytes.length.toLong,
        s"doc $id frame lengths don't tile the payload")
      frames.foreach { f =>
        val from = f.getInt(1) * 160
        val slice = bytes.slice(from, math.min(from + 160, bytes.length))
          .map(b => (b & 0xFF) - 128)
        assert(f.getLong(3) == slice.map(v => v.toLong * v).sum,
          s"doc $id frame ${f.getInt(1)} energy")
        assert(f.getInt(4) == (if (slice.isEmpty) 0 else slice.map(math.abs).max),
          s"doc $id frame ${f.getInt(1)} peak")
      }
    }
  }

  test("driver entry digests the raw embeddings and carries only scalars") {
    import spark.implicits._
    val entry = SparkEntry.queries("m04_batch_embed")(spark, sf2)
    // no array/struct/map columns may reach the driver harness
    assert(entry.schema.fields.forall(f =>
      f.dataType.typeName match {
        case "array" | "map" | "struct" => false
        case _ => true
      }), s"non-scalar column in m04 entry schema: ${entry.schema.treeString}")
    // the digest must pin the raw vectors: recompute it from the raw path
    val expected = out
      .select(col("doc_id"), sha2(to_json(col("emb")), 256).as("d"))
      .as[(Long, String)].collect().toMap
    val got = entry.select(col("doc_id"), col("emb_digest"))
      .as[(Long, String)].collect().toMap
    assert(got == expected)
  }
}
