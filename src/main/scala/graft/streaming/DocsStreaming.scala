package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming document-ingest surface — the unbounded twin of the batch
  * dedup family (SURVEY.md §2.9 extension surface).
  *
  * [[novel]] is d07/d12's semantics as a continuous pipeline: every
  * arriving document is emitted iff its content digest has never been
  * seen, with the seen-set living in the streaming state store instead
  * of a static "seen" relation. dropDuplicates keys state by the
  * 32-byte digest — one state row per DISTINCT document ever ingested,
  * independent of arrival volume, sharded across executors by digest
  * hash. At 100 TB ingest the state store is the RocksDB backend and a
  * watermark on an ingest-time column bounds it to the dedup horizon
  * (dropDuplicatesWithinWatermark); the bounded-input twin here keeps
  * NoTimeout state so the spec can gate exact batch equivalence
  * (StreamingSpec: phase-2 emissions = exactly the batch-novel digests
  * of d07's oracle, one representative each, none re-emitted). */
object DocsStreaming {

  /** First-arrival winner per content digest over an unbounded
    * document stream. */
  def novel(docs: DataFrame): DataFrame =
    docs
      .withColumn("digest", sha2(col("text"), 256))
      .dropDuplicates("digest")
      .select(col("doc_id"), col("digest"))

  /** Streaming upsert into a versioned lakehouse table — the CDC-sink
    * shape (l04's MERGE driven by an unbounded source): each
    * micro-batch copy-on-write-merges into the table via
    * [[graft.sources.GraftMerge.mergeInto]], so every micro-batch
    * becomes one snapshot commit — the ingest history is
    * time-travelable for free (`VERSION AS OF` any micro-batch
    * boundary), untouched files are reused by reference, and a reader
    * mid-stream sees a consistent snapshot, never a torn batch.
    * Micro-batches are sequential by Structured Streaming's contract,
    * so the read-modify-write merge never hits its concurrent-commit
    * conflict path (a SECOND writer outside the stream would —
    * loudly, failing the batch and the query rather than losing
    * rows). At 100 TB each commit costs O(touched files + batch), and
    * retention (l03's expire) bounds the snapshot history the stream
    * accumulates. MergeSpec gates batch-sequential semantics and the
    * per-batch snapshot trail. */
  def mergeStream(dir: String, keyCol: String, updates: DataFrame)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    updates.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty)
          graft.sources.GraftMerge.mergeInto(
            batch.sparkSession, dir, batch, keyCol)
        ()
      }
}
