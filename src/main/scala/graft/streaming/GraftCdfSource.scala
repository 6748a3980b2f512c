package graft.streaming

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.GraftVersions

/** Change-data-feed over a graft versioned table as a FIRST-CLASS DSv2
  * streaming source (the r12 cdfStream promoted from a
  * readStream.text-over-manifests composition):
  *
  * {{{
  *   spark.readStream.format("graft.streaming.GraftCdfProvider")
  *     .option("path", tableDir)
  *     .option("maxVersionsPerTrigger", "1")   // rate limit
  *     .option("startingVersion", "0")         // replay point
  *     .load()
  * }}}
  *
  * OFFSETS ARE SNAPSHOT VERSIONS: micro-batch (start, end] carries
  * exactly the rows of the files ADDED by versions start+1..end
  * (manifest set-difference against each predecessor — the added-set
  * rule the batch snapshot diff uses, which StreamingSpec equates; a
  * RESTORE's re-added files flow through like any other add, which
  * the filename-prefix rule this replaced silently dropped).
  * Offsets checkpoint like any DSv2 source, so
  * a restarted query resumes MID-LEDGER from its stored version —
  * no manifest replay bookkeeping in user code. Tombstoned (expired)
  * and metadata-only snapshots contribute empty deltas; versions still
  * advance, so retention never stalls the stream.
  *
  * Scale shape: per micro-batch the driver reads O(changed-file NAMES)
  * of manifest lines and plans one partition per added file; executors
  * read only those files. A 100 TB table streams at the cost of its
  * commit rate, never a rescan, and `maxVersionsPerTrigger` bounds a
  * catch-up burst (a restart 10 000 commits behind drains in paced
  * batches instead of one giant one).
  *
  * The per-file reader decodes parquet through the parquet-mr Group
  * API (executors have no SparkSession to lean on): flat atomic
  * columns + arrays of atomics — the shapes versioned tables here
  * carry. An unsupported column type fails LOUDLY at stream start,
  * never silently misreads. Each output row is the data row plus a
  * trailing `_cdf_version INT`. */
class GraftCdfProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftCdfSource.fullSchema(options.get("path"),
      Option(options.get("includeRemoved")).exists(_.toBoolean))
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GraftCdfTable(schema, properties.get("path"))
  override def supportsExternalMetadata(): Boolean = true
}

private[graft] object GraftCdfSource {
  val versionCol = "_cdf_version"
  val changeCol = "_change_type"

  /** Snapshot data schema (authoritative record if the table evolved,
    * else one data-file footer) + the trailing version column — plus a
    * `_change_type` column (`insert`/`delete`) when the removed-rows
    * channel is on. */
  def fullSchema(dir: String, includeRemoved: Boolean): StructType = {
    require(dir != null, "graft-cdf requires .option(\"path\", <tableDir>)")
    val cur = GraftVersions.current(dir)
    require(cur >= 1, s"graft-cdf: $dir has no committed snapshot")
    val data = GraftVersions.schemaAt(dir, cur).getOrElse {
      val files = GraftVersions.manifest(dir, cur)
      require(files.nonEmpty, s"graft-cdf: $dir snapshot $cur lists no files")
      org.apache.spark.sql.SparkSession.active.read.parquet(files.head).schema
    }
    data.fields.foreach(f => checkSupported(f.dataType, f.name))
    val meta = StructField(versionCol, IntegerType, nullable = false) +:
      (if (includeRemoved)
        Seq(StructField(changeCol, StringType, nullable = false))
      else Seq.empty)
    StructType(data.fields ++ meta)
  }

  private def checkSupported(dt: DataType, name: String): Unit = dt match {
    case IntegerType | LongType | DoubleType | FloatType | BooleanType |
         StringType | BinaryType => ()
    case ArrayType(et, _) => checkSupported(et, s"$name.element")
    case other => throw new UnsupportedOperationException(
      s"graft-cdf: column $name has unsupported type $other " +
        "(flat atomics and arrays of atomics only)")
  }

  /** Files ADDED by version `v`: manifest set-difference against the
    * predecessor — the SAME rule the batch snapshot diff and
    * [[removedFiles]] use, NOT the `v<N>-` filename-prefix heuristic
    * (ADVICE r13): a rollback/RESTORE publishes restored files under
    * their ORIGINAL prefixes, so the prefix rule emitted their removal
    * (set-diff) but never their re-addition, and every downstream
    * incremental consumer silently diverged from the table.
    * LAYOUT-ONLY versions (compaction/re-clustering, `#layout` header)
    * contribute NOTHING: their row set equals the predecessor's, and
    * without the skip a 100 TB compaction would replay the whole table
    * into every incremental consumer. */
  def addedFiles(dir: String, v: Int): Seq[String] =
    if (!GraftVersions.isLive(dir, v) ||
      GraftVersions.isLayoutOnly(dir, v)) Seq.empty
    else {
      val prev = GraftVersions.manifest(dir, v - 1)
        .map(p => p.substring(p.lastIndexOf('/') + 1)).toSet
      GraftVersions.manifest(dir, v).filterNot { p =>
        prev.contains(p.substring(p.lastIndexOf('/') + 1))
      }
    }

  /** Files REMOVED by version `v`: the predecessor manifest's files the
    * new manifest no longer lists. File granularity, like the batch
    * snapshot diff: a copy-on-write rewrite reports its surviving rows
    * as removed-then-re-added (exactly what the files say). Removed
    * files stay readable on disk until retention expires them — a
    * consumer more than one retention window behind has lost its delta
    * feed by contract. */
  def removedFiles(dir: String, v: Int): Seq[String] = {
    // a TOMBSTONED (expired) version reads as an empty manifest —
    // retention is not a data change, so it must not read as a
    // whole-table delete (its adds are equally gone; the documented
    // fell-behind-retention contract)
    if (!GraftVersions.isLive(dir, v)) return Seq.empty
    // layout-only versions replace files without changing rows — no
    // delete delta, matching addedFiles' skip
    if (GraftVersions.isLayoutOnly(dir, v)) return Seq.empty
    val now = GraftVersions.manifest(dir, v)
      .map(p => p.substring(p.lastIndexOf('/') + 1)).toSet
    GraftVersions.manifest(dir, v - 1).filterNot { p =>
      now.contains(p.substring(p.lastIndexOf('/') + 1))
    }
  }
}

private class GraftCdfTable(tschema: StructType, path: String)
  extends Table with SupportsRead {
  override def name(): String = s"graft-cdf `$path`"
  override def schema(): StructType = tschema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan {
      override def readSchema(): StructType = tschema
      override def toMicroBatchStream(checkpointLocation: String)
          : MicroBatchStream = {
        val byVersion = Option(options.get("startingVersion")).map(_.toInt)
        // epoch MICROS, the `TIMESTAMP AS OF` ledger's unit: replay
        // begins at the first version committed AFTER the instant
        val byTime = Option(options.get("startingTimestampMicros"))
          .map(t => GraftVersions.versionAt(path, t.toLong).getOrElse(0))
        require(byVersion.isEmpty || byTime.isEmpty,
          "graft-cdf: startingVersion and startingTimestampMicros are " +
            "mutually exclusive")
        new GraftCdfStream(path, tschema,
          Option(options.get("maxVersionsPerTrigger")).map(_.toInt),
          byVersion.orElse(byTime).getOrElse(0),
          Option(options.get("includeRemoved")).exists(_.toBoolean))
      }
    }
}

private case class GraftCdfOffset(version: Int) extends Offset {
  override def json(): String = s"""{"version":$version}"""
}

private case class GraftCdfPartition(version: Int, file: String,
    change: String) extends InputPartition

private class GraftCdfStream(dir: String, schema: StructType,
    maxVersionsPerTrigger: Option[Int], startingVersion: Int,
    includeRemoved: Boolean)
  extends MicroBatchStream with SupportsAdmissionControl {

  override def initialOffset(): Offset = GraftCdfOffset(startingVersion)

  override def deserializeOffset(json: String): Offset =
    GraftCdfOffset("\"version\"\\s*:\\s*(\\d+)".r
      .findFirstMatchIn(json)
      .getOrElse(throw new IllegalArgumentException(s"bad CDF offset: $json"))
      .group(1).toInt)

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  /** Admission control: advance at most `maxVersionsPerTrigger`
    * snapshots per micro-batch (catch-up pacing); unbounded otherwise. */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[GraftCdfOffset].version
    val cur = GraftVersions.current(dir)
    GraftCdfOffset(maxVersionsPerTrigger match {
      case Some(k) => math.min(cur, s + k)
      case None => cur
    })
  }

  override def reportLatestOffset(): Offset =
    GraftCdfOffset(GraftVersions.current(dir))

  override def latestOffset(): Offset = throw new UnsupportedOperationException(
    "latestOffset(Offset, ReadLimit) is the admission-controlled entry")

  override def planInputPartitions(start: Offset, end: Offset)
      : Array[InputPartition] = {
    val s = start.asInstanceOf[GraftCdfOffset].version
    val e = end.asInstanceOf[GraftCdfOffset].version
    ((s + 1) to e).flatMap { v =>
      GraftCdfSource.addedFiles(dir, v)
        .map(f => GraftCdfPartition(v, f, "insert")) ++
        (if (includeRemoved)
          GraftCdfSource.removedFiles(dir, v)
            .map(f => GraftCdfPartition(v, f, "delete"))
        else Seq.empty)
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftCdfReaderFactory(schema, includeRemoved)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** Executor-side parquet decode through the parquet-mr Group API (no
  * SparkSession exists on an executor): columns resolve BY NAME against
  * the stream schema, so pre-evolution files read evolved columns back
  * as null — the same semantics the batch reader has. */
private class GraftCdfReaderFactory(schema: StructType,
    includeRemoved: Boolean) extends PartitionReaderFactory {

  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[GraftCdfPartition]
    val metaCols = if (includeRemoved) 2 else 1 // _cdf_version[, _change_type]
    val dataFields = schema.fields.dropRight(metaCols)
    new PartitionReader[InternalRow] {
      private val reader = org.apache.parquet.hadoop.ParquetReader
        .builder(new org.apache.parquet.hadoop.example.GroupReadSupport(),
          new org.apache.hadoop.fs.Path(p.file))
        .build()
      private var cur: org.apache.parquet.example.data.Group = _

      override def next(): Boolean = { cur = reader.read(); cur != null }

      override def get(): InternalRow = {
        val values = new Array[Any](dataFields.length + metaCols)
        var i = 0
        while (i < dataFields.length) {
          values(i) = convert(cur, dataFields(i).name, dataFields(i).dataType)
          i += 1
        }
        values(dataFields.length) = p.version
        if (includeRemoved)
          values(dataFields.length + 1) = UTF8String.fromString(p.change)
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(values)
      }

      override def close(): Unit = reader.close()
    }
  }

  private def convert(g: org.apache.parquet.example.data.Group,
      field: String, dt: DataType): Any = {
    val gt = g.getType
    if (!gt.containsField(field)) return null // pre-evolution file
    val i = gt.getFieldIndex(field)
    if (g.getFieldRepetitionCount(i) == 0) return null
    dt match {
      case IntegerType => g.getInteger(i, 0)
      case LongType => g.getLong(i, 0)
      case DoubleType => g.getDouble(i, 0)
      case FloatType => g.getFloat(i, 0)
      case BooleanType => g.getBoolean(i, 0)
      case StringType => UTF8String.fromBytes(g.getBinary(i, 0).getBytes)
      case BinaryType => g.getBinary(i, 0).getBytes
      case ArrayType(et, _) =>
        // standard 3-level LIST: group f { repeated group list { element } }
        val lst = g.getGroup(i, 0)
        val n = lst.getFieldRepetitionCount(0)
        new GenericArrayData((0 until n).map { j =>
          val entry = lst.getGroup(0, j)
          if (entry.getFieldRepetitionCount(0) == 0) null
          else et match {
            case IntegerType => entry.getInteger(0, 0)
            case LongType => entry.getLong(0, 0)
            case DoubleType => entry.getDouble(0, 0)
            case FloatType => entry.getFloat(0, 0)
            case BooleanType => entry.getBoolean(0, 0)
            case StringType =>
              UTF8String.fromBytes(entry.getBinary(0, 0).getBytes)
            case other => throw new UnsupportedOperationException(
              s"graft-cdf: array element type $other")
          }
        }.toArray)
      case other => throw new UnsupportedOperationException(
        s"graft-cdf: column $field has unsupported type $other")
    }
  }
}
