package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

/** Minimal BSON document model + codec — the wire format under the
  * `mongodb` federation role (reference: ansible/roles/trino/templates/
  * values.yml.j2:59-62 configures Trino's mongodb connector; the wire
  * the connector speaks is OP_MSG framing around BSON documents).
  *
  * Only the element types the corpus and the command surface need are
  * implemented, and anything else fails LOUDLY on both encode and
  * decode — a silent skip would surface as a wrong query result:
  *
  *   0x01 double · 0x02 string · 0x03 document · 0x04 array ·
  *   0x08 bool · 0x09 UTC datetime (int64 millis) · 0x0A null ·
  *   0x10 int32 · 0x12 int64
  *
  * Scala-side value model (what [[BDoc]] fields hold): `null`,
  * `Boolean`, `Int`, `Long`, `Double`, `String`, [[BDoc]],
  * `Seq[Any]` (array), [[BsonDate]]. BSON datetimes are MILLISECOND
  * precision — a wrapper type, not a raw Long, so an epoch-micros
  * column can never be silently written as a datetime (the events
  * corpus carries microsecond timestamps; its collection stores
  * int64 epoch-micros and declares `timestamp(6)` in `_schema`). */
final case class BsonDate(millis: Long)

/** An ordered BSON document. Field order is part of the wire format
  * (and of command semantics — the first key names the command). */
final case class BDoc(fields: Vector[(String, Any)]) {
  def get(key: String): Option[Any] = fields.find(_._1 == key).map(_._2)
  def has(key: String): Boolean = fields.exists(_._1 == key)
  def firstKey: String = fields.head._1

  def getString(key: String): Option[String] =
    get(key).collect { case s: String => s }
  /** Int-ish accessor: BSON ints arrive as Int or Long per encoder. */
  def getNum(key: String): Option[Long] = get(key).collect {
    case i: Int => i.toLong
    case l: Long => l
    case d: Double => d.toLong
  }
  def getDoc(key: String): Option[BDoc] =
    get(key).collect { case d: BDoc => d }

  /** Compact JSON-ish rendering (spec observability / diagnostics). */
  def render: String = BDoc.renderValue(this)
}

object BDoc {
  def apply(fields: (String, Any)*): BDoc = BDoc(fields.toVector)

  private[sources] def renderValue(v: Any): String = v match {
    case null => "null"
    case d: BDoc => d.fields
      .map { case (k, fv) => "\"" + k + "\":" + renderValue(fv) }
      .mkString("{", ",", "}")
    case s: Seq[_] => s.map(renderValue).mkString("[", ",", "]")
    case s: String => "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    case BsonDate(ms) => s"""{"$$date":$ms}"""
    case other => other.toString
  }
}

private[graft] object GraftBson {

  // ---------------------------------------------------------------- //
  //  encode                                                           //
  // ---------------------------------------------------------------- //

  def encode(doc: BDoc): Array[Byte] = {
    val out = new ByteArrayOutputStream(256)
    writeDoc(out, doc)
    out.toByteArray
  }

  private def writeDoc(out: ByteArrayOutputStream, doc: BDoc): Unit = {
    val body = new ByteArrayOutputStream(256)
    doc.fields.foreach { case (name, v) => writeElement(body, name, v) }
    body.write(0x00)
    writeInt32(out, body.size() + 4)
    body.writeTo(out)
  }

  private def writeElement(out: ByteArrayOutputStream, name: String,
      v: Any): Unit = {
    def tagged(tag: Int): Unit = {
      out.write(tag)
      val nb = name.getBytes(StandardCharsets.UTF_8)
      out.write(nb, 0, nb.length)
      out.write(0x00)
    }
    v match {
      case d: Double => tagged(0x01); writeInt64(out, java.lang.Double.doubleToLongBits(d))
      case s: String =>
        tagged(0x02)
        val sb = s.getBytes(StandardCharsets.UTF_8)
        writeInt32(out, sb.length + 1)
        out.write(sb, 0, sb.length)
        out.write(0x00)
      case d: BDoc => tagged(0x03); writeDoc(out, d)
      case arr: Seq[_] =>
        tagged(0x04)
        writeDoc(out, BDoc(arr.toVector.zipWithIndex
          .map { case (e, i) => i.toString -> e }))
      case b: Boolean => tagged(0x08); out.write(if (b) 1 else 0)
      case BsonDate(ms) => tagged(0x09); writeInt64(out, ms)
      case null => tagged(0x0A)
      case i: Int => tagged(0x10); writeInt32(out, i)
      case l: Long => tagged(0x12); writeInt64(out, l)
      case other => throw new IllegalArgumentException(
        s"bson: unencodable value $other (${other.getClass.getName}) at $name")
    }
  }

  private def writeInt32(out: ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xFF); out.write((v >>> 8) & 0xFF)
    out.write((v >>> 16) & 0xFF); out.write((v >>> 24) & 0xFF)
  }

  private def writeInt64(out: ByteArrayOutputStream, v: Long): Unit = {
    writeInt32(out, v.toInt); writeInt32(out, (v >>> 32).toInt)
  }

  // ---------------------------------------------------------------- //
  //  decode                                                           //
  // ---------------------------------------------------------------- //

  def decode(bytes: Array[Byte], offset: Int = 0): BDoc = {
    val buf = ByteBuffer.wrap(bytes, offset, bytes.length - offset)
      .order(ByteOrder.LITTLE_ENDIAN)
    readDoc(buf)
  }

  private def readDoc(buf: ByteBuffer): BDoc = {
    val start = buf.position()
    val len = buf.getInt
    val fields = Vector.newBuilder[(String, Any)]
    while (buf.position() < start + len - 1) {
      val tag = buf.get() & 0xFF
      val name = readCString(buf)
      val value: Any = tag match {
        case 0x01 => java.lang.Double.longBitsToDouble(buf.getLong)
        case 0x02 =>
          val n = buf.getInt
          val sb = new Array[Byte](n - 1)
          buf.get(sb); buf.get() // trailing NUL
          new String(sb, StandardCharsets.UTF_8)
        case 0x03 => readDoc(buf)
        case 0x04 => readDoc(buf).fields.map(_._2)
        case 0x08 => buf.get() != 0
        case 0x09 => BsonDate(buf.getLong)
        case 0x0A => null
        case 0x10 => buf.getInt
        case 0x12 => buf.getLong
        case other => throw new IllegalArgumentException(
          f"bson: unsupported element type 0x$other%02x at $name")
      }
      fields += name -> value
    }
    val end = buf.get() // document terminator
    require(end == 0, "bson: missing document terminator")
    require(buf.position() == start + len, "bson: document length mismatch")
    BDoc(fields.result())
  }

  private def readCString(buf: ByteBuffer): String = {
    val sb = new ByteArrayOutputStream(16)
    var b = buf.get()
    while (b != 0) { sb.write(b); b = buf.get() }
    new String(sb.toByteArray, StandardCharsets.UTF_8)
  }
}
