package graft.streaming

import java.io.{BufferedInputStream, BufferedOutputStream, ByteArrayOutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** MongoDB output (SURVEY.md §2.2; reference output/mongodb.rs:46-130:
  * insert documents into a collection). Like the other from-scratch
  * clients, this speaks the wire protocol directly — OP_MSG (opcode 2013)
  * carrying an `insert` command with a BSON codec for the flat document
  * shapes a batch row maps to (double/string/bool/int32/int64/null).
  * Executor-side: one connection per partition, `batch_size` documents
  * per insert command. At-least-once on replay, like the reference's
  * plain inserts (pair with a unique index on a key column for
  * dedupe-on-replay).
  */
object Mongo {

  // ---- minimal BSON ----

  private def cstring(s: String): Array[Byte] =
    s.getBytes(StandardCharsets.UTF_8) :+ 0.toByte

  private def int32(n: Int): Array[Byte] =
    ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(n).array()

  private def int64(n: Long): Array[Byte] =
    ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putLong(n).array()

  /** Encode (name, value) pairs as a BSON document. Values: Double,
    * String, Boolean, Int, Long, null, Seq[(String, Any)] (subdocument),
    * Seq[Any] (array). */
  def encodeDoc(fields: Seq[(String, Any)]): Array[Byte] = {
    val body = new ByteArrayOutputStream()
    fields.foreach { case (name, value) =>
      value match {
        case d: Double =>
          body.write(0x01); body.write(cstring(name))
          body.write(ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putDouble(d).array())
        case s: String =>
          val b = s.getBytes(StandardCharsets.UTF_8)
          body.write(0x02); body.write(cstring(name))
          body.write(int32(b.length + 1)); body.write(b); body.write(0)
        case b: Boolean =>
          body.write(0x08); body.write(cstring(name)); body.write(if (b) 1 else 0)
        case i: Int =>
          body.write(0x10); body.write(cstring(name)); body.write(int32(i))
        case l: Long =>
          body.write(0x12); body.write(cstring(name)); body.write(int64(l))
        case null =>
          body.write(0x0a); body.write(cstring(name))
        case sub: Seq[_] if sub.forall(_.isInstanceOf[(_, _)]) && sub.nonEmpty =>
          body.write(0x03); body.write(cstring(name))
          body.write(encodeDoc(sub.asInstanceOf[Seq[(String, Any)]]))
        case arr: Seq[_] =>
          body.write(0x04); body.write(cstring(name))
          body.write(encodeDoc(arr.zipWithIndex.map { case (v, i) => (i.toString, v) }))
        case other => throw new IllegalArgumentException(
          s"mongo: unsupported BSON value $other (${other.getClass})")
      }
    }
    val payload = body.toByteArray
    int32(payload.length + 5) ++ payload :+ 0.toByte
  }

  /** Decode a BSON document to (name, value) pairs (the reply side —
    * enough to read `ok`, error messages, and round-trip the tests). */
  def decodeDoc(bytes: Array[Byte]): Seq[(String, Any)] = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    buf.getInt // total length
    val out = scala.collection.mutable.ArrayBuffer[(String, Any)]()
    var tpe = buf.get()
    while (tpe != 0) {
      val name = {
        val sb = new StringBuilder
        var c = buf.get()
        while (c != 0) { sb.append(c.toChar); c = buf.get() }
        sb.toString
      }
      val value: Any = tpe match {
        case 0x01 => buf.getDouble
        case 0x02 =>
          val n = buf.getInt
          val b = new Array[Byte](n - 1); buf.get(b); buf.get()
          new String(b, StandardCharsets.UTF_8)
        case 0x03 | 0x04 =>
          val start = buf.position()
          val len = buf.getInt
          val b = new Array[Byte](len)
          buf.position(start); buf.get(b)
          val sub = decodeDoc(b)
          if (tpe == 0x03) sub else sub.map(_._2)
        case 0x08 => buf.get() == 1
        case 0x0a => null
        case 0x10 => buf.getInt
        case 0x12 => buf.getLong
        case other => throw new IllegalArgumentException(s"mongo: BSON type 0x$other%02x")
      }
      out += ((name, value))
      tpe = buf.get()
    }
    out.toSeq
  }

  // ---- OP_MSG ----

  final class Conn(host: String, port: Int) extends AutoCloseable {
    private val socket = new java.net.Socket(host, port)
    private val out = new BufferedOutputStream(socket.getOutputStream)
    private val in = new BufferedInputStream(socket.getInputStream)
    private var requestId = 0

    /** Send one command document as OP_MSG, return the reply document. */
    def command(doc: Seq[(String, Any)]): Seq[(String, Any)] = {
      requestId += 1
      val body = int32(0) ++ Array(0.toByte) ++ encodeDoc(doc) // flags, kind 0
      val msg = int32(16 + body.length) ++ int32(requestId) ++ int32(0) ++
        int32(2013) ++ body
      out.write(msg); out.flush()
      val header = readN(16)
      val totalLen = ByteBuffer.wrap(header).order(ByteOrder.LITTLE_ENDIAN).getInt
      val rest = readN(totalLen - 16)
      // skip flagBits(4) + section kind(1)
      val reply = decodeDoc(java.util.Arrays.copyOfRange(rest, 5, rest.length))
      reply.find(_._1 == "ok") match {
        case Some((_, ok: Double)) if ok == 1.0 => reply
        case _ => throw new RuntimeException(s"mongo command failed: $reply")
      }
    }

    private def readN(n: Int): Array[Byte] = {
      val buf = new Array[Byte](n)
      var off = 0
      while (off < n) {
        val r = in.read(buf, off, n - off)
        if (r < 0) throw new java.io.EOFException
        off += r
      }
      buf
    }

    def close(): Unit = socket.close()
  }

  /** Row -> BSON-able pairs for flat schemas. */
  def rowToPairs(row: Row, schema: StructType): Seq[(String, Any)] =
    schema.fields.toSeq.map { f =>
      val v = if (row.isNullAt(row.fieldIndex(f.name))) null
      else f.dataType match {
        case DoubleType | FloatType => row.getAs[Any](f.name) match {
          case fl: Float => fl.toDouble
          case d => d
        }
        case StringType => row.getAs[String](f.name)
        case BooleanType => row.getAs[Boolean](f.name)
        case IntegerType | ShortType | ByteType => row.getAs[Number](f.name).intValue()
        case LongType => row.getAs[Long](f.name)
        case other => throw new IllegalArgumentException(
          s"mongo: unsupported column type $other for ${f.name}")
      }
      (f.name, v)
    }

  /** options: host, port?, db, collection, batch_size?. */
  final case class MongoSink(options: Map[String, String]) extends Engine.BatchSink {
    def write(batch: DataFrame, batchId: Long): Unit = {
      val (host, port) = (options("host"), options.getOrElse("port", "27017").toInt)
      val (db, coll) = (options("db"), options("collection"))
      val chunk = options.getOrElse("batch_size", "1000").toInt
      val schema = batch.schema
      batch.foreachPartition { (rows: Iterator[Row]) =>
        if (rows.nonEmpty) {
          val conn = new Conn(host, port)
          try rows.grouped(chunk).foreach { docs =>
            conn.command(Seq(
              "insert" -> coll,
              "$db" -> db,
              "documents" -> docs.map(r => rowToPairs(r, schema)).toSeq))
          } finally conn.close()
        }
      }
    }
  }
}
