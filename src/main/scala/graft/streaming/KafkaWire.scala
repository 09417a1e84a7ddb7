package graft.streaming

import java.io.{BufferedInputStream, BufferedOutputStream, ByteArrayOutputStream}
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8

/** Minimal from-scratch Kafka wire-protocol client for the TRANSACTIONAL
  * producer path (reference output/kafka.rs:293-399: initTransactions /
  * beginTransaction / per-batch commit under a stable fenced
  * `transactional.id`). Spark's kafka writer never calls
  * `initTransactions()` (Engine.kafkaSinkOptions scaladoc), and this
  * environment ships no kafka-clients jar — so, like [[Pulsar]]/[[Mqtt]]/
  * [[Modbus]], the protocol is implemented directly from the public
  * Kafka protocol spec:
  *
  *   - framing: `[size:i32][api_key:i16][api_version:i16]
  *     [correlation_id:i32][client_id:nullable-string][body]`; responses
  *     `[size:i32][correlation_id:i32][body]`. Old non-flexible API
  *     versions are used throughout (no tagged fields): InitProducerId
  *     v0 (key 22), AddPartitionsToTxn v0 (key 24), Produce v3 (key 0 —
  *     the first version carrying `transactional_id`), EndTxn v0
  *     (key 26).
  *   - records ride as RecordBatch v2: CRC-32C over the bytes after the
  *     crc field, the transactional attribute bit, producerId/epoch/
  *     baseSequence for broker-side fencing and idempotence, and
  *     zigzag-varint-framed records with headers.
  *
  * Broker-side transaction semantics (pending until EndTxn commit,
  * aborted batches invisible to `read_committed` consumers, epoch
  * fencing on re-init) are exercised against the in-memory broker in
  * KafkaEosSpec.
  */
object KafkaWire {

  final case class RecordHeader(key: String, value: Array[Byte])
  final case class ProducerRecord(key: Array[Byte], value: Array[Byte],
      headers: Seq[RecordHeader] = Nil)

  // error codes this client surfaces by name
  val ErrorNames: Map[Int, String] = Map(
    0 -> "NONE", 45 -> "OUT_OF_ORDER_SEQUENCE_NUMBER",
    47 -> "INVALID_PRODUCER_EPOCH", 48 -> "INVALID_TXN_STATE",
    49 -> "INVALID_PRODUCER_ID_MAPPING", 90 -> "PRODUCER_FENCED")

  // ---- primitive writers (big-endian, classic encoding) ----

  final class Out {
    val bb = new ByteArrayOutputStream()
    def i8(v: Int): Out = { bb.write(v & 0xff); this }
    def i16(v: Int): Out = { bb.write((v >> 8) & 0xff); bb.write(v & 0xff); this }
    def i32(v: Int): Out = { i16(v >> 16); i16(v); this }
    def i64(v: Long): Out = { i32((v >> 32).toInt); i32(v.toInt); this }
    def str(s: String): Out = { // non-null string: i16 length + utf8
      val b = s.getBytes(UTF_8); i16(b.length); bb.write(b, 0, b.length); this
    }
    def nstr(s: String): Out = if (s == null) i16(-1) else str(s)
    def nbytes(b: Array[Byte]): Out = {
      if (b == null) i32(-1)
      else { i32(b.length); bb.write(b, 0, b.length) }
      this
    }
    def raw(b: Array[Byte]): Out = { bb.write(b, 0, b.length); this }
    /** zigzag varint (record framing). */
    def vz(v: Long): Out = {
      var u = (v << 1) ^ (v >> 63)
      while ((u & ~0x7fL) != 0) { bb.write(((u & 0x7f) | 0x80).toInt); u >>>= 7 }
      bb.write(u.toInt); this
    }
    def toBytes: Array[Byte] = bb.toByteArray
  }

  def readVz(bb: ByteBuffer): Long = {
    var u = 0L; var shift = 0
    var b = bb.get() & 0xff
    while ((b & 0x80) != 0) { u |= (b & 0x7fL) << shift; shift += 7; b = bb.get() & 0xff }
    u |= b.toLong << shift
    (u >>> 1) ^ -(u & 1)
  }

  def readStr(bb: ByteBuffer): String = {
    val n = bb.getShort
    if (n < 0) null
    else { val b = new Array[Byte](n); bb.get(b); new String(b, UTF_8) }
  }

  // ---- RecordBatch v2 ----

  /** One transactional record batch; `baseSeq` supports broker-side
    * idempotent dedupe across producer retries. */
  def encodeRecordBatch(producerId: Long, epoch: Short, baseSeq: Int,
      transactional: Boolean, records: Seq[ProducerRecord],
      timestamp: Long): Array[Byte] = {
    require(records.nonEmpty, "empty record batch")
    val recs = new Out
    records.zipWithIndex.foreach { case (r, i) =>
      val body = new Out
      body.i8(0) // record attributes
      body.vz(0L) // timestampDelta
      body.vz(i.toLong) // offsetDelta
      if (r.key == null) body.vz(-1L)
      else { body.vz(r.key.length.toLong); body.raw(r.key) }
      if (r.value == null) body.vz(-1L)
      else { body.vz(r.value.length.toLong); body.raw(r.value) }
      body.vz(r.headers.size.toLong)
      r.headers.foreach { h =>
        val kb = h.key.getBytes(UTF_8)
        body.vz(kb.length.toLong); body.raw(kb)
        if (h.value == null) body.vz(-1L)
        else { body.vz(h.value.length.toLong); body.raw(h.value) }
      }
      val bb = body.toBytes
      recs.vz(bb.length.toLong); recs.raw(bb)
    }
    val recBytes = recs.toBytes
    // bytes covered by the CRC: attributes .. records
    val crcBody = new Out
    crcBody.i16(if (transactional) 0x10 else 0) // attributes
    crcBody.i32(records.size - 1) // lastOffsetDelta
    crcBody.i64(timestamp).i64(timestamp)
    crcBody.i64(producerId).i16(epoch.toInt).i32(baseSeq)
    crcBody.i32(records.size)
    crcBody.raw(recBytes)
    val covered = crcBody.toBytes
    val crc = new java.util.zip.CRC32C()
    crc.update(covered)
    val batch = new Out
    batch.i64(0L) // baseOffset (broker assigns)
    batch.i32(4 + 1 + 4 + covered.length) // batchLength: after this field
    batch.i32(-1) // partitionLeaderEpoch
    batch.i8(2) // magic
    batch.i32(crc.getValue.toInt)
    batch.raw(covered)
    batch.toBytes
  }

  /** Decode a v2 batch into (producerId, epoch, baseSeq, transactional,
    * records) — the broker side of the codec (spec's fake broker and
    * any diagnostics). Verifies the CRC. */
  def decodeRecordBatch(bytes: Array[Byte])
      : (Long, Short, Int, Boolean, Seq[ProducerRecord]) = {
    val bb = ByteBuffer.wrap(bytes)
    bb.getLong // baseOffset
    bb.getInt // batchLength
    bb.getInt // partitionLeaderEpoch
    require(bb.get() == 2, "only RecordBatch v2")
    val crcStored = bb.getInt
    val crcPos = bb.position()
    val crc = new java.util.zip.CRC32C()
    crc.update(bytes, crcPos, bytes.length - crcPos)
    require(crc.getValue.toInt == crcStored, "record batch CRC mismatch")
    val attributes = bb.getShort
    bb.getInt // lastOffsetDelta
    bb.getLong; bb.getLong // timestamps
    val pid = bb.getLong
    val epoch = bb.getShort
    val baseSeq = bb.getInt
    val n = bb.getInt
    val out = Seq.newBuilder[ProducerRecord]
    (0 until n).foreach { _ =>
      readVz(bb) // record length
      bb.get() // attributes
      readVz(bb); readVz(bb) // timestampDelta, offsetDelta
      def vbytes(): Array[Byte] = {
        val len = readVz(bb).toInt
        if (len < 0) null else { val b = new Array[Byte](len); bb.get(b); b }
      }
      val key = vbytes(); val value = vbytes()
      val nh = readVz(bb).toInt
      val hs = (0 until nh).map { _ =>
        val kl = readVz(bb).toInt
        val kb = new Array[Byte](kl); bb.get(kb)
        RecordHeader(new String(kb, UTF_8), vbytes())
      }
      out += ProducerRecord(key, value, hs)
    }
    (pid, epoch, baseSeq, (attributes & 0x10) != 0, out.result())
  }

  /** Blocking transactional producer over one broker connection —
    * the reference's init → addPartitions → produce* → commit/abort
    * lifecycle (output/kafka.rs:293-399), one instance per task with a
    * per-task stable `transactionalId` for fencing. */
  final class TransactionalProducer(host: String, port: Int,
      val transactionalId: String, clientId: String = "graft-txn")
      extends AutoCloseable {
    private val socket = new java.net.Socket(host, port)
    socket.setTcpNoDelay(true)
    private val out = new BufferedOutputStream(socket.getOutputStream)
    private val in = new BufferedInputStream(socket.getInputStream)
    private var correlation = 0
    private var producerId = -1L
    private var epoch: Short = -1
    private var sequence = 0

    private def send(apiKey: Int, apiVersion: Int, body: Array[Byte]): ByteBuffer = {
      correlation += 1
      val head = new Out
      head.i16(apiKey).i16(apiVersion).i32(correlation).nstr(clientId)
      val frame = head.toBytes ++ body
      val sz = ByteBuffer.allocate(4).putInt(frame.length).array()
      out.write(sz); out.write(frame); out.flush()
      // response: size, correlation, body
      val szb = new Array[Byte](4)
      readFully(szb)
      val rlen = ByteBuffer.wrap(szb).getInt
      val resp = new Array[Byte](rlen)
      readFully(resp)
      val bb = ByteBuffer.wrap(resp)
      val corr = bb.getInt
      require(corr == correlation, s"correlation mismatch: $corr != $correlation")
      bb
    }

    private def readFully(buf: Array[Byte]): Unit = {
      var off = 0
      while (off < buf.length) {
        val r = in.read(buf, off, buf.length - off)
        if (r < 0) throw new java.io.EOFException("kafka: peer closed mid-frame")
        off += r
      }
    }

    private def fail(api: String, code: Int): Nothing =
      throw new java.io.IOException(
        s"kafka $api error ${ErrorNames.getOrElse(code, code.toString)} " +
          s"(txn=$transactionalId pid=$producerId epoch=$epoch)")

    /** InitProducerId v0: acquires (producerId, epoch); re-init with the
      * same transactional id bumps the epoch broker-side, FENCING any
      * zombie producer still holding the old epoch. */
    def initTransactions(): Unit = {
      val body = new Out().nstr(transactionalId).i32(60000).toBytes
      val bb = send(22, 0, body)
      bb.getInt // throttle
      val err = bb.getShort.toInt
      if (err != 0) fail("InitProducerId", err)
      producerId = bb.getLong
      epoch = bb.getShort
      sequence = 0
    }

    /** AddPartitionsToTxn v0 for one (topic, partition). */
    def beginTransaction(topic: String, partition: Int): Unit = {
      val body = new Out().nstr(transactionalId).i64(producerId)
        .i16(epoch.toInt)
        .i32(1).str(topic).i32(1).i32(partition).toBytes
      val bb = send(24, 0, body)
      bb.getInt // throttle
      val nTopics = bb.getInt
      (0 until nTopics).foreach { _ =>
        readStr(bb)
        val nParts = bb.getInt
        (0 until nParts).foreach { _ =>
          bb.getInt
          val err = bb.getShort.toInt
          if (err != 0) fail("AddPartitionsToTxn", err)
        }
      }
    }

    /** Produce v3, acks=all, one transactional batch; returns the
      * assigned base offset. */
    def produce(topic: String, partition: Int,
        records: Seq[ProducerRecord]): Long = {
      val batch = encodeRecordBatch(producerId, epoch, sequence,
        transactional = true, records, System.currentTimeMillis())
      sequence += records.size
      val body = new Out().nstr(transactionalId).i16(-1).i32(30000)
        .i32(1).str(topic).i32(1).i32(partition).nbytes(batch).toBytes
      val bb = send(0, 3, body)
      var baseOffset = -1L
      val nTopics = bb.getInt
      (0 until nTopics).foreach { _ =>
        readStr(bb)
        val nParts = bb.getInt
        (0 until nParts).foreach { _ =>
          bb.getInt // partition index
          val err = bb.getShort.toInt
          if (err != 0) fail("Produce", err)
          baseOffset = bb.getLong
          bb.getLong // log_append_time
        }
      }
      bb.getInt // throttle (v3: trails the topic data)
      baseOffset
    }

    /** EndTxn v0 — commit=true publishes the transaction's batches to
      * read_committed consumers atomically; false aborts them. */
    def endTransaction(commit: Boolean): Unit = {
      val body = new Out().nstr(transactionalId).i64(producerId)
        .i16(epoch.toInt).i8(if (commit) 1 else 0).toBytes
      val bb = send(26, 0, body)
      bb.getInt // throttle
      val err = bb.getShort.toInt
      if (err != 0) fail("EndTxn", err)
    }

    def close(): Unit = socket.close()
  }
}
