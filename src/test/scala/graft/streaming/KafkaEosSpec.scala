package graft.streaming

import java.io.{BufferedInputStream, BufferedOutputStream}
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Broker-fenced Kafka exactly-once (output/kafka.rs:293-399) against an
  * in-memory broker implementing the transactional subset of the wire
  * protocol: InitProducerId epoch bumping (zombie fencing), pending
  * batches invisible to read_committed until EndTxn commit, aborted and
  * uncommitted batches never visible. The broker decodes real
  * RecordBatch v2 bytes (CRC-verified) through [[KafkaWire]]'s decoder.
  */
class KafkaEosSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  /** entry state: 0 pending, 1 committed, 2 aborted */
  private final class FakeKafka {
    final case class Entry(value: String, headers: Map[String, String],
        pid: Long, epoch: Short, var state: Int)
    val log = new java.util.concurrent.ConcurrentHashMap[(String, Int),
      java.util.concurrent.CopyOnWriteArrayList[Entry]]()
    private val txns = new java.util.concurrent.ConcurrentHashMap[String, (Long, Short)]()
    private val nextPid = new java.util.concurrent.atomic.AtomicLong(1000L)
    private val server = new java.net.ServerSocket(0, 16,
      java.net.InetAddress.getByName("127.0.0.1"))
    val port: Int = server.getLocalPort

    def readCommitted(topic: String, partition: Int): Seq[(String, Map[String, String])] = {
      val l = log.get((topic, partition))
      if (l == null) Seq.empty
      else {
        val it = l.iterator()
        val out = Seq.newBuilder[(String, Map[String, String])]
        while (it.hasNext) { val e = it.next(); if (e.state == 1) out += ((e.value, e.headers)) }
        out.result()
      }
    }
    def pendingCount(topic: String, partition: Int): Int = {
      val l = log.get((topic, partition))
      if (l == null) 0 else {
        var n = 0; val it = l.iterator()
        while (it.hasNext) if (it.next().state == 0) n += 1
        n
      }
    }

    private def handle(s: java.net.Socket): Unit = {
      val in = new BufferedInputStream(s.getInputStream)
      val out = new BufferedOutputStream(s.getOutputStream)
      def readFully(n: Int): Array[Byte] = {
        val buf = new Array[Byte](n); var off = 0
        while (off < n) {
          val r = in.read(buf, off, n - off)
          if (r < 0) throw new java.io.EOFException
          off += r
        }
        buf
      }
      try while (true) {
        val size = ByteBuffer.wrap(readFully(4)).getInt
        val frame = ByteBuffer.wrap(readFully(size))
        val apiKey = frame.getShort.toInt
        frame.getShort // api version
        val corr = frame.getInt
        KafkaWire.readStr(frame) // client id
        val resp = new KafkaWire.Out().i32(corr)
        apiKey match {
          case 22 => // InitProducerId v0
            val txnId = KafkaWire.readStr(frame)
            frame.getInt // timeout
            val (pid, ep) = txns.compute(txnId, (_, old) =>
              if (old == null) (nextPid.incrementAndGet(), 0.toShort)
              else (old._1, (old._2 + 1).toShort))
            resp.i32(0).i16(0).i64(pid).i16(ep.toInt)
          case 24 => // AddPartitionsToTxn v0
            val txnId = KafkaWire.readStr(frame)
            val pid = frame.getLong
            val ep = frame.getShort
            val nT = frame.getInt
            val topicNames = (0 until nT).map { _ =>
              val t = KafkaWire.readStr(frame)
              val nP = frame.getInt
              t -> (0 until nP).map(_ => frame.getInt)
            }
            val err = if (txns.get(txnId) == ((pid, ep))) 0 else 47
            resp.i32(0).i32(topicNames.size)
            topicNames.foreach { case (t, ps) =>
              resp.str(t).i32(ps.size)
              ps.foreach(p => resp.i32(p).i16(err))
            }
          case 0 => // Produce v3
            val txnId = KafkaWire.readStr(frame)
            frame.getShort // acks
            frame.getInt // timeout
            val nT = frame.getInt
            val results = (0 until nT).flatMap { _ =>
              val topic = KafkaWire.readStr(frame)
              val nP = frame.getInt
              (0 until nP).map { _ =>
                val pIdx = frame.getInt
                val blen = frame.getInt
                val bytes = new Array[Byte](blen); frame.get(bytes)
                val (pid, ep, _, transactional, records) =
                  KafkaWire.decodeRecordBatch(bytes)
                val fenced = transactional && txns.get(txnId) != ((pid, ep))
                if (!fenced) {
                  val l = log.computeIfAbsent((topic, pIdx),
                    _ => new java.util.concurrent.CopyOnWriteArrayList[Entry]())
                  records.foreach { r =>
                    l.add(Entry(new String(r.value, UTF_8),
                      r.headers.map(h => h.key -> new String(h.value, UTF_8)).toMap,
                      pid, ep, if (transactional) 0 else 1))
                  }
                }
                (topic, pIdx, if (fenced) 47 else 0, 0L)
              }
            }
            resp.i32(1)
            results.groupBy(_._1).foreach { case (t, rs) =>
              resp.str(t).i32(rs.size)
              rs.foreach { case (_, p, err, off) =>
                resp.i32(p).i16(err).i64(off).i64(-1L)
              }
            }
            resp.i32(0) // throttle trails in v3
          case 26 => // EndTxn v0
            val txnId = KafkaWire.readStr(frame)
            val pid = frame.getLong
            val ep = frame.getShort
            val commit = frame.get() == 1
            if (txns.get(txnId) != ((pid, ep))) resp.i32(0).i16(47)
            else {
              log.forEach { (_, l) =>
                val it = l.iterator()
                while (it.hasNext) {
                  val e = it.next()
                  if (e.state == 0 && e.pid == pid && e.epoch == ep)
                    e.state = if (commit) 1 else 2
                }
              }
              resp.i32(0).i16(0)
            }
          case other =>
            throw new IllegalStateException(s"fake kafka: unexpected api $other")
        }
        val body = resp.toBytes
        out.write(ByteBuffer.allocate(4).putInt(body.length).array())
        out.write(body); out.flush()
      } catch { case _: java.io.EOFException | _: java.net.SocketException => () }
      finally s.close()
    }

    private val acceptor = new Thread(() => {
      try while (true) {
        val c = server.accept()
        val t = new Thread(() => handle(c)); t.setDaemon(true); t.start()
      } catch { case _: java.net.SocketException => () }
    }, "fake-kafka")
    acceptor.setDaemon(true); acceptor.start()
    def stop(): Unit = server.close()
  }

  test("transactional sink commits atomically; read_committed sees every row with its batch_id header") {
    val broker = new FakeKafka
    try {
      val sink = Engine.sinkFromConf(ComponentConf("kafka", Map(
        "brokers" -> s"127.0.0.1:${broker.port}",
        "topic" -> "out",
        "exactly_once" -> "transactional",
        "transactional_id" -> "spec-txn",
        "value_field" -> "msg")))
      assert(sink.isInstanceOf[Engine.TransactionalKafkaSink])
      sink.write(Seq("r1", "r2", "r3").toDF("msg").repartition(2), 7L)
      val got = broker.readCommitted("out", 0)
      assert(got.map(_._1).sorted == Seq("r1", "r2", "r3"))
      assert(got.forall(_._2 == Map("batch_id" -> "7")),
        "every record carries the micro-batch id header")
      assert(broker.pendingCount("out", 0) == 0)
    } finally broker.stop()
  }

  test("mid-batch failure leaves nothing visible; the retry fences the zombie and commits atomically (output/kafka.rs:293-399)") {
    val broker = new FakeKafka
    try {
      import KafkaWire._
      def rec(v: String) = ProducerRecord(null, v.getBytes(UTF_8))
      // attempt 1: produces half the batch, then "crashes" before commit
      val zombie = new TransactionalProducer("127.0.0.1", broker.port, "job-p0")
      zombie.initTransactions()
      zombie.beginTransaction("t", 0)
      zombie.produce("t", 0, Seq(rec("a1"), rec("a2")))
      // crash: no endTransaction
      assert(broker.readCommitted("t", 0).isEmpty,
        "read_committed must see NOTHING from an uncommitted transaction")
      assert(broker.pendingCount("t", 0) == 2)

      // retry (same stable transactional id): init bumps the epoch
      val retry = new TransactionalProducer("127.0.0.1", broker.port, "job-p0")
      retry.initTransactions()
      retry.beginTransaction("t", 0)
      retry.produce("t", 0, Seq(rec("b1"), rec("b2"), rec("b3")))

      // the zombie wakes up and tries to keep writing — fenced
      val fenced = intercept[java.io.IOException] {
        zombie.produce("t", 0, Seq(rec("zombie")))
      }
      assert(fenced.getMessage.contains("INVALID_PRODUCER_EPOCH"))

      retry.endTransaction(commit = true)
      assert(broker.readCommitted("t", 0).map(_._1) == Seq("b1", "b2", "b3"),
        "exactly the retry's rows, atomically, in order — zombie rows never surface")
      zombie.close(); retry.close()
    } finally broker.stop()
  }

  test("aborted transactions stay invisible to read_committed") {
    val broker = new FakeKafka
    try {
      import KafkaWire._
      val p = new TransactionalProducer("127.0.0.1", broker.port, "ab-p0")
      p.initTransactions()
      p.beginTransaction("t", 0)
      p.produce("t", 0, Seq(ProducerRecord(null, "x".getBytes(UTF_8))))
      p.endTransaction(commit = false)
      assert(broker.readCommitted("t", 0).isEmpty)
      // a following committed txn on the same producer is visible
      p.initTransactions()
      p.beginTransaction("t", 0)
      p.produce("t", 0, Seq(ProducerRecord(null, "y".getBytes(UTF_8))))
      p.endTransaction(commit = true)
      assert(broker.readCommitted("t", 0).map(_._1) == Seq("y"))
      p.close()
    } finally broker.stop()
  }

  test("record batch codec round-trips with CRC and the transactional bit") {
    import KafkaWire._
    val recs = Seq(
      ProducerRecord("k".getBytes(UTF_8), "v1".getBytes(UTF_8),
        Seq(RecordHeader("h", "hv".getBytes(UTF_8)))),
      ProducerRecord(null, "v2".getBytes(UTF_8)))
    val bytes = encodeRecordBatch(42L, 3.toShort, 17, transactional = true,
      recs, 1723600000000L)
    val (pid, ep, seq, txn, out) = decodeRecordBatch(bytes)
    assert(pid == 42L && ep == 3 && seq == 17 && txn)
    assert(out.size == 2)
    assert(new String(out.head.value, UTF_8) == "v1")
    assert(out.head.headers == Seq(RecordHeader("h", "hv".getBytes(UTF_8))) ||
      (out.head.headers.head.key == "h" &&
        new String(out.head.headers.head.value, UTF_8) == "hv"))
    assert(out(1).key == null)
    // corruption must be detected
    val bad = bytes.clone(); bad(bytes.length - 1) = (bad(bytes.length - 1) ^ 1).toByte
    intercept[IllegalArgumentException](decodeRecordBatch(bad))
  }
}
