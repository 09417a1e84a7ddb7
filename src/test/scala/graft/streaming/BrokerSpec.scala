package graft.streaming

import java.io.{BufferedInputStream, BufferedOutputStream}
import java.nio.charset.StandardCharsets
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** NATS / MQTT / Modbus protocol clients verified against in-memory
  * broker/device implementations of each wire protocol.
  */
class BrokerSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  // ---- fake NATS server ----
  private final class FakeNats {
    val received = new java.util.concurrent.ConcurrentLinkedQueue[(String, String)]()
    private val subscribers =
      new java.util.concurrent.ConcurrentLinkedQueue[(String, String, BufferedOutputStream)]()
    private val server = new java.net.ServerSocket(0, 16,
      java.net.InetAddress.getByName("127.0.0.1"))
    val port: Int = server.getLocalPort

    private def handle(s: java.net.Socket): Unit = {
      val in = new BufferedInputStream(s.getInputStream)
      val out = new BufferedOutputStream(s.getOutputStream)
      def line(): String = {
        val sb = new StringBuilder
        var c = in.read()
        if (c == -1) throw new java.io.EOFException
        while (c != '\r') { sb.append(c.toChar); c = in.read() }
        in.read(); sb.toString
      }
      out.write("INFO {}\r\n".getBytes(StandardCharsets.UTF_8)); out.flush()
      try while (true) {
        val parts = line().split(" ")
        parts.head match {
          case "CONNECT" => ()
          case "SUB" => subscribers.add((parts(1), parts(2), out))
          case "PUB" =>
            val n = parts.last.toInt
            val buf = new Array[Byte](n)
            var off = 0
            while (off < n) off += in.read(buf, off, n - off)
            in.read(); in.read()
            val payload = new String(buf, StandardCharsets.UTF_8)
            received.add((parts(1), payload))
            subscribers.forEach { case (subj, sid, sout) =>
              if (subj == parts(1)) sout.synchronized {
                sout.write(s"MSG ${parts(1)} $sid $n\r\n$payload\r\n"
                  .getBytes(StandardCharsets.UTF_8))
                sout.flush()
              }
            }
          case "PING" => out.write("PONG\r\n".getBytes); out.flush()
          case _ => ()
        }
      } catch { case _: java.io.EOFException | _: java.net.SocketException => () }
      finally s.close()
    }

    private val acceptor = new Thread(() => {
      try while (true) {
        val s = server.accept()
        val t = new Thread(() => handle(s)); t.setDaemon(true); t.start()
      } catch { case _: java.net.SocketException => () }
    }, "fake-nats")
    acceptor.setDaemon(true); acceptor.start()
    def stop(): Unit = server.close()
  }

  test("nats output publishes per row and the input streams it back (input/nats.rs, output/nats.rs)") {
    val nats = new FakeNats
    try {
      val input = new Nats.NatsInput(spark, "127.0.0.1", nats.port, "events")
      Nats.NatsSink("127.0.0.1", nats.port, "'events'", "msg")
        .write(Seq("""{"v": 1}""", """{"v": 2}""").toDF("msg"), 0L)
      val deadline = System.nanoTime() + 10e9.toLong
      while (nats.received.size < 2 && System.nanoTime() < deadline) Thread.sleep(20)
      Thread.sleep(300) // let the reader thread drain the MSG frames
      val sink = new Engine.MemorySink
      val q = Engine.start(input.toDF,
        Seq(Processors.JsonToArrow(Seq("v"))), sink)
      q.processAllAvailable(); q.stop()
      input.stop()
      assert(sink.rows.map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
    } finally nats.stop()
  }

  // ---- fake MQTT broker ----
  private final class FakeMqtt {
    val published = new java.util.concurrent.ConcurrentLinkedQueue[(String, String)]()
    private val subscribers =
      new java.util.concurrent.ConcurrentLinkedQueue[(String, BufferedOutputStream)]()
    private val server = new java.net.ServerSocket(0, 16,
      java.net.InetAddress.getByName("127.0.0.1"))
    val port: Int = server.getLocalPort

    private def handle(s: java.net.Socket): Unit = {
      val in = new BufferedInputStream(s.getInputStream)
      val out = new BufferedOutputStream(s.getOutputStream)
      def readPacket(): (Int, Array[Byte]) = {
        val first = in.read()
        if (first == -1) throw new java.io.EOFException
        var len = 0; var shift = 0; var d = 0
        while ({ d = in.read(); len |= (d & 0x7f) << shift; shift += 7; (d & 0x80) != 0 }) ()
        val body = new Array[Byte](len)
        var off = 0
        while (off < len) off += in.read(body, off, len - off)
        (first & 0xff, body)
      }
      def write(first: Int, body: Array[Byte]): Unit = out.synchronized {
        out.write(first)
        var n = body.length
        while ({
          var dd = n % 128; n /= 128
          if (n > 0) dd |= 0x80
          out.write(dd); n > 0
        }) ()
        out.write(body); out.flush()
      }
      try while (true) {
        val (tpe, body) = readPacket()
        (tpe & 0xf0) match {
          case 0x10 => write(0x20, Array[Byte](0, 0)) // CONNECT -> CONNACK ok
          case 0x80 => // SUBSCRIBE: packet id + one topic filter
            val filterLen = ((body(2) & 0xff) << 8) | (body(3) & 0xff)
            val filter = new String(body, 4, filterLen, StandardCharsets.UTF_8)
            subscribers.add((filter, out))
            write(0x90, Array(body(0), body(1), 0.toByte)) // SUBACK qos0
          case 0x30 =>
            val topicLen = ((body(0) & 0xff) << 8) | (body(1) & 0xff)
            val topic = new String(body, 2, topicLen, StandardCharsets.UTF_8)
            val payload = new String(body, 2 + topicLen,
              body.length - 2 - topicLen, StandardCharsets.UTF_8)
            published.add((topic, payload))
            subscribers.forEach { case (f, sout) =>
              if (f == topic || f == "#") {
                // re-frame toward the subscriber
                val b = body
                sout.synchronized {
                  sout.write(0x30)
                  var n = b.length
                  while ({
                    var dd = n % 128; n /= 128
                    if (n > 0) dd |= 0x80
                    sout.write(dd); n > 0
                  }) ()
                  sout.write(b); sout.flush()
                }
              }
            }
          case 0xc0 => write(0xd0, Array.empty) // PINGREQ -> PINGRESP
          case 0xe0 => throw new java.io.EOFException // DISCONNECT
          case _ => ()
        }
      } catch { case _: java.io.EOFException | _: java.net.SocketException => () }
      finally s.close()
    }

    private val acceptor = new Thread(() => {
      try while (true) {
        val s = server.accept()
        val t = new Thread(() => handle(s)); t.setDaemon(true); t.start()
      } catch { case _: java.net.SocketException => () }
    }, "fake-mqtt")
    acceptor.setDaemon(true); acceptor.start()
    def stop(): Unit = server.close()
  }

  test("mqtt output publishes QoS-0 per row and the input streams it back (input/mqtt.rs, output/mqtt.rs)") {
    val broker = new FakeMqtt
    try {
      val input = new Mqtt.MqttInput(spark, "127.0.0.1", broker.port, "sensors/temp")
      Mqtt.MqttSink("127.0.0.1", broker.port, "'sensors/temp'", "msg")
        .write(Seq("""{"v": 7}""", """{"v": 8}""").toDF("msg"), 0L)
      val deadline = System.nanoTime() + 10e9.toLong
      while (broker.published.size < 2 && System.nanoTime() < deadline) Thread.sleep(20)
      Thread.sleep(300)
      val sink = new Engine.MemorySink
      val q = Engine.start(input.toDF, Seq(Processors.JsonToArrow(Seq("v"))), sink)
      q.processAllAvailable(); q.stop()
      input.stop()
      assert(sink.rows.map(_.getLong(0)).sorted.toSeq == Seq(7L, 8L))
    } finally broker.stop()
  }

  test("mqtt input is config-reachable and closes via the engine registry") {
    val broker = new FakeMqtt
    try {
      val in = Engine.inputFromConf(spark, ComponentConf("mqtt", Map(
        "host" -> "127.0.0.1", "port" -> broker.port.toString,
        "topics" -> "sensors/temp", "client_id" -> "conf-in")))
      Mqtt.MqttSink("127.0.0.1", broker.port, "'sensors/temp'", "msg")
        .write(Seq("""{"v": 41}""").toDF("msg"), 0L)
      val deadline = System.nanoTime() + 10e9.toLong
      while (broker.published.size < 1 && System.nanoTime() < deadline) Thread.sleep(20)
      Thread.sleep(300)
      val sink = new Engine.MemorySink
      val q = Engine.start(in, Seq(Processors.JsonToArrow(Seq("v"))), sink)
      q.processAllAvailable(); q.stop()
      assert(sink.rows.map(_.getLong(0)) == Seq(41L))
      Engine.closeConfigInputs() // must not throw; closes the live conn
    } finally broker.stop()
  }

  // ---- fake Modbus device ----
  private final class FakeModbus(registers: Map[Int, Int]) {
    private val server = new java.net.ServerSocket(0, 4,
      java.net.InetAddress.getByName("127.0.0.1"))
    val port: Int = server.getLocalPort
    private val acceptor = new Thread(() => {
      try while (true) {
        val s = server.accept()
        val t = new Thread(() => {
          val in = new BufferedInputStream(s.getInputStream)
          val out = new BufferedOutputStream(s.getOutputStream)
          try while (true) {
            val head = new Array[Byte](12)
            var off = 0
            while (off < 12) {
              val r = in.read(head, off, 12 - off)
              if (r < 0) throw new java.io.EOFException
              off += r
            }
            val addr = ((head(8) & 0xff) << 8) | (head(9) & 0xff)
            val count = ((head(10) & 0xff) << 8) | (head(11) & 0xff)
            val data = (0 until count).flatMap { i =>
              val v = registers.getOrElse(addr + i, 0)
              Seq(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
            }
            out.write(Array[Byte](head(0), head(1), 0, 0,
              ((3 + data.size) >> 8).toByte, ((3 + data.size) & 0xff).toByte,
              head(6), 3.toByte, (count * 2).toByte))
            out.write(data.toArray)
            out.flush()
          } catch { case _: java.io.EOFException | _: java.net.SocketException => () }
          finally s.close()
        })
        t.setDaemon(true); t.start()
      } catch { case _: java.net.SocketException => () }
    }, "fake-modbus")
    acceptor.setDaemon(true); acceptor.start()
    def stop(): Unit = server.close()
  }

  // ---- fake MongoDB (OP_MSG) ----
  private final class FakeMongo {
    val inserted = new java.util.concurrent.ConcurrentLinkedQueue[Seq[(String, Any)]]()
    private val server = new java.net.ServerSocket(0, 4,
      java.net.InetAddress.getByName("127.0.0.1"))
    val port: Int = server.getLocalPort
    private val acceptor = new Thread(() => {
      try while (true) {
        val s = server.accept()
        val t = new Thread(() => {
          val in = new BufferedInputStream(s.getInputStream)
          val out = new BufferedOutputStream(s.getOutputStream)
          def readN(n: Int): Array[Byte] = {
            val buf = new Array[Byte](n)
            var off = 0
            while (off < n) {
              val r = in.read(buf, off, n - off)
              if (r < 0) throw new java.io.EOFException
              off += r
            }
            buf
          }
          try while (true) {
            val header = readN(16)
            val bb = java.nio.ByteBuffer.wrap(header).order(java.nio.ByteOrder.LITTLE_ENDIAN)
            val totalLen = bb.getInt
            val requestId = bb.getInt
            val rest = readN(totalLen - 16)
            val cmd = Mongo.decodeDoc(java.util.Arrays.copyOfRange(rest, 5, rest.length))
            val docs = cmd.find(_._1 == "documents").map(_._2)
              .getOrElse(Seq.empty).asInstanceOf[Seq[Any]]
            docs.foreach(d => inserted.add(d.asInstanceOf[Seq[(String, Any)]]))
            val replyBody = java.nio.ByteBuffer.allocate(5)
              .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(0).put(0.toByte).array() ++
              Mongo.encodeDoc(Seq("n" -> docs.size, "ok" -> 1.0))
            val replyHeader = java.nio.ByteBuffer.allocate(16)
              .order(java.nio.ByteOrder.LITTLE_ENDIAN)
              .putInt(16 + replyBody.length).putInt(1).putInt(requestId).putInt(2013)
              .array()
            out.write(replyHeader ++ replyBody)
            out.flush()
          } catch { case _: java.io.EOFException | _: java.net.SocketException => () }
          finally s.close()
        })
        t.setDaemon(true); t.start()
      } catch { case _: java.net.SocketException => () }
    }, "fake-mongo")
    acceptor.setDaemon(true); acceptor.start()
    def stop(): Unit = server.close()
  }

  test("mongodb sink inserts documents over OP_MSG (output/mongodb.rs)") {
    val mongo = new FakeMongo
    try {
      val sink = Engine.sinkFromConf(ComponentConf("mongodb", Map(
        "host" -> "127.0.0.1", "port" -> mongo.port.toString,
        "db" -> "graft", "collection" -> "readings", "batch_size" -> "2")))
      sink.write(Seq(("t1", 10L, 1.5), ("t2", 20L, 2.5), ("t3", 30L, 3.5))
        .toDF("sensor", "count", "value").coalesce(1), batchId = 0L)
      val docs = mongo.inserted.toArray(Array.empty[Seq[(String, Any)]])
        .map(_.toMap).sortBy(_("sensor").toString)
      assert(docs.length == 3)
      assert(docs(0) == Map("sensor" -> "t1", "count" -> 10L, "value" -> 1.5))
      assert(docs(2)("count") == 30L)
    } finally mongo.stop()
  }

  test("bson codec round-trips flat and nested documents") {
    val doc = Seq("a" -> 1.5, "b" -> "hi", "c" -> true, "d" -> 42, "e" -> 7L,
      "f" -> null, "sub" -> Seq("x" -> 1), "arr" -> Seq("p", "q"))
    val decoded = Mongo.decodeDoc(Mongo.encodeDoc(doc)).toMap
    assert(decoded("a") == 1.5 && decoded("b") == "hi" && decoded("c") == true)
    assert(decoded("d") == 42 && decoded("e") == 7L && decoded("f") == null)
    assert(decoded("sub") == Seq("x" -> 1))
    assert(decoded("arr") == Seq("p", "q"))
  }

  test("modbus input polls holding registers into columns per point (input/modbus.rs)") {
    val device = new FakeModbus(Map(100 -> 1234, 101 -> 5678, 200 -> 42))
    try {
      val df = Engine.inputFromConf(spark, ComponentConf("modbus", Map(
        "host" -> "127.0.0.1", "port" -> device.port.toString,
        "points" -> "temp:100:2,mode:200")))
      val row = df.collect().head
      assert(row.getSeq[Int](row.fieldIndex("temp")).toSeq == Seq(1234, 5678))
      assert(row.getAs[Int]("mode") == 42)
      assert(df.columns.contains("__meta_poll_time"))
    } finally device.stop()
  }
}
