package graft.streaming

import java.io.{BufferedInputStream, BufferedOutputStream}
import java.nio.charset.StandardCharsets
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** MQTT 3.1.1 input + output at QoS 0 (SURVEY.md §2.1/§2.2; reference
  * input/mqtt.rs:35-57 subscribe, output/mqtt.rs:37 publish). Like
  * [[Redis]]/[[Nats]], a from-scratch wire client over a plain socket —
  * the 3.1.1 control packets used here (CONNECT/CONNACK, SUBSCRIBE/
  * SUBACK, PUBLISH, PINGREQ/PINGRESP, DISCONNECT) are a few dozen bytes
  * of framing. QoS 1/2 ack state machines are out of scope: on the Spark
  * side redelivery/exactly-once is the checkpoint + idempotent-sink
  * story, not a protocol-level ack ladder.
  */
object Mqtt {

  private def encodeRemainingLength(n0: Int): Array[Byte] = {
    var n = n0
    val out = scala.collection.mutable.ArrayBuffer[Byte]()
    while ({
      var d = n % 128
      n /= 128
      if (n > 0) d |= 0x80
      out += d.toByte
      n > 0
    }) ()
    out.toArray
  }

  private def utf8Field(s: String): Array[Byte] = {
    val b = s.getBytes(StandardCharsets.UTF_8)
    Array(((b.length >> 8) & 0xff).toByte, (b.length & 0xff).toByte) ++ b
  }

  final class Conn(host: String, port: Int, clientId: String) extends AutoCloseable {
    private val socket = new java.net.Socket(host, port)
    private val out = new BufferedOutputStream(socket.getOutputStream)
    private[Mqtt] val in = new BufferedInputStream(socket.getInputStream)

    // CONNECT: protocol "MQTT" level 4, clean session, keepalive 60
    writePacket(0x10, utf8Field("MQTT") ++ Array[Byte](4, 0x02, 0, 60) ++ utf8Field(clientId))
    expectPacketType(0x20) // CONNACK

    private[Mqtt] def writePacket(firstByte: Int, body: Array[Byte]): Unit = {
      out.write(firstByte)
      out.write(encodeRemainingLength(body.length))
      out.write(body)
      out.flush()
    }

    /** (packetType, body) */
    private[Mqtt] def readPacket(): (Int, Array[Byte]) = {
      val first = in.read()
      if (first == -1) throw new java.io.EOFException
      var len = 0; var shift = 0; var d = 0
      while ({
        d = in.read()
        if (d == -1) throw new java.io.EOFException("mqtt: peer closed mid-frame")
        len |= (d & 0x7f) << shift; shift += 7; (d & 0x80) != 0
      }) ()
      val body = new Array[Byte](len)
      var off = 0
      while (off < len) {
        val r = in.read(body, off, len - off)
        if (r < 0) throw new java.io.EOFException
        off += r
      }
      (first & 0xff, body)
    }

    private def expectPacketType(t: Int): Unit = {
      val (got, _) = readPacket()
      require((got & 0xf0) == (t & 0xf0), f"mqtt: expected packet 0x$t%02x, got 0x$got%02x")
    }

    def publish(topic: String, payload: Array[Byte]): Unit =
      writePacket(0x30, utf8Field(topic) ++ payload) // QoS 0: no packet id

    def subscribe(topicFilter: String): Unit = {
      writePacket(0x82, Array[Byte](0, 1) ++ utf8Field(topicFilter) ++ Array[Byte](0))
      expectPacketType(0x90) // SUBACK
    }

    def close(): Unit = {
      try writePacket(0xe0, Array.empty) // DISCONNECT
      catch { case _: java.io.IOException => () }
      socket.close()
    }
  }

  /** Streaming subscribe input: PUBLISH frames land as envelope rows
    * tagged with `__meta_topic`. */
  final class MqttInput(spark: SparkSession, host: String, port: Int,
      topicFilter: String, clientId: String = "graft-in") {
    private implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    private val stream = MemoryStream[(String, String)]
    private val conn = new Conn(host, port, clientId)
    conn.subscribe(topicFilter)

    private val reader = new Thread(() => {
      try while (true) {
        val (tpe, body) = conn.readPacket()
        (tpe & 0xf0) match {
          case 0x30 =>
            val topicLen = ((body(0) & 0xff) << 8) | (body(1) & 0xff)
            val topic = new String(body, 2, topicLen, StandardCharsets.UTF_8)
            val payload = new String(body, 2 + topicLen,
              body.length - 2 - topicLen, StandardCharsets.UTF_8)
            stream.addData((topic, payload))
          case 0xc0 => conn.writePacket(0xd0, Array.empty) // PINGREQ -> PINGRESP
          case _ => ()
        }
      } catch { case _: java.io.EOFException | _: java.net.SocketException => () }
    }, "graft-mqtt-reader")
    reader.setDaemon(true)
    reader.start()

    def toDF: DataFrame = stream.toDF().select(
      col("_2").cast("binary").as(Codecs.ValueCol),
      col("_1").as("__meta_topic"))

    def stop(): Unit = conn.close()
  }

  /** Publish each row at QoS 0 — executor-side, one connection per
    * partition (at-most-once, the reference's QoS-0 contract). */
  final case class MqttSink(host: String, port: Int, topicExpr: String,
      valueExpr: String) extends Engine.BatchSink {
    def write(batch: DataFrame, batchId: Long): Unit = {
      val (h, p) = (host, port)
      batch.selectExpr(s"CAST(($topicExpr) AS STRING) AS t",
          s"CAST(($valueExpr) AS STRING) AS v")
        .foreachPartition { (rows: Iterator[Row]) =>
          if (rows.nonEmpty) {
            val conn = new Conn(h, p, s"graft-out-${java.util.UUID.randomUUID()}")
            try rows.foreach(r => conn.publish(r.getString(0),
              r.getString(1).getBytes(StandardCharsets.UTF_8)))
            finally conn.close()
          }
        }
    }
  }
}
