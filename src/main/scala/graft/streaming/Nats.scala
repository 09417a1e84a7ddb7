package graft.streaming

import java.io.{BufferedInputStream, BufferedOutputStream}
import java.nio.charset.StandardCharsets
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Core NATS input + output (SURVEY.md §2.1/§2.2; reference
  * input/nats.rs:38-90 subject subscribe, output/nats.rs:37-55 publish).
  * NATS' client protocol is line-based text (INFO/CONNECT/SUB/MSG/PUB/
  * PING/PONG), so like [[Redis]] this is a from-scratch protocol client
  * over a plain socket — no client jar exists in this environment.
  * JetStream (durable consumers) is out of scope: its capability
  * (replayable, acked delivery) is what the Spark checkpoint already
  * provides on this side.
  *
  * Input shape: a background reader thread feeds MSG payloads into the
  * MemoryStream envelope (the driver-side ingestion edge, like
  * [[HttpInput]]/[[WebSocketInput]]); the output publishes from executors
  * with one connection per partition.
  */
object Nats {

  final class Conn(host: String, port: Int) extends AutoCloseable {
    private val socket = new java.net.Socket(host, port)
    socket.setSoTimeout(0)
    private val out = new BufferedOutputStream(socket.getOutputStream)
    private[Nats] val in = new BufferedInputStream(socket.getInputStream)

    readLine() // server INFO
    send("""CONNECT {"verbose":false,"pedantic":false}""")

    private[Nats] def send(line: String): Unit = {
      out.write((line + "\r\n").getBytes(StandardCharsets.UTF_8))
      out.flush()
    }

    private[Nats] def sendRaw(head: String, payload: Array[Byte]): Unit = {
      out.write((head + "\r\n").getBytes(StandardCharsets.UTF_8))
      out.write(payload)
      out.write("\r\n".getBytes(StandardCharsets.UTF_8))
      out.flush()
    }

    private[Nats] def readLine(): String = {
      val sb = new StringBuilder
      var c = in.read()
      while (c != '\r') {
        if (c == -1) throw new java.io.EOFException("nats: peer closed mid-line")
        sb.append(c.toChar); c = in.read()
      }
      in.read() // \n
      sb.toString
    }

    private[Nats] def readBytes(n: Int): Array[Byte] = {
      val buf = new Array[Byte](n)
      var off = 0
      while (off < n) {
        val r = in.read(buf, off, n - off)
        if (r < 0) throw new java.io.EOFException
        off += r
      }
      in.read(); in.read() // trailing \r\n
      buf
    }

    def publish(subject: String, payload: Array[Byte]): Unit =
      sendRaw(s"PUB $subject ${payload.length}", payload)

    def subscribe(subject: String, sid: String = "1"): Unit =
      send(s"SUB $subject $sid")

    def close(): Unit = socket.close()
  }

  /** Streaming subject input: `MSG <subject> <sid> [reply] <#bytes>`
    * frames land as envelope rows tagged with `__meta_subject`. */
  final class NatsInput(spark: SparkSession, host: String, port: Int, subject: String) {
    private implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    private val stream = MemoryStream[(String, String)]
    private val conn = new Conn(host, port)
    conn.subscribe(subject)

    private val reader = new Thread(() => {
      try while (true) {
        val line = conn.readLine()
        val parts = line.split(" ")
        parts.head match {
          case "MSG" =>
            val n = parts.last.toInt
            val msgSubject = parts(1)
            stream.addData((msgSubject,
              new String(conn.readBytes(n), StandardCharsets.UTF_8)))
          case "PING" => conn.send("PONG")
          case _ => () // +OK, INFO updates
        }
      } catch { case _: java.io.EOFException | _: java.net.SocketException => () }
    }, "graft-nats-reader")
    reader.setDaemon(true)
    reader.start()

    def toDF: DataFrame = stream.toDF().select(
      col("_2").cast("binary").as(Codecs.ValueCol),
      col("_1").as("__meta_subject"))

    def stop(): Unit = conn.close()
  }

  /** Publish each row's value to `subjectExpr` — executor-side, one
    * connection per partition. At-least-once, like the reference. */
  final case class NatsSink(host: String, port: Int, subjectExpr: String,
      valueExpr: String) extends Engine.BatchSink {
    def write(batch: DataFrame, batchId: Long): Unit = {
      val (h, p) = (host, port)
      batch.selectExpr(s"CAST(($subjectExpr) AS STRING) AS s",
          s"CAST(($valueExpr) AS STRING) AS v")
        .foreachPartition { (rows: Iterator[Row]) =>
          if (rows.nonEmpty) {
            val conn = new Conn(h, p)
            try rows.foreach(r => conn.publish(r.getString(0),
              r.getString(1).getBytes(StandardCharsets.UTF_8)))
            finally conn.close()
          }
        }
    }
  }
}
