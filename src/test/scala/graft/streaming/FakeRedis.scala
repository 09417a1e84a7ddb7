package graft.streaming

import java.io.{BufferedInputStream, BufferedOutputStream}
import java.nio.charset.StandardCharsets

/** In-memory RESP2 server shared by the redis specs:
  * SET/GET/MGET/LPUSH/LPOP/LRANGE/PUBLISH — enough surface for the
  * sink, the poll input, and both temporary-lookup dialects. */
final class FakeRedis {
  val strings = new scala.collection.concurrent.TrieMap[String, String]()
  val mgetCalls = new java.util.concurrent.atomic.AtomicInteger()
  /** SELECTed db indexes and AUTH arg lists, in arrival order — the specs
    * assert the client SENT them (single shared keyspace otherwise). */
  val selects = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
  val auths = new java.util.concurrent.ConcurrentLinkedQueue[Seq[String]]()
  val lists = new scala.collection.concurrent.TrieMap[String, scala.collection.mutable.ListBuffer[String]]()
  val published = new java.util.concurrent.ConcurrentLinkedQueue[(String, String)]()
  private val server = new java.net.ServerSocket(0, 16,
    java.net.InetAddress.getByName("127.0.0.1"))
  val port: Int = server.getLocalPort
  @volatile private var running = true

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
    def reply(str: String): Unit = { out.write(str.getBytes(StandardCharsets.UTF_8)); out.flush() }
    def bulk(v: String): String = if (v == null) "$-1\r\n" else s"$$${v.getBytes(StandardCharsets.UTF_8).length}\r\n$v\r\n"
    try while (true) {
      val first = line()
      val nArgs = first.stripPrefix("*").toInt
      val args = (0 until nArgs).map { _ => line(); line() }
      args.head.toUpperCase match {
        case "SET" => strings.put(args(1), args(2)); reply("+OK\r\n")
        case "GET" => reply(bulk(strings.get(args(1)).orNull))
        case "MGET" =>
          mgetCalls.incrementAndGet()
          reply(s"*${args.size - 1}\r\n" +
            args.tail.map(k => bulk(strings.get(k).orNull)).mkString)
        case "LPUSH" =>
          val l = lists.getOrElseUpdate(args(1), scala.collection.mutable.ListBuffer())
          l.synchronized { args.drop(2).foreach(_ +=: l) }
          reply(s":${l.size}\r\n")
        case "LPOP" =>
          val l = lists.getOrElse(args(1), scala.collection.mutable.ListBuffer())
          val v = l.synchronized { if (l.isEmpty) null else l.remove(0) }
          reply(bulk(v))
        case "LRANGE" =>
          val l = lists.getOrElse(args(1), scala.collection.mutable.ListBuffer())
          val snap = l.synchronized { l.toList }
          val from = args(2).toInt
          val toRaw = args(3).toInt
          val to = if (toRaw < 0) snap.size + toRaw else math.min(toRaw, snap.size - 1)
          val slice = if (snap.isEmpty || from > to) Nil else snap.slice(from, to + 1)
          reply(s"*${slice.size}\r\n" + slice.map(bulk).mkString)
        case "PUBLISH" => published.add((args(1), args(2))); reply(":0\r\n")
        case "SELECT" => selects.add(args(1).toInt); reply("+OK\r\n")
        case "AUTH" => auths.add(args.tail.toSeq); reply("+OK\r\n")
        case other => reply(s"-ERR unknown command '$other'\r\n")
      }
    } catch { case _: java.io.EOFException | _: java.net.SocketException => () }
    finally s.close()
  }

  private val acceptor = new Thread(() => {
    try while (running) {
      val s = server.accept()
      val t = new Thread(() => handle(s)); t.setDaemon(true); t.start()
    } catch { case _: java.net.SocketException => () }
  }, "graft-fake-redis")
  acceptor.setDaemon(true); acceptor.start()

  def stop(): Unit = { running = false; server.close() }
}
