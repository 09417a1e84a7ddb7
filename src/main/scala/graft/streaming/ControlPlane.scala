package graft.streaming

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQuery

/** Control-plane status API (SURVEY.md §2 server row; reference
  * crates/arkflow-server/src/lib.rs:183-208 — `/system`, `/streams`,
  * `/streams/{id}`, `/streams/{id}/stop`). The reference hub manages its
  * own node registry and rollout machinery; on Spark the cluster manager
  * already owns nodes, so the meaningful surface is the per-stream one:
  * Structured Streaming publishes `status` and `lastProgress` as JSON on
  * every [[StreamingQuery]], and this server exposes them over the same
  * embedded JDK HttpServer the HTTP input uses (no extra dependency).
  *
  * Routes (all JSON):
  *   - `GET  /system`            Spark version / app id / parallelism
  *   - `GET  /streams`           every active query: id, runId, name
  *   - `GET  /streams/{id}`      one query: status + lastProgress
  *     ({id} matches the query's name OR its UUID id)
  *   - `GET  /streams/{id}/exception`  failure details, answered for
  *     LIVE and TERMINATED queries (a failed query leaves `active`, so
  *     a listener records terminations)
  *   - `POST /streams/{id}/stop` stop that query
  *   - `POST /streams/{id}/start`   (re)start a stopped stream from its
  *     config (reference lib.rs:192 `start_stream`) — 202 on start,
  *     409 if already active, 404 if the id isn't in the config
  *   - `POST /streams/{id}/restart` stop if active, then start fresh
  *     under the same id; a configured checkpoint resumes progress
  *   - `POST /configuration/validate` (alias `/config/validate`) parse
  *     the request body as an engine YAML config — 200 `{"valid":true}`
  *     with stream ids, or 400 with the parse error (reference
  *     lib.rs:199 `validate_configuration`)
  *
  * Config management (reference lib.rs:205-213 `/config/apply`,
  * `/config/versions`, `/config/rollback/{id}`, `/configuration/diff`;
  * needs `versionDir` — a [[ConfigVersionStore]] path — else 503):
  *   - `POST /config/apply` (alias `/configuration/apply`) body = the
  *     new engine YAML. Validates (422 on parse error — the reference's
  *     UNPROCESSABLE_ENTITY), persists a content-addressed version,
  *     swaps the live lifecycle registry, restarts every ACTIVE managed
  *     stream under its new config and stops active streams the new
  *     config dropped — 202 with the version id + what moved. Streams
  *     not currently active just pick up the new config at their next
  *     `/streams/{id}/start`.
  *   - `GET  /config/versions` every stored version: id (the content
  *     digest), created_ms, bytes, active flag.
  *   - `POST /config/rollback/{id}` re-apply a stored version by id —
  *     the same restart semantics as apply; 404 for an unknown id.
  *   - `GET  /configuration/diff?from=ID&to=ID` `{"from","to","changed"}`
  *     — 404 when either version is missing.
  *
  * Lifecycle routes need the parsed config — pass `registry` (id ->
  * StreamConf, what [[graft.streaming.Main]] resolves via
  * [[Config.streamIds]]); without it they answer 404 and the server is
  * monitoring-only, the pre-round-5 surface.
  *
  * `GET /` / `GET /console` serve the embedded [[Console]] page (the
  * reference `console/` SPA, reduced to one dependency-free HTML file
  * over this same API) — unauthenticated, since it holds no data.
  *
  * Optional bearer auth mirrors [[HttpInput]]'s middleware.
  */
final class ControlPlane(spark: SparkSession, port: Int,
                         bearerToken: Option[String] = None,
                         registry: Seq[(String, StreamConf)] = Nil,
                         versionDir: Option[String] = None) {

  private val server = com.sun.net.httpserver.HttpServer.create(
    new java.net.InetSocketAddress("127.0.0.1", port), 0)

  // A failed query leaves streams.active, so failure details would be
  // unreachable the moment they matter; remember terminations (id ->
  // exception message, "" = clean stop; CHM forbids null values) via
  // the listener API. Delivery is async — a just-stopped query's record
  // can trail by a listener-bus tick.
  // both maps are BOUNDED (most recent 1000) — a long-lived service
  // cycling short queries must not leak a stack trace per termination
  private def boundedMap(): java.util.Map[String, String] =
    java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[String, String](16, 0.75f, false) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[String, String]): Boolean = size() > 1000
      })
  private val terminated = boundedMap()
  private val names = boundedMap()
  private val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
    override def onQueryStarted(
        e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit =
      Option(e.name).foreach(n => names.put(n, e.id.toString))
    override def onQueryProgress(
        e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit = ()
    override def onQueryTerminated(
        e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit =
      terminated.put(e.id.toString, e.exception.getOrElse(""))
  }
  spark.streams.addListener(listener)
  // queries started BEFORE this control plane existed never fired
  // onQueryStarted at it — seed their name -> id mapping now
  spark.streams.active.foreach(q =>
    Option(q.name).foreach(n => names.put(n, q.id.toString)))

  /** JSON string escaping for the few hand-built fields — control
    * characters included: exception bodies are multi-line stack traces,
    * and a raw newline inside a JSON string literal is unparseable.
    * (Quoted wrapper over the shared [[Codecs.jsonEscape]].) */
  private def js(s: String): String =
    "\"" + Codecs.jsonEscape(s) + "\""

  private def respond(ex: com.sun.net.httpserver.HttpExchange,
                      code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length.toLong)
    ex.getResponseBody.write(bytes)
  }

  private def find(id: String): Option[StreamingQuery] =
    spark.streams.active.find(q =>
      q.id.toString == id || Option(q.name).contains(id))

  // Serializes lifecycle MUTATIONS (start/restart/apply/rollback) now
  // that handlers run on a pool: two concurrent /start requests must not
  // both pass the "already active" check and start the stream twice.
  // Monitoring routes never take this lock, so a long batch start still
  // can't freeze them.
  private val lifecycleLock = new Object

  // the lifecycle registry is LIVE state once /config/apply exists —
  // apply/rollback swap it wholesale (under lifecycleLock; volatile so
  // monitoring-path reads see the latest applied config)
  @volatile private var liveRegistry: Seq[(String, StreamConf)] = registry

  private val versions = versionDir.map(d =>
    new ConfigVersionStore(d, spark.sparkContext.hadoopConfiguration))

  /** Start stream `id` from its registered config: 202 with the fresh
    * runId (the reference's Accepted lifecycle-operation response), or
    * 404 when the id has no config to resolve. Batch streams run once to
    * EOF inside the request (`"streaming":false`). */
  private def lifecycleStart(ex: com.sun.net.httpserver.HttpExchange,
      id: String): Unit =
    liveRegistry.find(_._1 == id) match {
      case Some((_, sc)) =>
        val q = Engine.runStream(spark, sc, id)
        respond(ex, 202, s"""{"id":${js(id)},"started":true,""" +
          s""""streaming":${q.isDefined},""" +
          s""""runId":${q.map(x => js(x.runId.toString)).getOrElse("null")}}""")
      case None => respond(ex, 404, """{"error":"no such stream in config"}""")
    }

  /** Shared apply/rollback body: validate, persist, swap the live
    * registry, restart active managed streams under the new config, stop
    * active streams the new config dropped. Returns the 202 JSON.
    * Callers hold `lifecycleLock`. Throws IllegalArgumentException on a
    * config that does not parse (mapped to 422). */
  private def applyConfig(store: ConfigVersionStore, yaml: String): String = {
    val conf = Config.fromYaml(yaml)
    val ids = Config.streamIds(conf)
    val id = store.save(yaml)
    store.setActive(id)
    val oldIds = liveRegistry.map(_._1)
    liveRegistry = ids.zip(conf.streams)
    // stop() blocks until termination, so names are free for the
    // restarts below; restart only streams that were RUNNING — inactive
    // ones pick the new config up at their next /start
    val dropped = oldIds.filterNot(ids.contains).filter(find(_).isDefined)
    dropped.foreach(d => find(d).foreach(_.stop()))
    // a stream whose config parses but fails to START (bad broker URL,
    // missing path...) must not abort the apply halfway — the version is
    // already active; report it under `failed` and keep going, the
    // operator fixes and re-applies or rolls back
    var failedIds = List.empty[String]
    val restarted = liveRegistry.filter { case (sid, _) => find(sid).isDefined }
      .flatMap { case (sid, sc) =>
        find(sid).foreach(_.stop())
        try { Engine.runStream(spark, sc, sid); Some(sid) }
        catch { case scala.util.control.NonFatal(e) =>
          System.err.println(s"[graft] config apply: stream $sid failed to restart: ${e.getMessage}")
          failedIds ::= sid; None
        }
      }
    s"""{"applied":true,"version":${js(id)},""" +
      s""""streams":${ids.map(js).mkString("[", ",", "]")},""" +
      s""""restarted":${restarted.map(js).mkString("[", ",", "]")},""" +
      s""""failed":${failedIds.sorted.map(js).mkString("[", ",", "]")},""" +
      s""""stopped":${dropped.map(js).mkString("[", ",", "]")}}"""
  }

  private def streamSummary(q: StreamingQuery): String =
    s"""{"id":${js(q.id.toString)},"runId":${js(q.runId.toString)},""" +
      s""""name":${Option(q.name).map(js).getOrElse("null")},"isActive":${q.isActive}}"""

  private def streamDetail(q: StreamingQuery): String =
    s"""{"id":${js(q.id.toString)},"name":${Option(q.name).map(js).getOrElse("null")},""" +
      s""""status":${q.status.json},""" +
      s""""lastProgress":${Option(q.lastProgress).map(_.json).getOrElse("null")}}"""

  server.createContext("/", { ex =>
    try {
      val authorized = bearerToken.forall { t =>
        Option(ex.getRequestHeaders.getFirst("Authorization"))
          .contains(s"Bearer $t")
      }
      val path = ex.getRequestURI.getPath
      val method = ex.getRequestMethod
      // the embedded console (reference console/ SPA): one static HTML
      // page, served UNAUTHENTICATED — it holds no data (the user types
      // the bearer token into it; every data fetch goes through the
      // authed JSON routes)
      if (method == "GET" && (path == "/" || path == "/console")) {
        val bytes = Console.Page.getBytes(StandardCharsets.UTF_8)
        ex.getResponseHeaders.set("Content-Type", "text/html; charset=utf-8")
        ex.sendResponseHeaders(200, bytes.length.toLong)
        ex.getResponseBody.write(bytes)
      }
      else if (!authorized) respond(ex, 401, """{"error":"unauthorized"}""")
      else (method, path) match {
        case ("GET", "/system") =>
          val sc = spark.sparkContext
          respond(ex, 200,
            s"""{"sparkVersion":${js(sc.version)},"appId":${js(sc.applicationId)},""" +
              s""""defaultParallelism":${sc.defaultParallelism},""" +
              s""""activeStreams":${spark.streams.active.length}}""")
        case ("GET", "/streams") =>
          respond(ex, 200,
            spark.streams.active.map(streamSummary).mkString("[", ",", "]"))
        case ("GET", s) if s.startsWith("/streams/") && s.endsWith("/exception") =>
          // reference GET /streams/{id} surfaces failure details; a live
          // query answers from its own state, a terminated one from the
          // listener's record (by id or by the name it started under)
          val key = s.stripPrefix("/streams/").stripSuffix("/exception")
          val id = Option(names.get(key)).getOrElse(key)
          find(key) match {
            case Some(q) => respond(ex, 200, q.exception match {
              case Some(e) => s"""{"failed":true,"message":${js(e.message)}}"""
              case None => """{"failed":false,"message":null}"""
            })
            case None if terminated.containsKey(id) =>
              terminated.get(id) match {
                case "" => respond(ex, 200, """{"failed":false,"message":null}""")
                case msg => respond(ex, 200, s"""{"failed":true,"message":${js(msg)}}""")
              }
            case None => respond(ex, 404, """{"error":"no such stream"}""")
          }
        case ("GET", s) if s.startsWith("/streams/") =>
          find(s.stripPrefix("/streams/")) match {
            case Some(q) => respond(ex, 200, streamDetail(q))
            case None => respond(ex, 404, """{"error":"no such stream"}""")
          }
        case ("POST", s) if s.startsWith("/streams/") && s.endsWith("/stop") =>
          find(s.stripPrefix("/streams/").stripSuffix("/stop")) match {
            case Some(q) => q.stop(); respond(ex, 200, """{"stopped":true}""")
            case None => respond(ex, 404, """{"error":"no such stream"}""")
          }
        case ("POST", s) if s.startsWith("/streams/") && s.endsWith("/start") =>
          val id = s.stripPrefix("/streams/").stripSuffix("/start")
          lifecycleLock.synchronized {
            if (find(id).isDefined)
              respond(ex, 409, """{"error":"stream already active"}""")
            else lifecycleStart(ex, id)
          }
        case ("POST", s) if s.startsWith("/streams/") && s.endsWith("/restart") =>
          val id = s.stripPrefix("/streams/").stripSuffix("/restart")
          if (liveRegistry.exists(_._1 == id)) lifecycleLock.synchronized {
            // stop() blocks until termination, so the query name is free
            // for the fresh start below
            find(id).foreach(_.stop())
            lifecycleStart(ex, id)
          } else respond(ex, 404, """{"error":"no such stream in config"}""")
        case ("POST", "/config/apply") | ("POST", "/configuration/apply") =>
          versions match {
            case None => respond(ex, 503, """{"error":"no version store configured"}""")
            case Some(store) =>
              val body = new String(ex.getRequestBody.readAllBytes(),
                StandardCharsets.UTF_8)
              try lifecycleLock.synchronized {
                respond(ex, 202, applyConfig(store, body))
              } catch {
                case scala.util.control.NonFatal(e) =>
                  // the reference's UNPROCESSABLE_ENTITY apply failure
                  respond(ex, 422, s"""{"applied":false,"error":${js(
                    Option(e.getMessage).getOrElse(e.getClass.getName))}}""")
              }
          }
        case ("GET", "/config/versions") | ("GET", "/configuration/versions") =>
          versions match {
            case None => respond(ex, 503, """{"error":"no version store configured"}""")
            case Some(store) => respond(ex, 200, store.list().map(r =>
              s"""{"id":${js(r.id)},"created_ms":${r.createdMs},""" +
                s""""bytes":${r.bytes},"active":${r.active}}""")
              .mkString("[", ",", "]"))
          }
        case ("POST", s) if s.startsWith("/config/rollback/") ||
            s.startsWith("/configuration/rollback/") =>
          versions match {
            case None => respond(ex, 503, """{"error":"no version store configured"}""")
            case Some(store) =>
              val id = s.substring(s.lastIndexOf('/') + 1)
              store.load(id) match {
                case None => respond(ex, 404,
                  s"""{"error":"no such configuration version","id":${js(id)}}""")
                case Some(yaml) =>
                  try lifecycleLock.synchronized {
                    respond(ex, 202, applyConfig(store, yaml))
                  } catch {
                    case scala.util.control.NonFatal(e) =>
                      respond(ex, 422, s"""{"applied":false,"error":${js(
                        Option(e.getMessage).getOrElse(e.getClass.getName))}}""")
                  }
              }
          }
        case ("GET", "/configuration/diff") =>
          versions match {
            case None => respond(ex, 503, """{"error":"no version store configured"}""")
            case Some(store) =>
              val q = Option(ex.getRequestURI.getQuery).getOrElse("")
              val params = q.split("&").flatMap(_.split("=", 2) match {
                case Array(k, v) => Some(k -> java.net.URLDecoder.decode(v, "UTF-8"))
                case _ => None
              }).toMap
              (params.get("from").flatMap(store.load),
                params.get("to").flatMap(store.load)) match {
                case (Some(f), Some(t)) => respond(ex, 200,
                  s"""{"from":${js(params("from"))},"to":${js(params("to"))},""" +
                    s""""changed":${f != t}}""")
                case _ => respond(ex, 404,
                  """{"error":"configuration version not found"}""")
              }
          }
        case ("POST", "/configuration/validate") | ("POST", "/config/validate") =>
          val body = new String(ex.getRequestBody.readAllBytes(),
            StandardCharsets.UTF_8)
          try {
            val conf = Config.fromYaml(body)
            val ids = Config.streamIds(conf)
            respond(ex, 200, s"""{"valid":true,"streams":${ids.map(js)
              .mkString("[", ",", "]")}}""")
          } catch {
            case scala.util.control.NonFatal(e) =>
              respond(ex, 400, s"""{"valid":false,"error":${js(
                Option(e.getMessage).getOrElse(e.getClass.getName))}}""")
          }
        case _ => respond(ex, 404, """{"error":"not found"}""")
      }
    } catch {
      // q.stop() can throw (e.g. TimeoutException past
      // spark.sql.streaming.stopTimeout); without this the exchange closes
      // with no response and the client sees a dropped connection.
      case scala.util.control.NonFatal(e) =>
        // best-effort: if headers were already sent, a second respond throws
        try respond(ex, 500,
          s"""{"error":${js(Option(e.getMessage).getOrElse(e.getClass.getName))}}""")
        catch { case scala.util.control.NonFatal(_) => () }
    } finally ex.close()
  })
  // A small pool, not the single dispatcher thread: lifecycleStart runs
  // batch streams to EOF inside the handler, and with setExecutor(null)
  // one long batch /start (or restart's blocking stop()) would freeze
  // every monitoring route for its full duration.
  private val pool = java.util.concurrent.Executors.newFixedThreadPool(
    4,
    (r: Runnable) => {
      val t = new Thread(r, "graft-control-plane")
      t.setDaemon(true)
      t
    })
  server.setExecutor(pool)
  server.start()

  def boundPort: Int = server.getAddress.getPort

  def stop(): Unit = {
    spark.streams.removeListener(listener)
    server.stop(0)
    // HttpServer.stop does NOT stop a user-supplied executor — without
    // this, every ControlPlane instance leaks its 4 pool threads
    pool.shutdown()
  }
}
