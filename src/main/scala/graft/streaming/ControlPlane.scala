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
  *   - `GET  /status`            EngineStatus rollup — version / state /
  *     uptime_seconds / streams_total / running / failed (reference
  *     lib.rs:187, control.rs:254-261): the first thing a dashboard polls
  *   - `GET  /node` / `GET /nodes` the single-node NodeResource and its
  *     one-element page (reference lib.rs:188-189) — the degenerate
  *     standalone form; the multi-node hub/agent registry stays mapped
  *     to the cluster manager (below)
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
  *   - `GET  /configuration` (alias `/config`) the ACTIVE version's id +
  *     YAML (reference lib.rs:199/209 `configuration`) — 404 before any
  *     apply, 503 without a version store.
  *   - `GET/PUT /configuration/draft` (reference lib.rs:202-203) the
  *     work-in-progress scratchpad: PUT stores the body durably in the
  *     version store (unversioned until applied); GET answers the saved
  *     draft or 204 when none exists.
  *
  * Observability (reference lib.rs:214-224; all UNAUTHENTICATED like the
  * reference's health router — k8s probes and Prometheus scrapers do not
  * carry bearer tokens):
  *   - `GET /metrics` Prometheus text exposition (v0.0.4): per active
  *     stream from `lastProgress` (input/processed rows/s, cumulative
  *     input rows, batch duration, state-store rows/bytes), control-plane
  *     start counts, and every [[graft.functions.CapCountIf]] drop
  *     counter as `graft_cap_dropped_rows_total{label=...}` — the
  *     bounded-with-observable-drops operators' scrape path.
  *   - `GET /health`    200 while the SparkContext is up, else 503.
  *   - `GET /readiness` 200 while the context is up AND no active query
  *     is sitting on an exception, else 503.
  *   - `GET /liveness`  always 200 (the process answers).
  *
  * Registry introspection (reference lib.rs:214-216; unauthenticated —
  * the registries are compile-time constants, not data):
  *   - `GET /components` every registered component as
  *     `{"kind","name"}`; `GET /components/{kind}/{name}` one of them,
  *     404 for unknown kind or name.
  *   - `GET /schema` a JSON-Schema-shaped description of the engine YAML
  *     (streams / input / pipeline.processors / output / error_output /
  *     buffer / http), component `type` enums taken LIVE from the same
  *     registries the builders dispatch on.
  *
  * Operations + events (reference lib.rs:195-198; authenticated):
  *   - `GET /operations[?resource_id=&operation=&state=]` every recorded
  *     lifecycle/config operation, newest first; `GET /operations/{id}`
  *     one record; `DELETE /operations/{id}` the reference's cancel —
  *     this engine runs lifecycle operations synchronously inside the
  *     request, so cancel always finds a TERMINAL record and returns it
  *     unchanged (404 for an unknown id).
  *   - `GET /events[?event_type=&stream_id=]` the event ring (bounded
  *     1000): query_started / query_terminated / query_failed from the
  *     listener, stream_started / stream_stopped / config_applied /
  *     config_rollback from the lifecycle + config routes.
  *   - `GET /audit[?actor=&resource_id=&operation=&state=]` the
  *     actor-stamped mutation log (reference lib.rs:298, degenerate
  *     single-node form): every apply / rollback / draft save /
  *     lifecycle mutation with WHO did it — the bearer-token
  *     fingerprint, or "anonymous" without auth — newest first,
  *     reference pagination shape, bounded ring of 1000.
  *   - `GET /events/stream` the same ring as a Server-Sent-Events live
  *     tail (reference lib.rs:297) — `id:`-stamped frames, resumable
  *     via Last-Event-ID / `?last_id=`, windowed ~25 s per connection
  *     with `retry:`-driven reconnect, capped at 2 concurrent tails
  *     (429 beyond — each tail holds a handler thread, and probes must
  *     always find a free one); the console tails it with a poll
  *     fallback.
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
  // cycling short queries must not leak a stack trace per termination.
  // `lru = true` evicts by ACCESS order (LinkedHashMap accessOrder;
  // put/get/merge refresh position) — the metrics counters use it so a
  // hot stream that reports every batch can never be the one evicted;
  // the termination/name records keep insertion order (a terminated
  // query's record is never "refreshed", oldest-first is correct).
  private def boundedMap[V](lru: Boolean = false): java.util.Map[String, V] =
    java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[String, V](16, 0.75f, lru) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[String, V]): Boolean = size() > 1000
      })
  private val terminated = boundedMap[String]()
  private val names = boundedMap[String]()

  // ---- events + operations (reference lib.rs:195-198) -------------------
  // Both logs are BOUNDED rings (most recent 1000) for the same reason
  // the termination maps are: a long-lived service must not grow a record
  // per lifecycle call forever.
  import ControlPlane.{AuditRec, Event, OpRec}
  private val eventSeq = new java.util.concurrent.atomic.AtomicLong(0)
  private val opSeq = new java.util.concurrent.atomic.AtomicLong(0)
  private val auditSeq = new java.util.concurrent.atomic.AtomicLong(0)
  private val events = new java.util.ArrayDeque[Event]()
  private val operations = new java.util.ArrayDeque[OpRec]()
  private val audits = new java.util.ArrayDeque[AuditRec]()
  // package-private so the SSE churn spec can drive >ring-bound event
  // volumes through an OPEN tail without 1100 real stream lifecycles
  private[streaming] def recordEvent(eventType: String,
      streamId: Option[String], message: String): Unit = events.synchronized {
    events.addFirst(Event(eventSeq.incrementAndGet(), eventType, streamId,
      System.currentTimeMillis(), message))
    while (events.size > 1000) { events.removeLast(); () }
  }

  // The acting identity for the CURRENT request, stamped onto audit
  // records (reference lib.rs:298 /audit — who applied/rolled back what,
  // when). With bearer auth configured the actor is a stable NON-SECRET
  // token fingerprint (sha-256 prefix — the reference logs principal
  // names; a single-token deployment has only the token itself to name);
  // without auth every mutation is "anonymous". Thread-bound: handlers
  // run the whole request on one pool thread, and every recordOp call
  // site sits synchronously inside its request.
  private val tokenActor: String = bearerToken.map { t =>
    val d = java.security.MessageDigest.getInstance("SHA-256")
      .digest(t.getBytes(StandardCharsets.UTF_8))
    "bearer:" + d.take(4).map(b => f"$b%02x").mkString
  }.getOrElse("anonymous")
  private val currentActor = new scala.util.DynamicVariable[String]("system")

  /** Append an actor-stamped `/audit` record (bounded ring, newest
    * first, same 1000-entry policy as events/operations). */
  private def recordAudit(resourceId: String, operation: String,
      state: String, detail: String): Unit = {
    val rec = AuditRec(s"audit-${auditSeq.incrementAndGet()}",
      currentActor.value, resourceId, operation, state,
      System.currentTimeMillis(), detail)
    audits.synchronized {
      audits.addFirst(rec)
      while (audits.size > 1000) { audits.removeLast(); () }
    }
  }

  /** Record a completed lifecycle/config operation (this engine runs them
    * synchronously inside the request, so every record is terminal).
    * Every operation also lands in the `/audit` ring with the acting
    * identity — the ops ring holds everything BUT the actor. */
  private def recordOp(resourceId: String, operation: String,
      state: String, detail: String): String = {
    val id = s"op-${opSeq.incrementAndGet()}"
    operations.synchronized {
      operations.addFirst(OpRec(id, resourceId, operation, state,
        System.currentTimeMillis(), detail))
      while (operations.size > 1000) { operations.removeLast(); () }
    }
    recordAudit(resourceId, operation, state, detail)
    id
  }

  // cumulative input rows per stream (by display name), accumulated from
  // progress events — the reference's input_messages counter analogue;
  // bounded like the other per-stream maps but ACCESS-ordered: every
  // merge() refreshes position, so past 1000 names the evicted series
  // is the genuinely idle one, never a hot stream mid-report
  private val rowsTotal = boundedMap[java.lang.Long](lru = true)
  // control-plane (re)starts per stream id — /metrics' restarts counter
  private val startCounts = boundedMap[java.lang.Long](lru = true)

  private val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
    override def onQueryStarted(
        e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = {
      Option(e.name).foreach(n => names.put(n, e.id.toString))
      recordEvent("query_started", Option(e.name), e.id.toString)
    }
    override def onQueryProgress(
        e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit = {
      val key = Option(e.progress.name).getOrElse(e.progress.id.toString)
      rowsTotal.merge(key, e.progress.numInputRows,
        (a, b) => java.lang.Long.valueOf(a.longValue + b.longValue))
      ()
    }
    override def onQueryTerminated(
        e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = {
      val exc = e.exception.getOrElse("")
      terminated.put(e.id.toString, exc)
      // recover the stream NAME from the started-event record so
      // `/events?stream_id=...` — the operator's natural per-stream
      // query — surfaces failures, not just starts
      val sid = names.synchronized {
        import scala.jdk.CollectionConverters._
        names.asScala.collectFirst {
          case (n, id) if id == e.id.toString => n }
      }
      if (exc.isEmpty) recordEvent("query_terminated", sid, e.id.toString)
      else recordEvent("query_failed", sid,
        s"${e.id}: ${exc.linesIterator.nextOption().getOrElse("")}")
    }
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

  // /events/stream holds its handler thread for the connection window,
  // so unbounded tails could starve every route on the shared pool —
  // including the k8s probes. Capped at 2 concurrent tails (429 beyond;
  // the console falls back to polling), leaving ≥4 pool threads free.
  private val sseActive = new java.util.concurrent.atomic.AtomicInteger(0)
  private[streaming] def activeEventStreams: Int = sseActive.get

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
    * EOF inside the request (`"streaming":false`). `op` labels the
    * operation record ("start" vs "restart"). */
  private def lifecycleStart(ex: com.sun.net.httpserver.HttpExchange,
      id: String, op: String): Unit =
    liveRegistry.find(_._1 == id) match {
      case Some((_, sc)) =>
        // a start that THROWS (bad broker URL, missing path, ...) must
        // leave the same durable trail a failed config apply leaves —
        // an /operations record in state "failed" plus a stream event —
        // not just the generic 500 (round-15 ADVICE)
        val q = try Engine.runStream(spark, sc, id)
        catch {
          case scala.util.control.NonFatal(e) =>
            val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
            recordEvent("stream_failed", Some(id), s"$op failed: $msg")
            val opId = recordOp(id, op, "failed", msg)
            respond(ex, 500, s"""{"id":${js(id)},"started":false,""" +
              s""""operation":${js(opId)},"error":${js(msg)}}""")
            return
        }
        startCounts.merge(id, 1L,
          (a, b) => java.lang.Long.valueOf(a.longValue + b.longValue))
        recordEvent("stream_started", Some(id),
          q.map(_.runId.toString).getOrElse("batch run to EOF"))
        val opId = recordOp(id, op, "succeeded",
          q.map(_.runId.toString).getOrElse("batch"))
        respond(ex, 202, s"""{"id":${js(id)},"started":true,""" +
          s""""operation":${js(opId)},""" +
          s""""streaming":${q.isDefined},""" +
          s""""runId":${q.map(x => js(x.runId.toString)).getOrElse("null")}}""")
      case None => respond(ex, 404, """{"error":"no such stream in config"}""")
    }

  /** Shared apply/rollback body: validate, persist, swap the live
    * registry, restart active managed streams under the new config, stop
    * active streams the new config dropped. Returns the 202 JSON.
    * Callers hold `lifecycleLock`. Throws IllegalArgumentException on a
    * config that does not parse (mapped to 422). `op` labels the
    * operation/event records ("apply" vs "rollback"). */
  private def applyConfig(store: ConfigVersionStore, yaml: String,
      op: String): String = {
    val conf = Config.fromYaml(yaml)
    val ids = Config.streamIds(conf)
    val id = store.save(yaml)
    store.setActive(id)
    val oldIds = liveRegistry.map(_._1)
    liveRegistry = ids.zip(conf.streams)
    // stop() blocks until termination, so names are free for the
    // restarts below; restart only streams that were RUNNING — inactive
    // ones pick the new config up at their next /start
    // a stream whose config parses but fails to STOP (e.g. a
    // TimeoutException past spark.sql.streaming.stopTimeout) or fails to
    // START (bad broker URL, missing path...) must not abort the apply
    // halfway — the version is already active and the registry swapped,
    // so answering 422 here would make the client's view diverge from
    // server state; report it under `failed` and keep going, the
    // operator fixes and re-applies or rolls back
    var failedIds = List.empty[String]
    def safeStop(sid: String): Boolean =
      find(sid).forall { q =>
        try { q.stop(); true }
        catch { case scala.util.control.NonFatal(e) =>
          System.err.println(s"[graft] config apply: stream $sid failed to stop: ${e.getMessage}")
          failedIds ::= sid; false
        }
      }
    // only streams whose stop() actually SUCCEEDED are reported stopped —
    // a stream that would not stop is still running under the old config
    // and belongs in `failed`, not `stopped`
    val stopped = oldIds.filterNot(ids.contains).filter(find(_).isDefined)
      .filter(safeStop)
    stopped.foreach(d =>
      recordEvent("stream_stopped", Some(d), s"dropped by config $op"))
    val restarted = liveRegistry.filter { case (sid, _) => find(sid).isDefined }
      .flatMap { case (sid, sc) =>
        // a stream that would not stop keeps its OLD config running —
        // starting a same-named twin beside it would throw anyway
        if (!safeStop(sid)) None
        else try {
          Engine.runStream(spark, sc, sid)
          startCounts.merge(sid, 1L,
            (a, b) => java.lang.Long.valueOf(a.longValue + b.longValue))
          recordEvent("stream_started", Some(sid), s"restarted by config $op")
          Some(sid)
        }
        catch { case scala.util.control.NonFatal(e) =>
          System.err.println(s"[graft] config apply: stream $sid failed to restart: ${e.getMessage}")
          failedIds ::= sid; None
        }
      }
    recordEvent(if (op == "apply") "config_applied" else "config_rollback",
      None, id)
    // a partial failure must be durable past the HTTP response: the
    // operation record carries state "failed" with the affected ids so
    // `/operations?state=failed` surfaces it later
    val failed = failedIds.distinct.sorted
    recordOp("configuration", op,
      if (failed.isEmpty) "succeeded" else "failed",
      if (failed.isEmpty) id else s"$id; streams failed: ${failed.mkString(",")}")
    s"""{"applied":true,"version":${js(id)},""" +
      s""""streams":${ids.map(js).mkString("[", ",", "]")},""" +
      s""""restarted":${restarted.map(js).mkString("[", ",", "]")},""" +
      s""""failed":${failed.map(js).mkString("[", ",", "]")},""" +
      s""""stopped":${stopped.map(js).mkString("[", ",", "]")}}"""
  }

  private val startedAtMs = System.currentTimeMillis()

  /** The `/status` EngineStatus rollup (reference lib.rs:187,
    * control.rs:254-261 — version/state/uptime/streams counts): the
    * first thing a dashboard polls. `streams_total` counts every stream
    * the server knows of (registered configs ∪ active queries);
    * `streams_failed` counts active queries sitting on an exception
    * PLUS registered streams whose last termination was a failure —
    * the reference's Failed stream state analogue. */
  private def engineStatus(): (String, Long, Int, Int, Int) = {
    val active = spark.streams.active
    val failedActive = active.count(_.exception.isDefined)
    val registryIds = liveRegistry.map(_._1)
    val inactiveFailed = registryIds
      .filterNot(id => find(id).isDefined)
      .count(id => Option(names.get(id))
        .flatMap(qid => Option(terminated.get(qid))).exists(_.nonEmpty))
    val total = (registryIds ++ active.flatMap(q =>
      Option(q.name).orElse(Some(q.id.toString)))).distinct.size
    val state = if (spark.sparkContext.isStopped) "stopped" else "running"
    (state, (System.currentTimeMillis() - startedAtMs) / 1000,
      total, active.length - failedActive, failedActive + inactiveFailed)
  }

  private def statusJson(): String = {
    val (state, up, total, running, failed) = engineStatus()
    s"""{"version":${js(spark.sparkContext.version)},"state":${js(state)},""" +
      s""""uptime_seconds":$up,"streams_total":$total,""" +
      s""""streams_running":$running,"streams_failed":$failed}"""
  }

  /** The single-node `/node` resource (reference lib.rs:188,
    * control.rs:200-211 NodeResource — the degenerate standalone form;
    * the multi-node hub registry stays mapped to the cluster manager,
    * see the class doc). */
  private def nodeJson(): String = {
    val (state, up, total, running, failed) = engineStatus()
    s"""{"id":${js(spark.sparkContext.applicationId)},"role":"standalone",""" +
      s""""version":${js(spark.sparkContext.version)},"state":${js(state)},""" +
      s""""uptime_seconds":$up,""" +
      s""""capabilities":["stream_runtime","local_configuration"],""" +
      s""""streams_total":$total,"streams_running":$running,""" +
      s""""streams_failed":$failed,"maintenance_state":"active"}"""
  }

  /** The registered component chain for a stream id — the console's
    * per-stream pipeline column (`input -> processors... -> output`). */
  private def pipelineOf(name: String): Option[String] =
    liveRegistry.find(_._1 == name).map { case (_, sc) =>
      (sc.input.kind +: sc.processors.map(_.kind) :+ sc.output.kind)
        .mkString(" -> ")
    }

  private def streamSummary(q: StreamingQuery): String = {
    val pipe = Option(q.name).flatMap(pipelineOf)
    s"""{"id":${js(q.id.toString)},"runId":${js(q.runId.toString)},""" +
      s""""name":${Option(q.name).map(js).getOrElse("null")},"isActive":${q.isActive},""" +
      s""""pipeline":${pipe.map(js).getOrElse("null")}}"""
  }

  private def streamDetail(q: StreamingQuery): String =
    s"""{"id":${js(q.id.toString)},"name":${Option(q.name).map(js).getOrElse("null")},""" +
      s""""status":${q.status.json},""" +
      s""""lastProgress":${Option(q.lastProgress).map(_.json).getOrElse("null")}}"""

  private def qparams(ex: com.sun.net.httpserver.HttpExchange): Map[String, String] =
    Option(ex.getRequestURI.getQuery).getOrElse("")
      .split("&").flatMap(_.split("=", 2) match {
        case Array(k, v) => Some(k -> java.net.URLDecoder.decode(v, "UTF-8"))
        case _ => None
      }).toMap

  /** Reference pagination shape: `page` ≥ 1, `page_size` clamped to
    * [1, 100], default 50 (lib.rs operations/events handlers). */
  private def pageParams(params: Map[String, String]): (Int, Int) = {
    def int(k: String, dflt: Int) =
      params.get(k).flatMap(_.toIntOption).getOrElse(dflt)
    (math.max(1, int("page", 1)), math.min(100, math.max(1, int("page_size", 50))))
  }

  private def opJson(o: OpRec): String =
    s"""{"id":${js(o.id)},"resource_id":${js(o.resourceId)},""" +
      s""""operation":${js(o.operation)},"state":${js(o.state)},""" +
      s""""occurred_at_ms":${o.occurredAtMs},"detail":${js(o.detail)}}"""

  private def auditJson(a: AuditRec): String =
    s"""{"id":${js(a.id)},"actor":${js(a.actor)},""" +
      s""""resource_id":${js(a.resourceId)},"operation":${js(a.operation)},""" +
      s""""state":${js(a.state)},"occurred_at_ms":${a.occurredAtMs},""" +
      s""""detail":${js(a.detail)}}"""

  private def eventJson(e: Event): String =
    s"""{"id":${e.id},"event_type":${js(e.eventType)},""" +
      s""""stream_id":${e.streamId.map(js).getOrElse("null")},""" +
      s""""occurred_at_ms":${e.occurredAtMs},"message":${js(e.message)}}"""

  // Prometheus label-value escaping (exposition format: backslash, quote
  // and newline must be escaped inside label values)
  private def promLabel(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"").replace("\n", "\\n")

  /** Prometheus text exposition (format v0.0.4) of per-stream progress,
    * control-plane start counts, and the CapCountIf drop counters. The
    * numbers come from `lastProgress` / the listener — Structured
    * Streaming already measures them; this is the scrape path. Samples
    * are GROUPED per metric name under one HELP/TYPE header (the
    * exposition format requires all lines of a metric in a single
    * group — a naive per-stream loop would interleave names).
    *
    * The two `_total` counters live in an LRU bounded at 1000 distinct
    * stream names (round-15 ADVICE): past that, a least-recently-
    * updated series is evicted and RESTARTS FROM ZERO if its stream
    * reports again — scrapers treat the decrease as a counter reset
    * (rate()/increase() already do), and the HELP text says so. */
  private val metricMeta: Seq[(String, String, String)] = Seq(
    ("graft_streams_active", "gauge",
      "Number of active streaming queries."),
    ("graft_stream_batch_id", "gauge",
      "Latest micro-batch id per stream."),
    ("graft_stream_input_rows_per_second", "gauge",
      "Input rate from the latest progress event."),
    ("graft_stream_processed_rows_per_second", "gauge",
      "Processing rate from the latest progress event."),
    ("graft_stream_batch_duration_ms", "gauge",
      "triggerExecution duration of the latest micro-batch."),
    ("graft_stream_state_rows", "gauge",
      "Total state-store rows across the stream's stateful operators."),
    ("graft_stream_state_bytes", "gauge",
      "State-store memory bytes across the stream's stateful operators."),
    ("graft_stream_input_rows_total", "counter",
      "Cumulative input rows per stream; bounded registry (1000 " +
        "streams) - an evicted series restarts from 0 (treat decreases " +
        "as counter resets)."),
    ("graft_stream_starts_total", "counter",
      "Control-plane (re)starts per stream; bounded registry (1000 " +
        "streams) - an evicted series restarts from 0 (treat decreases " +
        "as counter resets)."),
    ("graft_cap_dropped_rows_total", "counter",
      "Rows discarded by bounded-operator caps (CapCountIf " +
        "accumulators); task retries can over-count - an order-of-" +
        "magnitude ops signal, not an exact ledger."),
    ("graft_bucket_cap_last_dropped", "gauge",
      "Bucket members dropped by the LSH bucket cap in the LAST " +
        "capped run per label (observe-based)."))

  private def metricsBody(): String = {
    def num(d: Double): String =
      if (d.isNaN || d.isInfinite) "0"
      else if (d == math.rint(d) && math.abs(d) < 1e15) d.toLong.toString
      else d.toString
    val samples = scala.collection.mutable.LinkedHashMap
      .empty[String, scala.collection.mutable.ListBuffer[String]]
    def add(metric: String, labels: String, v: String): Unit = {
      samples.getOrElseUpdate(metric,
        scala.collection.mutable.ListBuffer.empty) += s"$metric$labels $v"
      ()
    }
    def sid(s: String): String = "{stream_id=\"" + promLabel(s) + "\"}"
    val active = spark.streams.active
    add("graft_streams_active", "", active.length.toString)
    for (q <- active) {
      val name = Option(q.name).getOrElse(q.id.toString)
      for (p <- Option(q.lastProgress)) {
        add("graft_stream_batch_id", sid(name), p.batchId.toString)
        add("graft_stream_input_rows_per_second", sid(name),
          num(p.inputRowsPerSecond))
        add("graft_stream_processed_rows_per_second", sid(name),
          num(p.processedRowsPerSecond))
        for (ms <- Option(p.durationMs.get("triggerExecution")))
          add("graft_stream_batch_duration_ms", sid(name), ms.toString)
        val st = p.stateOperators
        if (st.nonEmpty) {
          add("graft_stream_state_rows", sid(name),
            st.map(_.numRowsTotal).sum.toString)
          add("graft_stream_state_bytes", sid(name),
            st.map(_.memoryUsedBytes).sum.toString)
        }
      }
    }
    rowsTotal.synchronized {
      rowsTotal.forEach((k, v) =>
        add("graft_stream_input_rows_total", sid(k), v.toString))
    }
    startCounts.synchronized {
      startCounts.forEach((k, v) =>
        add("graft_stream_starts_total", sid(k), v.toString))
    }
    // the bounded pair-join operators' drop counters (CapCountIf
    // accumulators) — "observable drops", operationally — and the
    // observe-based LSH bucket caps (last observation per label)
    for ((label, n) <- graft.functions.CapCountIf.all())
      add("graft_cap_dropped_rows_total",
        "{label=\"" + promLabel(label) + "\"}", n.toString)
    for ((label, n) <- graft.operators.Dedup.CapStats.all())
      add("graft_bucket_cap_last_dropped",
        "{label=\"" + promLabel(label) + "\"}", n.toString)
    val sb = new StringBuilder
    for ((name, typ, help) <- metricMeta; lines <- samples.get(name)) {
      sb.append("# HELP ").append(name).append(' ').append(help).append('\n')
      sb.append("# TYPE ").append(name).append(' ').append(typ).append('\n')
      lines.foreach(l => { sb.append(l).append('\n'); () })
    }
    // a metric added without a metricMeta row must still expose
    // (untyped) rather than silently vanish from the scrape
    val known = metricMeta.map(_._1).toSet
    for ((name, lines) <- samples if !known.contains(name))
      lines.foreach(l => { sb.append(l).append('\n'); () })
    sb.toString
  }

  /** JSON-Schema-shaped description of the engine YAML; component `type`
    * enums come LIVE from the registries (reference lib.rs:216 /schema,
    * component::build_config_schema). */
  private lazy val schemaJson: String = {
    def enumOf(kind: String) =
      Engine.componentRegistry(kind).map(js).mkString("[", ",", "]")
    def comp(kind: String) =
      s"""{"type":"object","required":["type"],"properties":{"type":""" +
        s"""{"type":"string","enum":${enumOf(kind)}}},"additionalProperties":true}"""
    s"""{"$$schema":"https://json-schema.org/draft/2020-12/schema",""" +
      s""""title":"graft engine config","type":"object","required":["streams"],""" +
      s""""properties":{"streams":{"type":"array","items":{"type":"object",""" +
      s""""required":["input","output"],"properties":{""" +
      s""""id":{"type":"string","pattern":"^[A-Za-z0-9._-]+$$"},""" +
      s""""input":${comp("input")},""" +
      s""""pipeline":{"type":"object","properties":{"processors":""" +
      s"""{"type":"array","items":${comp("processor")}}}},""" +
      s""""output":${comp("output")},"error_output":${comp("output")},""" +
      s""""buffer":${comp("buffer")},"durability":{"type":"object"},""" +
      s""""temporary":{"type":"array"}}}},""" +
      s""""http":{"type":"object","properties":{"port":{"type":"integer"},""" +
      s""""bearer_token":{"type":"string"},"version_dir":{"type":"string"}}}}}"""
  }

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
      // observability + registry introspection serve UNAUTHENTICATED
      // (reference health router / components handlers take no auth):
      // k8s probes and Prometheus scrapers carry no bearer token, and
      // the registries are compile-time constants, not data
      else if (method == "GET" && path == "/metrics") {
        val bytes = metricsBody().getBytes(StandardCharsets.UTF_8)
        ex.getResponseHeaders.set("Content-Type", "text/plain; version=0.0.4")
        ex.sendResponseHeaders(200, bytes.length.toLong)
        ex.getResponseBody.write(bytes)
      }
      else if (method == "GET" && path == "/liveness")
        respond(ex, 200, """{"status":"alive","alive":true}""")
      else if (method == "GET" && path == "/health") {
        val up = !spark.sparkContext.isStopped
        respond(ex, if (up) 200 else 503,
          s"""{"status":${js(if (up) "healthy" else "unhealthy")},"running":$up}""")
      }
      else if (method == "GET" && path == "/readiness") {
        // ready = context up AND no active query sitting on an exception
        // (a failed-but-not-yet-reaped query must flip readiness off)
        val ready = !spark.sparkContext.isStopped &&
          spark.streams.active.forall(_.exception.isEmpty)
        respond(ex, if (ready) 200 else 503,
          s"""{"status":${js(if (ready) "ready" else "not_ready")},"ready":$ready}""")
      }
      else if (method == "GET" && path == "/components")
        respond(ex, 200, Engine.componentRegistry.toSeq.sortBy(_._1)
          .flatMap { case (kind, ns) =>
            ns.map(n => s"""{"kind":${js(kind)},"name":${js(n)}}""") }
          .mkString("[", ",", "]"))
      else if (method == "GET" && path.startsWith("/components/"))
        path.stripPrefix("/components/").split("/", 2) match {
          case Array(kind, name) =>
            Engine.componentRegistry.get(kind) match {
              case Some(ns) if ns.contains(name) =>
                respond(ex, 200, s"""{"kind":${js(kind)},"name":${js(name)}}""")
              case Some(_) => respond(ex, 404,
                s"""{"error":"unknown component","kind":${js(kind)},"name":${js(name)}}""")
              case None => respond(ex, 404,
                s"""{"error":"unknown component kind","kind":${js(kind)}}""")
            }
          case _ => respond(ex, 404, """{"error":"not found"}""")
        }
      else if (method == "GET" && path == "/schema")
        respond(ex, 200, schemaJson)
      else if (!authorized) respond(ex, 401, """{"error":"unauthorized"}""")
      else currentActor.withValue(tokenActor) { (method, path) match {
        case ("GET", "/system") =>
          val sc = spark.sparkContext
          respond(ex, 200,
            s"""{"sparkVersion":${js(sc.version)},"appId":${js(sc.applicationId)},""" +
              s""""defaultParallelism":${sc.defaultParallelism},""" +
              s""""activeStreams":${spark.streams.active.length}}""")
        case ("GET", "/status") =>
          respond(ex, 200, statusJson())
        case ("GET", "/node") =>
          respond(ex, 200, nodeJson())
        case ("GET", "/nodes") =>
          // the single-node page (reference lib.rs:189): one element,
          // reference pagination shape
          val (page, size) = pageParams(qparams(ex))
          val items = if (page == 1) s"[${nodeJson()}]" else "[]"
          respond(ex, 200, s"""{"items":$items,"page":$page,""" +
            s""""page_size":$size,"total":1}""")
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
          val id = s.stripPrefix("/streams/").stripSuffix("/stop")
          find(id) match {
            case Some(q) =>
              q.stop()
              recordEvent("stream_stopped", Some(id), "stopped over HTTP")
              val opId = recordOp(id, "stop", "succeeded", "")
              respond(ex, 200, s"""{"stopped":true,"operation":${js(opId)}}""")
            case None => respond(ex, 404, """{"error":"no such stream"}""")
          }
        case ("POST", s) if s.startsWith("/streams/") && s.endsWith("/start") =>
          val id = s.stripPrefix("/streams/").stripSuffix("/start")
          lifecycleLock.synchronized {
            if (find(id).isDefined)
              respond(ex, 409, """{"error":"stream already active"}""")
            else lifecycleStart(ex, id, "start")
          }
        case ("POST", s) if s.startsWith("/streams/") && s.endsWith("/restart") =>
          val id = s.stripPrefix("/streams/").stripSuffix("/restart")
          if (liveRegistry.exists(_._1 == id)) lifecycleLock.synchronized {
            // stop() blocks until termination, so the query name is free
            // for the fresh start below
            find(id).foreach(_.stop())
            lifecycleStart(ex, id, "restart")
          } else respond(ex, 404, """{"error":"no such stream in config"}""")
        case ("POST", "/config/apply") | ("POST", "/configuration/apply") =>
          versions match {
            case None => respond(ex, 503, """{"error":"no version store configured"}""")
            case Some(store) =>
              val body = new String(ex.getRequestBody.readAllBytes(),
                StandardCharsets.UTF_8)
              try lifecycleLock.synchronized {
                respond(ex, 202, applyConfig(store, body, "apply"))
              } catch {
                case scala.util.control.NonFatal(e) =>
                  // the reference's UNPROCESSABLE_ENTITY apply failure
                  recordOp("configuration", "apply", "failed",
                    Option(e.getMessage).getOrElse(e.getClass.getName))
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
                    respond(ex, 202, applyConfig(store, yaml, "rollback"))
                  } catch {
                    case scala.util.control.NonFatal(e) =>
                      recordOp("configuration", "rollback", "failed",
                        Option(e.getMessage).getOrElse(e.getClass.getName))
                      respond(ex, 422, s"""{"applied":false,"error":${js(
                        Option(e.getMessage).getOrElse(e.getClass.getName))}}""")
                  }
              }
          }
        case ("GET", "/configuration/diff") =>
          versions match {
            case None => respond(ex, 503, """{"error":"no version store configured"}""")
            case Some(store) =>
              val params = qparams(ex)
              (params.get("from").flatMap(store.load),
                params.get("to").flatMap(store.load)) match {
                case (Some(f), Some(t)) => respond(ex, 200,
                  s"""{"from":${js(params("from"))},"to":${js(params("to"))},""" +
                    s""""changed":${f != t}}""")
                case _ => respond(ex, 404,
                  """{"error":"configuration version not found"}""")
              }
          }
        case ("GET", "/configuration") | ("GET", "/config") =>
          versions match {
            case None => respond(ex, 503, """{"error":"no version store configured"}""")
            case Some(store) => store.active().flatMap(id =>
                store.load(id).map(id -> _)) match {
              case Some((id, yaml)) => respond(ex, 200,
                s"""{"version":${js(id)},"yaml":${js(yaml)}}""")
              case None => respond(ex, 404,
                """{"error":"no configuration applied yet"}""")
            }
          }
        case ("GET", "/configuration/draft") =>
          versions match {
            case None => respond(ex, 503, """{"error":"no version store configured"}""")
            case Some(store) => store.draft() match {
              case Some(yaml) => respond(ex, 200, s"""{"yaml":${js(yaml)}}""")
              case None =>
                // the reference answers NO_CONTENT when no draft exists
                ex.sendResponseHeaders(204, -1)
            }
          }
        case ("PUT", "/configuration/draft") =>
          versions match {
            case None => respond(ex, 503, """{"error":"no version store configured"}""")
            case Some(store) =>
              val body = new String(ex.getRequestBody.readAllBytes(),
                StandardCharsets.UTF_8)
              store.saveDraft(body)
              // drafts are unversioned until applied, so they never pass
              // recordOp — audit the save directly (who edited the
              // scratchpad matters exactly as much as who applied it)
              recordAudit("configuration", "draft_save", "succeeded",
                s"${body.getBytes(StandardCharsets.UTF_8).length} bytes")
              respond(ex, 200, s"""{"saved":true,"bytes":${
                body.getBytes(StandardCharsets.UTF_8).length}}""")
          }
        case ("GET", "/operations") =>
          val params = qparams(ex)
          val items = operations.synchronized {
            operations.toArray(new Array[OpRec](0)).toSeq }
          val f = items
            .filter(o => params.get("resource_id").forall(_ == o.resourceId))
            .filter(o => params.get("operation").forall(_ == o.operation))
            .filter(o => params.get("state").forall(_ == o.state))
          val (page, size) = pageParams(params)
          respond(ex, 200, s"""{"items":${f.slice((page - 1) * size, page * size)
            .map(opJson).mkString("[", ",", "]")},""" +
            s""""page":$page,"page_size":$size,"total":${f.size}}""")
        case (m, s) if (m == "GET" || m == "DELETE") && s.startsWith("/operations/") =>
          // DELETE is the reference's cancel; lifecycle operations run
          // synchronously inside their request here, so the record is
          // always terminal — cancel returns it unchanged
          val id = s.stripPrefix("/operations/")
          val rec = operations.synchronized {
            operations.toArray(new Array[OpRec](0)).find(_.id == id) }
          rec match {
            case Some(o) => respond(ex, 200, opJson(o))
            case None => respond(ex, 404,
              s"""{"error":"unknown operation","id":${js(id)}}""")
          }
        case ("GET", "/audit") =>
          // actor-stamped mutation log (reference lib.rs:298 — hub-only
          // there; the degenerate single-node form serves this engine's
          // own apply/rollback/draft/lifecycle mutations): who did what,
          // when, reference pagination shape. Filterable like
          // /operations, plus `actor=`.
          val params = qparams(ex)
          val items = audits.synchronized {
            audits.toArray(new Array[AuditRec](0)).toSeq }
          val f = items
            .filter(a => params.get("actor").forall(_ == a.actor))
            .filter(a => params.get("resource_id").forall(_ == a.resourceId))
            .filter(a => params.get("operation").forall(_ == a.operation))
            .filter(a => params.get("state").forall(_ == a.state))
          val (page, size) = pageParams(params)
          respond(ex, 200, s"""{"items":${f.slice((page - 1) * size, page * size)
            .map(auditJson).mkString("[", ",", "]")},""" +
            s""""page":$page,"page_size":$size,"total":${f.size}}""")
        case ("GET", "/events/stream") =>
          // Server-Sent Events live tail of the same bounded ring the
          // paged /events serves (reference lib.rs:297 /events/stream —
          // hub-only there; served here so the console can tail without
          // polling). Resumable: Last-Event-ID header or ?last_id= skips
          // already-seen entries, and each frame carries `id:` so an
          // EventSource reconnect resumes seamlessly. The connection is
          // WINDOWED (~25 s, then `retry: 250` reconnect): handlers
          // share a small pool, and an unbounded tail would pin a
          // thread forever — the standard SSE rotate-the-connection
          // pattern, invisible to EventSource clients.
          if (sseActive.incrementAndGet() > 2) {
            // never more than 2 pool threads in tail loops: a probe or
            // lifecycle request must always find a free handler (the
            // console's poll fallback covers a 429'd tail)
            sseActive.decrementAndGet()
            respond(ex, 429, """{"error":"too many event streams"}""")
          } else try {
            val params = qparams(ex)
            // each resume source parses INDEPENDENTLY: a present-but-
            // non-numeric Last-Event-ID header must fall through to
            // ?last_id=, not pin the Option and replay the whole ring
            var lastId = Option(ex.getRequestHeaders.getFirst("Last-Event-ID"))
              .flatMap(_.toLongOption)
              .orElse(params.get("last_id").flatMap(_.toLongOption))
              .getOrElse(0L)
            ex.getResponseHeaders.set("Content-Type", "text/event-stream")
            ex.getResponseHeaders.set("Cache-Control", "no-cache")
            ex.sendResponseHeaders(200, 0L) // 0 = chunked
            val out = ex.getResponseBody
            out.write("retry: 250\n\n".getBytes(StandardCharsets.UTF_8))
            out.flush()
            val deadline = System.currentTimeMillis() + 25000
            var open = true
            var ticks = 0
            while (open && System.currentTimeMillis() < deadline) {
              val fresh = events.synchronized {
                events.toArray(new Array[Event](0)).toSeq }
                .filter(e => e.id > lastId)
                .filter(e => params.get("event_type").forall(_ == e.eventType))
                .filter(e => params.get("stream_id")
                  .forall(v => e.streamId.contains(v)))
                .sortBy(_.id)
              try {
                if (fresh.nonEmpty) fresh.foreach { e =>
                  out.write(s"id: ${e.id}\ndata: ${eventJson(e)}\n\n"
                    .getBytes(StandardCharsets.UTF_8))
                  lastId = e.id
                }
                // a comment frame every ~5 s keeps proxies from timing
                // the idle connection out
                else if (ticks % 20 == 0)
                  out.write(": keepalive\n\n".getBytes(StandardCharsets.UTF_8))
                out.flush()
              } catch { // client went away — the normal tail termination
                case _: java.io.IOException => open = false
              }
              if (open) { Thread.sleep(250); ticks += 1 }
            }
          } finally { sseActive.decrementAndGet(); () }
        case ("GET", "/events") =>
          val params = qparams(ex)
          val items = events.synchronized {
            events.toArray(new Array[Event](0)).toSeq }
          val f = items
            .filter(e => params.get("event_type").forall(_ == e.eventType))
            .filter(e => params.get("stream_id").forall(v => e.streamId.contains(v)))
          val (page, size) = pageParams(params)
          respond(ex, 200, s"""{"items":${f.slice((page - 1) * size, page * size)
            .map(eventJson).mkString("[", ",", "]")},""" +
            s""""page":$page,"page_size":$size,"total":${f.size}}""")
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
      } }
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
  // every monitoring route for its full duration. Sized so a couple of
  // /events/stream tails (each holding a thread for its ≤25 s window)
  // leave headroom for lifecycle + monitoring traffic.
  private val pool = java.util.concurrent.Executors.newFixedThreadPool(
    6,
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

object ControlPlane {
  /** One `/events` ring entry. */
  private final case class Event(id: Long, eventType: String,
      streamId: Option[String], occurredAtMs: Long, message: String)
  /** One `/operations` record (always terminal — lifecycle operations
    * run synchronously inside their request). */
  private final case class OpRec(id: String, resourceId: String,
      operation: String, state: String, occurredAtMs: Long, detail: String)
  /** One `/audit` record — an [[OpRec]] plus the acting identity
    * (reference lib.rs:298 audit log, degenerate single-node form). */
  private final case class AuditRec(id: String, actor: String,
      resourceId: String, operation: String, state: String,
      occurredAtMs: Long, detail: String)
}
