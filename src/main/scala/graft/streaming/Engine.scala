package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** The stream engine (SURVEY.md §3.1): wires
  * `input → [buffer] → pipeline → output (+ error_output)` onto
  * Structured Streaming. Where the reference hand-builds ordering,
  * WAL durability and backpressure (stream/mod.rs:117-225), Spark's
  * micro-batch runtime already provides all three: batchIds are totally
  * ordered, the checkpoint is the WAL (offsets + commits), and trigger
  * pacing + maxOffsetsPerTrigger is the backpressure valve. The engine's
  * own job is config resolution and per-batch pipeline execution.
  */
object Engine {

  /** One batch-write target; implementations must be idempotent per
    * (batchId) for end-to-end exactly-once (the reference's
    * "one write_batch = one transaction", core output/mod.rs:41-47). */
  trait BatchSink {
    def write(batch: DataFrame, batchId: Long): Unit
  }

  /** Processors that need the micro-batch id (e.g. idempotent cross-batch
    * staging) implement this richer shape; the engine passes the
    * foreachBatch batchId instead of calling the plain transform. */
  trait BatchIdAware {
    def apply(batch: DataFrame, batchId: Long): DataFrame
  }

  /** Idempotent per batchId: each batch lands in its own batch_id=N
    * partition with dynamic overwrite, so a replayed batch (restart
    * between sink write and checkpoint commit) overwrites itself instead
    * of duplicating — checkpoint + idempotent sink = exactly-once.
    */
  final case class ParquetSink(path: String) extends BatchSink {
    def write(batch: DataFrame, batchId: Long): Unit =
      batch.withColumn("batch_id", lit(batchId))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(path)
  }
  final case class ConsoleSink(numRows: Int = 20) extends BatchSink {
    def write(batch: DataFrame, batchId: Long): Unit =
      batch.show(numRows, truncate = false)
  }
  /** Collects to driver-side memory — test/debug only. */
  final class MemorySink extends BatchSink {
    val batches = new scala.collection.concurrent.TrieMap[Long, Seq[org.apache.spark.sql.Row]]()
    def write(batch: DataFrame, batchId: Long): Unit =
      batches.put(batchId, batch.collect().toSeq)
    def rows: Seq[org.apache.spark.sql.Row] = batches.toSeq.sortBy(_._1).flatMap(_._2)
  }
  case object NoopSink extends BatchSink {
    def write(batch: DataFrame, batchId: Long): Unit = {
      batch.write.format("noop").mode("overwrite").save()
    }
  }

  /** Pure mapping of reference kafka output options (output/kafka.rs:63-85)
    * to Spark kafka sink options — unit-testable without a broker.
    *
    * EOS boundary: the reference's `exactly_once` wraps each batch in a
    * producer transaction fenced by a stable transactional_id
    * (output/kafka.rs:293-399). Spark's kafka writer cannot take that
    * route: it never calls `initTransactions()`/`beginTransaction()`, so a
    * producer configured with `transactional.id` throws
    * `IllegalStateException` on the first `send()` — and one shared id
    * across parallel writer tasks would fence sibling producers anyway.
    * `exactly_once` therefore maps to `enable.idempotence` (per-producer,
    * per-partition dedupe at the broker) and the engine-level guarantee
    * every sink here uses: checkpointed batchIds + idempotent replay —
    * [[KafkaSink]] stamps each record with a `batch_id` header and a
    * replayed batch re-produces identical (topic, batch_id) records for
    * consumer-side dedupe. The broker-fenced transactional route DOES
    * exist since round 7 — `exactly_once: transactional` selects
    * [[TransactionalKafkaSink]], the hand-rolled per-partition
    * transactional producer with per-task fenced ids. On this default
    * idempotent path, `transactional_id` is accepted (config
    * compatibility with reference yaml) but never passed to the
    * producer — a WARN says so at config resolution.
    */
  def kafkaSinkOptions(o: Map[String, String]): Map[String, String] = {
    // topic_expr (Expr<String> topic) routes per row via the projected
    // `topic` column instead of a static topic option
    val base = Map(
      "kafka.bootstrap.servers" -> o.getOrElse("brokers", "localhost:9092")) ++
      (if (o.contains("topic_expr")) Map.empty
       else Map("topic" -> o("topic")))
    val withAcks = o.get("acks").fold(base)(a => base + ("kafka.acks" -> a))
    val withComp = o.get("compression").fold(withAcks)(t => withAcks + ("kafka.compression.type" -> t))
    val withClient = o.get("client_id").fold(withComp)(i => withComp + ("kafka.client.id" -> i))
    if (o.get("exactly_once").contains("true"))
      withClient + ("kafka.enable.idempotence" -> "true") + ("kafka.acks" -> "all")
    else withClient
  }

  /** The kafka sink's record projection, split out so the shape is
    * unit-testable without a broker: key/value columns, the batch_id
    * header, and — when `topic_expr` is configured (the reference's
    * `Expr<String>` topic, output/kafka.rs:63-70) — a per-row `topic`
    * column, which Spark's kafka writer routes by in place of the
    * static `topic` option. */
  def kafkaRecords(batch: DataFrame, options: Map[String, String],
      batchId: Long): DataFrame = {
    val valueField = options.getOrElse("value_field", Codecs.ValueCol)
    // topic/key expressions evaluate against the FULL input row, before
    // the projection narrows it to the producer-record shape
    val cols =
      options.get("key").map(k => expr(k).cast("string").as("key")).toSeq ++
      Seq(col(valueField).cast("binary").as("value")) ++
      options.get("topic_expr").map(t => expr(t).cast("string").as("topic")).toSeq
    batch.select(cols: _*)
      .withColumn("headers", array(struct(lit("batch_id").as("key"),
        lit(batchId.toString).cast("binary").as("value"))))
  }

  /** kafka output (output/kafka.rs:44-90): key/value projection + producer
    * options; the micro-batch id rides as a record header so replayed
    * batches are consumer-dedupable (see [[kafkaSinkOptions]]). */
  final case class KafkaSink(options: Map[String, String]) extends BatchSink {
    // ONE warning at sink construction (config resolution), not one per
    // micro-batch: the yaml user who set a transactional id must learn
    // it is not being used on this idempotent path (see the EOS
    // boundary note at kafkaSinkOptions; TransactionalKafkaSink is the
    // broker-fenced route)
    if (options.contains("transactional_id"))
      System.err.println("[engine] WARN kafka output: 'transactional_id' is accepted " +
        "for config compatibility but Spark's kafka writer cannot run broker-fenced " +
        "transactions - using idempotence + batch_id-header replay-dedupe instead " +
        "(set exactly_once: transactional for the hand-rolled transactional producer)")
    def write(batch: DataFrame, batchId: Long): Unit = {
      kafkaRecords(batch, options, batchId)
        .write.format("kafka")
        .options(kafkaSinkOptions(options))
        .option("includeHeaders", "true")
        .save()
    }
  }

  /** The broker-fenced exactly-once kafka path (output/kafka.rs:293-399)
    * that [[kafkaSinkOptions]]' scaladoc rules out for Spark's own kafka
    * writer: a hand-rolled per-partition transactional producer over the
    * wire protocol ([[KafkaWire.TransactionalProducer]]). Each task uses
    * the STABLE transactional id `"<base>-p<partitionId>"`, so a task
    * retry re-runs InitProducerId, bumps the epoch broker-side, and
    * FENCES the zombie attempt; the batch then commits atomically —
    * `read_committed` consumers see all of a task's rows or none
    * (KafkaEosSpec injects a mid-batch failure to prove it). The
    * micro-batch id still rides as a record header, so the replay story
    * composes with the checkpoint exactly like [[KafkaSink]].
    * Partition routing: spark partition id modulo `num_partitions`
    * (default 1) — key-hash routing would need Metadata round-trips the
    * minimal client deliberately omits.
    */
  final case class TransactionalKafkaSink(options: Map[String, String])
      extends BatchSink {
    // fail at CONFIG time, not on the first micro-batch: the minimal
    // transactional client registers one static topic per transaction
    // (per-row topic_expr routing would need Metadata round-trips and
    // per-topic AddPartitionsToTxn bookkeeping it deliberately omits)
    require(options.contains("topic"),
      "kafka exactly_once: transactional requires a static 'topic'")
    require(!options.contains("topic_expr"),
      "kafka exactly_once: transactional does not support 'topic_expr' " +
        "(per-row topics) - use the default idempotent path for expression routing")
    def write(batch: DataFrame, batchId: Long): Unit = {
      val hostPort = options.getOrElse("brokers", "localhost:9092").split(",").head
      val host = hostPort.split(":").head
      val port = hostPort.split(":").lift(1).map(_.toInt).getOrElse(9092)
      val topic = options("topic")
      val txnBase = options.getOrElse("transactional_id", "graft-txn")
      val numParts = options.getOrElse("num_partitions", "1").toInt
      val valueField = options.getOrElse("value_field", Codecs.ValueCol)
      val keyed = options.get("key") match {
        case Some(k) => batch.select(expr(k).cast("binary").as("key"),
          col(valueField).cast("binary").as("value"))
        case None => batch.select(lit(null).cast("binary").as("key"),
          col(valueField).cast("binary").as("value"))
      }
      keyed.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
        if (rows.nonEmpty) {
          val pid = org.apache.spark.TaskContext.getPartitionId()
          val producer = new KafkaWire.TransactionalProducer(
            host, port, s"$txnBase-p$pid")
          try {
            producer.initTransactions()
            producer.beginTransaction(topic, pid % numParts)
            rows.grouped(500).foreach { g =>
              producer.produce(topic, pid % numParts, g.map { r =>
                KafkaWire.ProducerRecord(r.getAs[Array[Byte]](0),
                  r.getAs[Array[Byte]](1),
                  Seq(KafkaWire.RecordHeader("batch_id",
                    batchId.toString.getBytes("UTF-8"))))
              }.toSeq)
            }
            producer.endTransaction(commit = true)
          } catch {
            case scala.util.control.NonFatal(e) =>
              // best effort: an unreachable broker aborts by txn timeout
              try producer.endTransaction(commit = false)
              catch { case scala.util.control.NonFatal(_) => () }
              throw e
          } finally producer.close()
        }
      }
    }
  }

  /** Output dispatch TABLE — kind → builder. The map (not a parallel
    * hand-maintained list) is the single source of truth for which output
    * kinds the engine accepts: ReferenceExamplesSpec asserts the
    * reference examples' kinds against `sinkBuilders.keySet`, so removing
    * an entry fails the spec. */
  val sinkBuilders: Map[String, ComponentConf => BatchSink] = Map(
    "parquet" -> (c => ParquetSink(c.options("path"))),
    "stdout" -> (c => ConsoleSink(c.options.getOrElse("num_rows", "20").toInt)),
    "drop" -> (_ => NoopSink),
    "memory" -> (_ => new MemorySink),
    "sql" -> (c => Jdbc.JdbcSink(c.options("url"), c.options("table"), c.options)),
    "http" -> (c => HttpOutputSink(c.options("url"), c.options.get("bearer_token"),
      c.options.getOrElse("rows_per_request", "1000").toInt,
      c.options.getOrElse("retry_count", "0").toInt)),
    "kafka" -> (c =>
      if (c.options.get("exactly_once").contains("transactional"))
        TransactionalKafkaSink(c.options)
      else KafkaSink(c.options)),
    "influxdb" -> (c => Influx.InfluxSink(c.options)),
    "redis" -> (c => Redis.RedisSink(c.options("host"),
      c.options.getOrElse("port", "6379").toInt,
      c.options.getOrElse("mode", "set"),
      c.options("key_expr"), c.options("value_expr"))),
    "nats" -> (c => Nats.NatsSink(c.options("host"),
      c.options.getOrElse("port", "4222").toInt,
      c.options("subject_expr"), c.options("value_expr"))),
    "mqtt" -> (c => Mqtt.MqttSink(c.options("host"),
      c.options.getOrElse("port", "1883").toInt,
      c.options("topic_expr"), c.options("value_expr"),
      c.options.getOrElse("qos", "0").toInt,
      c.options.get("username"), c.options.get("password"))),
    "mongodb" -> (c => Mongo.MongoSink(c.options)),
    "pulsar" -> (c => Pulsar.PulsarSink(c.options("service_url"),
      c.options.get("topic_expr")
        .getOrElse(Pulsar.topicExprOf(c.options("topic"))),
      c.options.getOrElse("value_field", Codecs.ValueCol),
      c.options.get("auth").map(Pulsar.nestedOption).getOrElse(Map.empty))))

  def sinkFromConf(c: ComponentConf): BatchSink =
    sinkBuilders.getOrElse(c.kind,
      throw new IllegalArgumentException(s"unknown output: ${c.kind}"))(c)

  /** The explicit held-back marker a processor returns to short-circuit
    * the pipeline for this micro-batch (the reference's
    * `ProcessorResult::None`): a zero-COLUMN empty frame, so it can never
    * be confused with a legitimate result that merely computed (or was
    * optimizer-folded) to zero rows — every real result has columns. */
  def heldBackSentinel(spark: SparkSession): DataFrame = spark.emptyDataFrame

  /** Provably-zero-rows from the optimized plan alone — never a Spark job.
    * Used for the PRE-pipeline empty-micro-batch skip (what MemoryStream/
    * no-data triggers produce); frames that merely COMPUTE to zero rows
    * stay false and still write, like the reference's empty batches. */
  def staticallyEmpty(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan match {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation =>
        l.data.isEmpty
      case _ => false
    }

  /** A running stream: the pipeline folds over each micro-batch; a failed
    * batch routes whole to the error sink (stream/mod.rs:485-516
    * `ProcessorData::Err`) instead of killing the query.
    */
  def start(
      input: DataFrame,
      processors: Seq[Processors.BatchTransform],
      sink: BatchSink,
      errorSink: Option[BatchSink] = None,
      trigger: Trigger = Trigger.AvailableNow(),
      checkpoint: Option[String] = None,
      queryName: Option[String] = None): StreamingQuery = {
    var w = input.writeStream.trigger(trigger)
    checkpoint.foreach(p => w = w.option("checkpointLocation", p))
    queryName.foreach(n => w = w.queryName(n))
    val query = w.foreachBatch { (batch: DataFrame, batchId: Long) =>
      try {
        // Statically-empty batch (optimizer-collapsed empty LocalRelation —
        // what MemoryStream/no-data triggers produce) = the reference's
        // `ProcessorResult::None`: skip the pipeline. Detected from the
        // plan only — no per-batch probe job; sources whose empty batches
        // aren't statically visible are handled by JsonToArrow's own
        // zero-row inference guard (Codecs.JsonCodec).
        if (!staticallyEmpty(batch)) {
          // Fold with a held-back short-circuit: when ANY processor
          // returns the EXPLICIT held-back sentinel (the zero-column
          // empty frame from [[heldBackSentinel]] — the accumulator
          // holding a batch, or JsonToArrow's zero-row inference guard),
          // the REMAINING processors and the sink are skipped for this
          // micro-batch — the reference's `None` short-circuits the
          // whole pipeline (pipeline/mod.rs:57-85); a downstream
          // aggregate would otherwise turn the empty frame into a
          // spurious count=0 row. The sentinel is detected by its
          // zero-column SCHEMA, not by plan emptiness: frames that
          // merely COMPUTE to zero rows (even ones the optimizer folds
          // to an empty LocalRelation, as MemoryStream batches are)
          // still write, like the reference's empty batches — and the
          // check costs one analysis, never an optimizer pass per step.
          var out = batch
          var heldBack = false
          val it = processors.iterator
          while (it.hasNext && !heldBack) {
            out = it.next() match {
              case b: BatchIdAware => b(out, batchId)
              case p => p(out)
            }
            heldBack = out.schema.isEmpty
          }
          if (!heldBack) sink.write(out, batchId)
          // the sink has consumed the release frame — any rate_cap
          // cache for THIS trigger can drop now instead of lingering
          // until (or past) the next trigger
          processors.foreach {
            case rc: Processors.RateCap => rc.releaseCache()
            case _ => ()
          }
        }
      } catch {
        // NonFatal only: data/processor failures divert to the error sink;
        // fatal VM errors and interrupts propagate so the stream fails and
        // Spark retries the batch instead of committing a silent skip.
        case scala.util.control.NonFatal(e) =>
          errorSink match {
            case Some(err) =>
              err.write(batch.withColumn("__error", lit(e.getMessage)), batchId)
            case None => throw e
          }
      }
    }.start()
    // Session-window stop flush: a still-open session would otherwise be
    // dropped when the query stops while its source offsets are already
    // checkpoint-committed — data loss with no replay. A listener flushes
    // the held session through the DOWNSTREAM processors into the sink at
    // termination, under negative batch ids (no collision with any
    // micro-batch's id; idempotent sinks partition by id as usual).
    // Boundary, stated: a flush after an ERROR termination may emit rows
    // from a batch whose offsets never committed — at-least-once on the
    // final session, vs the silent at-most-once of not flushing. (The
    // reference drops pending sessions at close — read() returns None
    // once cancelled, session_window.rs:120-125; this is strictly more
    // durable.)
    val sessions = processors.collect { case s: Processors.SessionWindowBuffer => s }
    if (sessions.nonEmpty) {
      val spark = input.sparkSession
      // once-only guard: the terminated EVENT and the registration-time
      // catch-up check below can both observe the same termination — the
      // flush must run exactly once whichever wins
      val flushed = new java.util.concurrent.atomic.AtomicBoolean(false)
      def flushOnce(): Unit = if (flushed.compareAndSet(false, true)) {
        try {
          var flushId = -1L
          sessions.foreach { s =>
            val idx = processors.indexOf(s)
            s.flushPending().foreach { session =>
              var out = session
              var held = false
              val it = processors.drop(idx + 1).iterator
              while (it.hasNext && !held) {
                out = it.next()(out)
                held = out.schema.isEmpty
              }
              if (!held) sink.write(out, flushId)
              flushId -= 1
            }
          }
        } catch {
          case scala.util.control.NonFatal(ex) =>
            System.err.println(
              s"[engine] session flush at query stop failed: ${ex.getMessage}")
        }
      }
      val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
        override def onQueryStarted(
            e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
        override def onQueryProgress(
            e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit = ()
        override def onQueryTerminated(
            e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit =
          if (e.id == query.id) {
            try flushOnce() finally spark.streams.removeListener(this)
          }
      }
      spark.streams.addListener(listener)
      // Registration races `query.start()` above: a query that terminated
      // in that window already FIRED its QueryTerminatedEvent — nobody was
      // listening, so without this catch-up the pending session is dropped
      // and the listener leaks forever.
      if (!query.isActive) {
        flushOnce()
        spark.streams.removeListener(listener)
      }
    }
    query
  }

  /** Inputs (SURVEY.md §2.1). Streaming kinds return a streaming frame in
    * the reference's binary-envelope shape; `file`/`sql-over-file` are
    * batch scans with EOF semantics like the reference file input. */
  /** Input dispatch TABLE — kind → builder; the same single-source-of-
    * truth contract as [[sinkBuilders]] (ReferenceExamplesSpec asserts
    * against `inputBuilders.keySet`). */
  val inputBuilders: Map[String, (SparkSession, ComponentConf) => DataFrame] = Map(
    "generate" -> { (spark, c) =>
      // input/generate.rs:27-90 — context emitted per tick; with a total
      // `count` the reference EOFs after emitting it → batch semantics.
      c.options.get("count") match {
        case Some(n) =>
          spark.range(n.toLong).select(
            lit(c.options.getOrElse("context", "{}")).cast("binary").as(Codecs.ValueCol),
            current_timestamp().as("__meta_ingest_time"))
        case None =>
          val rate = spark.readStream.format("rate")
            .option("rowsPerSecond", c.options.getOrElse("rows_per_second", "10"))
            .load()
          rate.select(
            lit(c.options.getOrElse("context", "{}")).cast("binary").as(Codecs.ValueCol),
            col("timestamp").as("__meta_ingest_time"))
      }
    },
    "memory" -> { (spark, c) =>
      // input/memory.rs — a preloaded message list, EOF once drained
      // (batch semantics). Parsed from the YAML `messages:` list via the
      // indexed messages.N options; each message is one binary-envelope
      // row, like the reference's MessageBatch-per-string.
      val msgs = c.options.collect {
        case (k, v) if k.startsWith("messages.") =>
          (k.stripPrefix("messages.").toInt, v)
      }.toSeq.sortBy(_._1).map(_._2)
      require(msgs.nonEmpty, "memory input needs a non-empty `messages:` list")
      import spark.implicits._
      msgs.toDF("s").select(
        col("s").cast("binary").as(Codecs.ValueCol),
        current_timestamp().as("__meta_ingest_time"))
    },
    "file" -> { (spark, c) =>
      // object-store config (file.rs:288-390 `store:` block) lands on the
      // Hadoop FS conf; the path scheme rewrites to the matching Hadoop
      // connector scheme (s3 -> s3a, az -> abfs)
      objectStoreConf(c.options).foreach { case (k, v) =>
        spark.sparkContext.hadoopConfiguration.set(k, v) }
      val path = objectStorePath(c.options("path"), c.options)
      val fmt = c.options.getOrElse("format", "parquet")
      val df = fmt match {
        case "avro" => AvroInput.read(spark, path)
        case "arrow" =>
          org.apache.spark.sql.GraftArrowPipe.readArrowFiles(spark, path)
        case _ =>
          val readerOpts = (c.options -- Seq("format", "path", "query"))
            .filter { case (k, _) =>
              !k.startsWith("store.") && !k.startsWith("codec.") }
          // plain parquet with no reader options: schema-cached read
          // (graft.Tables) — skips the per-pipeline one-task schema
          // inference job on stable input paths. Any option could
          // change the inferred schema, so those fall through.
          if (fmt == "parquet" && readerOpts.isEmpty)
            graft.Tables.cachedParquet(spark, path)
          else spark.read.format(fmt).options(readerOpts).load(path)
      }
      c.options.get("query") match {
        case Some(q) =>
          df.createOrReplaceTempView(c.options.getOrElse("table_name", "flow"))
          spark.sql(q)
        case None => df
      }
    },
    "kafka" -> { (spark, c) =>
      spark.readStream.format("kafka").options(kafkaOptions(c.options)).load()
        .select(col("value").as(Codecs.ValueCol),
          col("topic").as("__meta_source"),
          col("partition").as("__meta_partition"),
          col("offset").as("__meta_offset"),
          col("key").as("__meta_key"),
          col("timestamp").as("__meta_timestamp"),
          current_timestamp().as("__meta_ingest_time"))
    },
    "sql" -> { (spark, c) =>
      // input/sql.rs:48-73 — one poll of select_sql, EOF semantics.
      Jdbc.read(spark, c.options)
    },
    "redis" -> { (spark, c) =>
      // input/redis.rs poll modes — one poll, EOF semantics.
      Redis.read(spark, c.options)
    },
    "modbus" -> { (spark, c) =>
      // input/modbus.rs — one register poll, columns per point.
      Modbus.read(spark, c.options)
    },
    "http" -> { (spark, c) =>
      // input/http.rs client mode — one endpoint poll, EOF semantics
      // (server mode is the programmatic HttpInput class).
      HttpPoll.read(spark, c.options)
    // Connection-holding streaming inputs: the client object outlives
    // this call (its reader thread feeds the stream), so its handle
    // registers with [[closeConfigInputs]] for shutdown — config-run
    // streams have no programmatic handle to stop() themselves.
    },
    "mqtt" -> { (spark, c) =>
      // input/mqtt.rs:35-57 full option surface: qos 0/1/2,
      // clean_session, keep_alive (seconds), username/password
      val in = new Mqtt.MqttInput(spark,
        c.options.getOrElse("host", "localhost"),
        c.options.getOrElse("port", "1883").toInt,
        c.options.getOrElse("topics", c.options.getOrElse("topic_filter", "#")),
        c.options.getOrElse("client_id", "graft-in"),
        c.options.getOrElse("qos", "0").toInt,
        c.options.get("username"), c.options.get("password"),
        cleanSession = !c.options.get("clean_session").contains("false"),
        keepAliveSecs = c.options.getOrElse("keep_alive", "60").toInt)
      configInputs.add(() => in.stop())
      in.toDF
    },
    "nats" -> { (spark, c) =>
      // input/nats.rs:38-62 modes: Regular{subject, queue_group} or
      // JetStream{stream, consumer_name/durable_name}; auth 65-75
      val host = c.options.getOrElse("host", "localhost")
      val port = c.options.getOrElse("port", "4222").toInt
      val auth = c.options.get("auth").map(Pulsar.nestedOption)
        .getOrElse(c.options.filter { case (k, _) =>
          Set("username", "password", "token")(k) })
      if (c.options.get("mode").contains("jetstream") ||
          c.options.contains("stream")) {
        val in = new Nats.JetStreamInput(spark, host, port,
          c.options("stream"),
          c.options.getOrElse("durable_name",
            c.options.getOrElse("consumer_name", "graft-durable")),
          auth)
        configInputs.add(() => in.stop())
        in.toDF
      } else {
        val in = new Nats.NatsInput(spark, host, port,
          c.options("subject"), c.options.get("queue_group"), auth)
        configInputs.add(() => in.stop())
        in.toDF
      }
    },
    "pulsar" -> { (spark, c) =>
      val in = new Pulsar.PulsarInput(spark, c.options("service_url"),
        c.options("topic"), c.options("subscription_name"),
        c.options.getOrElse("subscription_type", "exclusive"),
        c.options.get("auth").map(Pulsar.nestedOption).getOrElse(Map.empty),
        c.options.get("retry_config").map(Pulsar.nestedOption).getOrElse(Map.empty))
      configInputs.add(() => in.stop())
      in.toDF
    },
    "websocket" -> { (spark, c) =>
      val in = new WebSocketInput(spark, c.options("url"),
        c.options.get("bearer_token")
          .map(t => Map("Authorization" -> s"Bearer $t")).getOrElse(Map.empty))
      configInputs.add(() => in.stop())
      in.toDF
    },
    "multiple_inputs" -> { (spark, c) =>
      // input/multiple_inputs.rs:30-110 — fan-in of child inputs; each
      // batch keeps its origin name (the window-join view name). The
      // reference merges via an async channel; Spark's union IS the
      // fan-in, with `__input_name` as the origin tag.
      require(c.children.nonEmpty,
        "multiple_inputs needs a non-empty `inputs:` list")
      val names = c.children.zipWithIndex.map { case (ch, i) =>
        val n = ch.name.getOrElse(s"input_$i")
        require(n.nonEmpty, "multiple_inputs child input has an empty name")
        n
      }
      require(names.distinct.size == names.size,
        s"multiple_inputs child names must be unique, got $names")
      val children = names.zip(c.children.map(ch => inputFromConf(spark, ch)))
      // Spark cannot union a streaming frame with a batch frame — the
      // children must agree (all batch = EOF semantics, all streaming)
      require(children.map(_._2.isStreaming).distinct.size == 1,
        "multiple_inputs children must be all streaming or all batch")
      Windows.unionTagged(children.toMap)
    })

  def inputFromConf(spark: SparkSession, c: ComponentConf): DataFrame =
    inputBuilders.getOrElse(c.kind,
      throw new IllegalArgumentException(s"unknown input: ${c.kind}"))(spark, c)

  /** Pure mapping of the reference file input's `store:` block
    * (file.rs:288-390 — S3/GCS/Azure/HDFS object-store registration) onto
    * Hadoop FileSystem conf keys, which is how Spark reaches the same
    * stores. Unit-testable without a live store; README documents the
    * per-store key table. Reference option names are kept verbatim
    * (`store.access_key_id`, `store.bucket_name`, …, as the YAML
    * flattener produces them).
    *
    * The `http` store (round 13) maps onto the engine's own read-only
    * Range-request [[HttpFileSystem]] — the one store the Hadoop
    * ecosystem does not ship a connector for.
    */
  def objectStoreConf(o: Map[String, String]): Map[String, String] =
    o.get("store.type") match {
      case None => Map.empty
      case Some("s3") =>
        // with a bucket_name the keys scope PER BUCKET
        // (fs.s3a.bucket.<name>.* — Hadoop's own per-bucket override
        // mechanism), so two file streams with different credentials or
        // endpoints coexist in one session instead of overwriting each
        // other's global conf
        val prefix = o.get("store.bucket_name")
          .map(b => s"fs.s3a.bucket.$b.").getOrElse("fs.s3a.")
        Map.empty[String, String] ++
          o.get("store.access_key_id").map(s"${prefix}access.key" -> _) ++
          o.get("store.secret_access_key").map(s"${prefix}secret.key" -> _) ++
          o.get("store.endpoint").toSeq.flatMap(e => Seq(
            s"${prefix}endpoint" -> e,
            // custom endpoints (MinIO/Ceph) address buckets by path
            s"${prefix}path.style.access" -> "true")) ++
          o.get("store.region").map(s"${prefix}endpoint.region" -> _) ++
          (if (o.get("store.allow_http").contains("true"))
            Map(s"${prefix}connection.ssl.enabled" -> "false") else Map.empty)
      case Some("gs") =>
        val keyfile = (o.get("store.service_account_path"),
            o.get("store.service_account_key")) match {
          case (Some(p), None) => p
          case (None, Some(raw)) =>
            // the raw-JSON-key variant: Hadoop's GCS connector reads a
            // keyfile, so the key lands in a private temp file. BOUNDARY:
            // the file exists on the DRIVER only — valid for local mode
            // and driver-side scans; on a multi-executor cluster use
            // service_account_path pointing at a path every node mounts
            // (the per-node distribution the reference's in-process
            // object_store client never needed)
            val f = java.nio.file.Files.createTempFile("graft_gcs_key", ".json")
            java.nio.file.Files.write(f, raw.getBytes("UTF-8"))
            f.toFile.deleteOnExit()
            f.toString
          case (None, None) => throw new IllegalArgumentException(
            "gs store needs service_account_path or service_account_key")
          case (Some(_), Some(_)) => throw new IllegalArgumentException(
            "specify either service_account_path or service_account_key, not both")
        }
        Map("fs.gs.auth.type" -> "SERVICE_ACCOUNT_JSON_KEYFILE",
          "fs.gs.auth.service.account.json.keyfile" -> keyfile)
      case Some("az") =>
        val account = o.getOrElse("store.account",
          throw new IllegalArgumentException("az store needs account"))
        o.get("store.access_key").toSeq.flatMap(k => Seq(
          s"fs.azure.account.key.$account.dfs.core.windows.net" -> k,
          s"fs.azure.account.key.$account.blob.core.windows.net" -> k)).toMap
      case Some("hdfs") =>
        // ha_config entries are Hadoop client keys already
        // (dfs.nameservices, dfs.ha.namenodes.*, …) — passthrough.
        // Deliberately NOT fs.defaultFS: that is session-global and
        // would silently re-root every RELATIVE path in the session
        // (checkpoints, staging dirs, other streams) onto the remote
        // cluster — fully-qualified hdfs:// paths resolve through the
        // HA client keys alone, so the reference's url becomes a path
        // requirement instead of a global default
        val url = o.getOrElse("store.url",
          throw new IllegalArgumentException("hdfs store needs url"))
        o.get("path").foreach(p => require(p.startsWith("hdfs://"),
          s"hdfs store: path must be fully qualified (hdfs://…), got '$p' " +
            s"(the store url $url is the authority to use)"))
        o.collect { case (k, v) if k.startsWith("store.ha_config.") =>
          k.stripPrefix("store.ha_config.") -> v }
      case Some("http") =>
        // round 13: the reference's object_store HTTP adapter
        // (input/file.rs:368-378) maps onto the engine's own read-only
        // Range-request FileSystem [[HttpFileSystem]] — splittable,
        // executor-side reads, no driver staging. The reference's `url`
        // key is the registered base; here the path IS the full URL, so
        // when url is present it must prefix the path (same files, same
        // addressing, caught at build instead of a 404 at scan).
        o.get("store.url").zip(o.get("path")).foreach { case (u, p) =>
          require(p.startsWith(u),
            s"http store: path '$p' is not under the store url '$u'")
        }
        o.get("path").foreach(p => require(
          p.startsWith("http://") || p.startsWith("https://"),
          s"http store: path must be a full http(s):// URL, got '$p'"))
        Map("fs.http.impl" -> classOf[HttpFileSystem].getName,
          "fs.https.impl" -> classOf[HttpsFileSystem].getName)
      case Some(other) =>
        throw new IllegalArgumentException(s"unknown store type: $other")
    }

  /** Path-scheme rewrite companion of [[objectStoreConf]]: the reference
    * registers stores under `s3://bucket` / `az://container`; Spark's
    * connectors use `s3a://` and `abfs://container@account...`. `gs://`
    * and `hdfs://` pass through (the Hadoop connectors own those schemes
    * natively). */
  def objectStorePath(path: String, o: Map[String, String]): String =
    if (path.startsWith("s3://")) "s3a://" + path.stripPrefix("s3://")
    else if (path.startsWith("az://")) {
      val rest = path.stripPrefix("az://")
      val (container, key) = rest.span(_ != '/')
      val account = o.getOrElse("store.account",
        throw new IllegalArgumentException("az:// path needs store.account"))
      s"abfs://$container@$account.dfs.core.windows.net$key"
    } else path

  private val configInputs =
    new java.util.concurrent.ConcurrentLinkedQueue[AutoCloseable]()

  /** Close every connection-holding input created via [[inputFromConf]]
    * (mqtt/nats/websocket) — engine shutdown's counterpart to the
    * programmatic inputs' own stop(). Safe to call repeatedly. */
  def closeConfigInputs(): Unit = {
    var c = configInputs.poll()
    while (c != null) {
      try c.close() catch { case scala.util.control.NonFatal(_) => () }
      c = configInputs.poll()
    }
  }

  /** Pure mapping of reference kafka input options (input/kafka.rs:36-58)
    * to Spark kafka source options — unit-testable without a broker. */
  def kafkaOptions(o: Map[String, String]): Map[String, String] = {
    val base = Map(
      "kafka.bootstrap.servers" -> o.getOrElse("brokers", "localhost:9092"),
      "subscribe" -> o.getOrElse("topics", ""),
      "startingOffsets" ->
        (if (o.get("start_from_latest").contains("true")) "latest" else "earliest"))
    o.get("consumer_group").map(g => base + ("kafka.group.id" -> g)).getOrElse(base)
  }

  /** Run every stream of a parsed config. Memory-input streams are not
    * config-expressible (they need a programmatic handle) — use start(). */
  /** Buffer kinds → their processor chain (SURVEY.md §2.4). This IS the
    * engine's buffer dispatch — the config surface for all four reference
    * buffer kinds plus their optional `join:` block:
    *
    *  - memory (buffer/memory.rs:40-46,108-150): hold rows until
    *    `capacity` are pending or `timeout_ms` elapsed, then release as
    *    one batch — the [[Processors.BatchAccumulator]].
    *  - tumbling_window: the trigger IS the window — [[runStream]] maps
    *    `interval` to Trigger.ProcessingTime; no processor needed.
    *  - sliding_window (sliding_window.rs:41-50): count-based overlapping
    *    windows over micro-batches — [[Processors.SlidingWindowBuffer]].
    *  - session_window (session_window.rs:40-49): gap-of-silence sessions
    *    — [[Processors.SessionWindowBuffer]].
    *
    * A `join:` block (buffer/join.rs JoinConfig — parsed to dotted
    * `join.*` options) appends a [[Processors.WindowJoinProcessor]]: each
    * fired window registers its per-source slices as views named by the
    * `input` component's child input names and runs the join SQL.
    */
  /** Buffer dispatch TABLE — kind → core processors; the same
    * single-source-of-truth contract as [[inputBuilders]]/[[sinkBuilders]]
    * (ReferenceExamplesSpec asserts against `bufferBuilders.keySet`). */
  val bufferBuilders: Map[String, ComponentConf => Seq[Processors.BatchTransform]] = Map(
    "memory" -> { b =>
      if (b.options.contains("capacity") || b.options.contains("timeout_ms") ||
          b.options.contains("timeout"))
        Seq(new Processors.BatchAccumulator(
          b.options.get("capacity").map(_.toLong).getOrElse(Long.MaxValue),
          Long.MaxValue,
          b.options.get("timeout_ms").map(_.toLong)
            .orElse(b.options.get("timeout").map(Config.parseDurationMs))
            .getOrElse(Long.MaxValue),
          b.options.get("staging")))
      else Nil
    },
    // the trigger IS the tumbling window ([[runStream]] maps `interval`)
    "tumbling_window" -> (_ => Nil),
    "sliding_window" -> (b =>
      Seq(new Processors.SlidingWindowBuffer(
        b.options.getOrElse("window_size",
          throw new IllegalArgumentException(
            "sliding_window buffer needs window_size")).toInt,
        b.options.getOrElse("slide_size",
          throw new IllegalArgumentException(
            "sliding_window buffer needs slide_size")).toInt))),
    "session_window" -> (b =>
      Seq(new Processors.SessionWindowBuffer(Config.parseDurationMs(
        b.options.getOrElse("gap", throw new IllegalArgumentException(
          "session_window buffer needs gap")))))))

  def bufferProcessors(buffer: Option[ComponentConf],
      input: ComponentConf = ComponentConf("generate", Map.empty))
      : Seq[Processors.BatchTransform] =
    buffer.toSeq.flatMap { b =>
      val core = bufferBuilders.getOrElse(b.kind,
        throw new IllegalArgumentException(s"unknown buffer: ${b.kind}"))(b)
      val join = b.options.get("join.query").toSeq.map { q =>
        b.options.get("join.codec.type").foreach(t => require(t == "json",
          s"window join codec '$t' is not supported (json only)"))
        val expected =
          if (input.kind == "multiple_inputs")
            input.children.zipWithIndex.map { case (ch, i) =>
              ch.name.getOrElse(s"input_$i") }
          else Seq(input.name.getOrElse("flow"))
        Processors.WindowJoinProcessor(q, expected)
      }
      core ++ join
    }

  /** Input-level `codec:` block (the reference's codec registry;
    * examples/schema_registry.yaml puts the codec ON the input, not in
    * the processor list) — decodes the input's binary `__value__`
    * envelope as the first per-batch transform, ahead of buffers and
    * processors. Wire format + REST resolve per
    * codec/schema_registry.rs:205-260; auth block `type: basic|bearer`
    * with username/password/token. */
  def inputCodec(c: ComponentConf): Seq[Processors.BatchTransform] = {
    // a codec: block whose `type` key is missing (or typo'd to another
    // key) must fail at BUILD — silently skipping the codec would flow
    // raw envelope bytes into processors undetected
    if (c.options.keys.exists(_.startsWith("codec.")) &&
        !c.options.contains("codec.type"))
      throw new IllegalArgumentException(
        s"input `${c.kind}` has a codec: block with no `type` key " +
          s"(found: ${c.options.keys.filter(_.startsWith("codec.")).toSeq.sorted.mkString(", ")})")
    c.options.get("codec.type").toSeq.map {
      case "json" => Processors.JsonToArrow()
      case "debezium_json" =>
        (df: DataFrame) => Codecs.DebeziumJsonCodec.decode(df)
      case "protobuf" =>
        // same schema sources as the protobuf_to_arrow processor
        // (descriptor_path + message_type, or the inline fields spec),
        // nested under the codec: block
        val codecOpts = c.options.collect {
          case (k, v) if k.startsWith("codec.") => k.stripPrefix("codec.") -> v
        }
        Processors.fromConf(Seq(ComponentConf("protobuf_to_arrow", codecOpts))).head
      case "schema_registry" =>
        val url = c.options.getOrElse("codec.registry_url",
          throw new IllegalArgumentException(
            "schema_registry codec needs `registry_url`"))
        val auth = c.options.get("codec.auth.type")
        auth.foreach(t => require(t == "basic" || t == "bearer",
          s"Unsupported auth type: $t"))
        val bearer = if (auth.contains("bearer"))
          Some(c.options.getOrElse("codec.auth.token",
            throw new IllegalArgumentException(
              "schema_registry codec: auth type bearer needs `token`")))
          else None
        val basic = if (auth.contains("basic"))
          Some((c.options.getOrElse("codec.auth.username", ""),
            c.options.getOrElse("codec.auth.password", ""))) else None
        // one cached resolver per stream — each schema id fetches once,
        // like the reference's in-process cache
        val resolver = new SchemaRegistry.CachingResolver(
          new SchemaRegistry.RestResolver(url, bearer, basic,
            c.options.get("codec.message_type")))
        (df: DataFrame) => SchemaRegistry.decodeBatch(df, resolver)
      case other => throw new IllegalArgumentException(
        s"unknown input codec: $other (known: ${codecKinds.mkString(", ")})")
    }
  }

  /** Input-codec kinds `inputCodec` dispatches on — kept beside the
    * match so the `/components` registry can't drift from it. */
  val codecKinds: Seq[String] =
    Seq("json", "debezium_json", "protobuf", "schema_registry")

  /** Every registered component name by kind — the control plane's
    * `/components` + `/schema` source (reference lib.rs:214-216; its
    * `component::list_components` walks the same registries the builders
    * dispatch on, so enumerating the literal Maps here is exact). */
  def componentRegistry: Map[String, Seq[String]] = Map(
    "input" -> inputBuilders.keys.toSeq.sorted,
    "processor" -> Processors.builders.keys.toSeq.sorted,
    "output" -> sinkBuilders.keys.toSeq.sorted,
    "buffer" -> bufferBuilders.keys.toSeq.sorted,
    "codec" -> codecKinds.sorted)

  def run(spark: SparkSession, conf: EngineConf): Seq[StreamingQuery] =
    Config.streamIds(conf).zip(conf.streams).flatMap { case (id, s) =>
      runStream(spark, s, id)
    }

  /** Resolve and run ONE stream of a config under its control-plane id
    * (the query name — how `/streams/{id}` lifecycle routes find it).
    * Streaming inputs return the live query; batch inputs run once to
    * EOF and return None (a re-`start` re-runs the batch, the
    * reference's one-shot lifecycle). */
  def runStream(spark: SparkSession, s: StreamConf,
      id: String): Option[StreamingQuery] = {
    val in = inputFromConf(spark, s.input)
    val procs = inputCodec(s.input) ++ bufferProcessors(s.buffer, s.input) ++
      Processors.fromConf(s.processors, s.temporaries)
    val sink = sinkFromConf(s.output)
    val err = s.errorOutput.map(sinkFromConf)
    if (in.isStreaming)
      Some(start(in, procs, sink, err,
        // the buffer's cadence is the trigger: tumbling/sliding fire per
        // `interval`. A session buffer triggers FASTER than its gap
        // (gap/5, floor 50 ms): the gap test compares consecutive
        // ARRIVALS, so the trigger must resolve finer than the gap or a
        // steady stream whose batches land ~gap apart would spuriously
        // close a session per batch (the reference's timer checks at
        // message granularity for the same reason).
        trigger = s.buffer.flatMap(b =>
            b.options.get("interval")
              .map(i => Config.triggerInterval(i))
              .orElse(b.options.get("gap").map(g =>
                s"${math.max(Config.parseDurationMs(g) / 5, 50L)} milliseconds")))
          .map(Trigger.ProcessingTime(_))
          .getOrElse(Trigger.ProcessingTime(0L)),
        checkpoint = resolvedCheckpoint(s, id),
        queryName = Some(id)))
    else {
      runBatch(in, procs, sink, err)
      None
    }
  }

  /** The stream-level `durability:` block (stream/mod.rs WalConfig —
    * enabled/path/sync/compression) maps onto the Spark CHECKPOINT, which
    * is this engine's WAL: offsets are logged before processing and
    * commits after the sink confirms, so restart replays unacknowledged
    * batches — the reference's read-log/ack-on-output contract
    * (durability_example.yaml). The input's own `checkpoint` option takes
    * precedence when both are set (it is the more specific knob).
    * `sync`/`compression` tuning is checkpoint-native in Spark (HDFS
    * client flush + compact log format) — accepted with a notice, never
    * silently meaningful.
    *
    * A `durability:` block WITHOUT `path:` still yields a durable stream:
    * the reference's WalConfig defaults the path (wal/mod.rs:72-74,
    * enabled defaults true at :68-70) rather than dropping durability, so
    * degrading to non-durable here would silently lose what the user
    * explicitly asked for. We default to a deterministic per-stream
    * location, `./data/wal/<stream-id>`, and say so loudly. */
  /** The checkpoint location a stream actually runs with: the input's
    * own `checkpoint` option when set (the more specific knob), else the
    * `durability:` block's mapping. This is the exact expression
    * [[runStream]] passes to [[start]] — factored out so the precedence
    * rule is unit-testable. */
  def resolvedCheckpoint(s: StreamConf, id: String): Option[String] =
    s.input.options.get("checkpoint").orElse(durabilityCheckpoint(s, id))

  def durabilityCheckpoint(s: StreamConf, id: String): Option[String] = {
    if (s.durability.isEmpty) None
    else if (s.durability.get("enabled").exists(e =>
        e.equalsIgnoreCase("false") || e == "0")) None
    else {
      Seq("sync", "compression").foreach(k => s.durability.get(k).foreach(v =>
        System.err.println(s"[engine] durability.$k '$v' noted: WAL sync and " +
          "compaction are native to the Spark checkpoint (offsets are always " +
          "flushed before a batch runs); the option does not change behavior")))
      s.durability.get("path").filter(_.nonEmpty).orElse {
        val fallback = s"./data/wal/$id"
        System.err.println(
          "[engine] durability block without `path:` — defaulting the " +
            s"checkpoint to '$fallback' (the reference's WAL also opens at " +
            "a default path rather than dropping durability); set " +
            "durability.path to control the location")
        Some(fallback)
      }
    }
  }

  /** Batch input: run the pipeline once, EOF semantics — with the same
    * NonFatal error_output divert the streaming path has (a failing batch
    * pipeline routes the input whole, tagged `__error`, to the error sink
    * instead of throwing). */
  def runBatch(in: DataFrame, procs: Seq[Processors.BatchTransform],
      sink: BatchSink, err: Option[BatchSink]): Unit =
    try {
      // same held-back short-circuit as the streaming fold: a sentinel
      // (e.g. JsonToArrow's zero-row inference guard) skips the sink.
      // Processors run through their PLAIN apply — a one-shot batch has
      // no meaningful batch id, and handing it a constant one would flip
      // a staged BatchAccumulator onto the cross-run staging path where
      // every run overwrites the same __acc_batch=0 partition.
      var out = in
      var heldBack = false
      val it = procs.iterator
      while (it.hasNext && !heldBack) {
        out = it.next()(out)
        heldBack = out.schema.isEmpty
      }
      if (!heldBack) sink.write(out, 0L)
      // EOF drain: a rate_cap carries overflow to "the next trigger",
      // but a one-shot batch has none — without this loop the held rows
      // would silently vanish at EOF. Feed empty batches until the carry
      // empties; the guard stops if an iteration makes no progress
      // (e.g. a downstream sentinel hold-back swallowing the release).
      val caps = procs.collect { case rc: Processors.RateCap => rc }
      var remaining = caps.map(_.pendingRows).sum
      // each drain release gets its own batch id: the idempotent sinks
      // partition/dedupe BY id, and re-using 0 would overwrite the
      // initial release
      var drainId = 1L
      while (remaining > 0) {
        var drain = in.limit(0)
        var held2 = false
        val it2 = procs.iterator
        while (it2.hasNext && !held2) {
          drain = it2.next()(drain)
          held2 = drain.schema.isEmpty
        }
        if (!held2) sink.write(drain, drainId)
        drainId += 1
        val now = caps.map(_.pendingRows).sum
        if (now >= remaining && now > 0)
          // no progress with rows still held: a downstream processor
          // (e.g. a sentinel hold-back) swallowed the release — the
          // loop must stop, but the loss has to be OBSERVABLE, not
          // silent: divert the held rows to the error output if there
          // is one, and say so either way
          try {
            System.err.println(
              s"[engine] EOF drain stalled with $now rate_cap rows still held; " +
                err.fold("no error_output configured — rows dropped")(_ =>
                  "diverting held rows to error_output"))
            err.foreach { errSink =>
              caps.foreach { rc =>
                var more = rc.pendingRows > 0
                while (more) { // each release pass caps at max_rows
                  val held = rc(in.limit(0))
                  errSink.write(held.withColumn("__error",
                    lit("rate_cap carry undeliverable at EOF")), drainId)
                  drainId += 1
                  more = rc.pendingRows > 0
                }
              }
            }
          } catch { case scala.util.control.NonFatal(e) =>
            System.err.println(s"[engine] EOF drain divert failed: ${e.getMessage}")
          }
        remaining = if (now < remaining) now else 0L
      }
      caps.foreach(_.releaseCache()) // last drain pass's cache
      // EOF flush of still-open session windows (the reference's
      // buffer.flush() + final read at stream end, stream/mod.rs:356-362):
      // the flushed session runs through the processors DOWNSTREAM of its
      // buffer (the window join + pipeline), then writes under a fresh
      // drain id. Sliding windows intentionally drop partial windows at
      // EOF, like the reference's close.
      procs.zipWithIndex.collect {
        case (b: Processors.SessionWindowBuffer, i) => (b, i)
      }.foreach { case (b, i) =>
        b.flushPending().foreach { session =>
          var out = session
          var held = false
          val it3 = procs.drop(i + 1).iterator
          while (it3.hasNext && !held) {
            out = it3.next()(out)
            held = out.schema.isEmpty
          }
          if (!held) sink.write(out, drainId)
          drainId += 1
        }
      }
    } catch {
      case scala.util.control.NonFatal(e) =>
        err match {
          case Some(errSink) =>
            errSink.write(in.withColumn("__error", lit(e.getMessage)), 0L)
          case None => throw e
        }
    }
}
