package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Config-level window BUFFER e2e: the `sliding_window` /
  * `session_window` buffer kinds parsed from YAML and run through the
  * engine's own dispatch ([[Engine.bufferProcessors]] →
  * [[Processors.SlidingWindowBuffer]] / [[Processors.SessionWindowBuffer]])
  * against live micro-batch streams — mirroring the reference's own
  * buffer tests (sliding_window.rs:306-, session_window.rs:250-) with
  * Spark's micro-batch as the message-batch unit.
  */
class WindowBufferSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("sliding_window buffer from YAML: window_size=3 slide_size=2 over 5 " +
      "micro-batches emits [1,2,3] then [3,4,5] (sliding_window.rs process_slide)") {
    val conf = Config.fromYaml(
      """streams:
        |  - input:
        |      type: "generate"
        |      count: 1
        |    buffer:
        |      type: "sliding_window"
        |      window_size: 3
        |      slide_size: 2
        |      interval: 10ms
        |    output:
        |      type: "drop"
        |""".stripMargin)
    val s = conf.streams.head
    val procs = Engine.bufferProcessors(s.buffer, s.input)
    assert(procs.size == 1 && procs.head.isInstanceOf[Processors.SlidingWindowBuffer])
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[Int]
    val sink = new Engine.MemorySink
    val q = Engine.start(ms.toDF(), procs, sink,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
    try {
      (1 to 5).foreach { i => ms.addData(i); q.processAllAvailable() }
    } finally q.stop()
    val windows = sink.batches.toSeq.sortBy(_._1)
      .map(_._2.map(_.getInt(0)).sorted.toList)
    assert(windows == Seq(List(1, 2, 3), List(3, 4, 5)),
      s"got $windows — want the two overlapping windows, partial [5] dropped")
  }

  test("sliding_window builder validation matches the reference's " +
      "(sliding_window.rs builder Error::Config cases)") {
    def build(w: Int, sl: Int) = Engine.bufferProcessors(
      Some(ComponentConf("sliding_window",
        Map("window_size" -> w.toString, "slide_size" -> sl.toString))))
    assertThrows[IllegalArgumentException](build(0, 5))
    assertThrows[IllegalArgumentException](build(10, 0))
    assertThrows[IllegalArgumentException](build(5, 10)) // window < slide
    assertThrows[IllegalArgumentException](Engine.bufferProcessors(
      Some(ComponentConf("sliding_window", Map.empty)))) // config missing
    assert(build(10, 5).size == 1)
  }

  test("session_window buffer from YAML: a batch arriving after the gap closes " +
      "the previous session (session_window.rs multiple-sessions test)") {
    val conf = Config.fromYaml(
      """streams:
        |  - input:
        |      type: "generate"
        |      count: 1
        |    buffer:
        |      type: "session_window"
        |      gap: 3s
        |    output:
        |      type: "drop"
        |""".stripMargin)
    val s = conf.streams.head
    val procs = Engine.bufferProcessors(s.buffer, s.input)
    assert(procs.size == 1 && procs.head.isInstanceOf[Processors.SessionWindowBuffer])
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[Int]
    val sink = new Engine.MemorySink
    val q = Engine.start(ms.toDF(), procs, sink,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
    try {
      ms.addData(1); q.processAllAvailable()
      ms.addData(2); q.processAllAvailable() // within gap -> same session
      Thread.sleep(4000)                     // silence > gap closes it
      ms.addData(3); q.processAllAvailable() // arrival emits session {1,2}
    } finally q.stop()
    assert(sink.rows.map(_.getInt(0)).sorted == Seq(1, 2),
      s"the closed session is {1,2}; batch 3 opens the next (still pending): ${sink.rows}")
  }

  test("STREAMING multiple_inputs from config: two unbounded generate " +
      "children fan in tagged, and the window join enriches across them " +
      "per micro-batch (input/multiple_inputs.rs streaming mode)") {
    val conf = Config.fromYaml(
      """streams:
        |  - input:
        |      type: "multiple_inputs"
        |      inputs:
        |        - type: "generate"
        |          name: "left_ticks"
        |          context: '{ "id": 9, "x": 1 }'
        |          rows_per_second: 40
        |        - type: "generate"
        |          name: "right_ticks"
        |          context: '{ "id": 9, "y": 2 }'
        |          rows_per_second: 40
        |    buffer:
        |      type: "tumbling_window"
        |      interval: 300ms
        |      join:
        |        query: "SELECT left_ticks.id AS id, x, y FROM left_ticks JOIN right_ticks ON left_ticks.id = right_ticks.id"
        |        codec:
        |          type: "json"
        |    output:
        |      type: "drop"
        |""".stripMargin)
    val s = conf.streams.head
    val in = Engine.inputFromConf(spark, s.input)
    assert(in.isStreaming, "generate without count is the unbounded rate stream")
    val procs = Engine.bufferProcessors(s.buffer, s.input)
    val sink = new Engine.MemorySink
    val q = Engine.start(in, procs, sink,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(300L))
    try {
      val deadline = System.nanoTime() + 30L * 1000000000L
      while (sink.rows.isEmpty && System.nanoTime() < deadline) Thread.sleep(100)
    } finally q.stop()
    assert(sink.rows.nonEmpty, "joined window rows must flow")
    val r = sink.rows.head
    assert(r.getAs[Long]("id") == 9L && r.getAs[Long]("x") == 1L &&
      r.getAs[Long]("y") == 2L)
  }

  test("session_window requires gap; unknown buffer kinds are rejected " +
      "(the dispatch is closed, not silently permissive)") {
    assertThrows[IllegalArgumentException](Engine.bufferProcessors(
      Some(ComponentConf("session_window", Map.empty))))
    assertThrows[IllegalArgumentException](Engine.bufferProcessors(
      Some(ComponentConf("no_such_buffer", Map.empty))))
  }

  test("session_window STOP flush: stopping the streaming query emits the " +
      "still-open session instead of dropping it (strictly more durable than " +
      "the reference's drop-at-close)") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val procs = Engine.bufferProcessors(
      Some(ComponentConf("session_window", Map("gap" -> "1h"))))
    val ms = MemoryStream[Int]
    val sink = new Engine.MemorySink
    val q = Engine.start(ms.toDF(), procs, sink,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
    ms.addData(41); q.processAllAvailable()
    ms.addData(42); q.processAllAvailable()
    assert(sink.rows.isEmpty, "session still open (1h gap)")
    q.stop()
    // the flush listener fires on the async listener bus
    val deadline = System.nanoTime() + 15L * 1000000000L
    while (sink.rows.isEmpty && System.nanoTime() < deadline) Thread.sleep(100)
    assert(sink.rows.map(_.getInt(0)).sorted == Seq(41, 42),
      s"open session must be flushed at stop: ${sink.rows}")
    // flush batches ride NEGATIVE ids — no collision with micro-batch ids
    assert(sink.batches.keys.forall(_ < 0L))
  }

  test("session_window stop flush survives IMMEDIATE termination: a query " +
      "that ends right at (or before) listener registration still flushes " +
      "the pending session — the start()/addListener race window") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val procs = Engine.bufferProcessors(
      Some(ComponentConf("session_window", Map("gap" -> "1h"))))
    val ms = MemoryStream[Int]
    ms.addData(7, 8) // preloaded: the only micro-batch
    val sink = new Engine.MemorySink
    // AvailableNow: the query drains the preloaded batch and TERMINATES ON
    // ITS OWN — depending on scheduling that termination lands before or
    // after Engine.start's listener registration. Either way the session
    // must flush exactly once: the terminated-event path and the
    // registration-time catch-up path share a CAS guard.
    val q = Engine.start(ms.toDF(), procs, sink,
      trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
    q.awaitTermination(30000)
    val deadline = System.nanoTime() + 15L * 1000000000L
    while (sink.rows.isEmpty && System.nanoTime() < deadline) Thread.sleep(100)
    assert(sink.rows.map(_.getInt(0)).sorted == Seq(7, 8),
      s"session dropped by the immediate-termination race: ${sink.rows}")
    // exactly once — not double-flushed by both paths
    assert(sink.batches.keys.toSeq.count(_ < 0L) == 1,
      s"flush ran more than once: ${sink.batches.keys.toSeq.sorted}")
  }

  test("session_window EOF flush: a one-shot batch input's single session " +
      "reaches the sink through the downstream processors (Engine.runBatch drain)") {
    import spark.implicits._
    val buf = Engine.bufferProcessors(
      Some(ComponentConf("session_window", Map("gap" -> "1s"))))
    val double = (df: org.apache.spark.sql.DataFrame) =>
      df.withColumn("y", org.apache.spark.sql.functions.col("x") * 2)
    val sink = new Engine.MemorySink
    Engine.runBatch(Seq(1, 2, 3).toDF("x"), buf ++ Seq(double), sink, None)
    assert(sink.rows.map(r => (r.getInt(0), r.getInt(1))).sorted ==
      Seq((1, 2), (2, 4), (3, 6)))
  }
}
