package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Streaming/batch pipeline throughput measurement (rows/sec) for the
  * engine runtime — the single-node number the reference quotes for its
  * pipelines. Two paths:
  *
  *   - batch EOF pipeline: `generate count=N` with a JSON context →
  *     json_to_arrow → sql transform → drop (the reference's
  *     generate→pipeline→drop benchmark shape);
  *   - micro-batch streaming: the engine's rate input run saturated
  *     through the same processors via Engine.start, throughput taken
  *     from Spark's progress metrics after warm-up.
  *
  * PINNED PROTOCOL (cross-round numbers compare only under it; the
  * round-12→13 "7.9M→4.4-5.2M rows/s" batch delta traced to run length
  * and machine state, not code):
  *   - batch: 8M rows per rep, 2 untimed warm-up reps (C2 compilation of
  *     the codec+codegen paths takes the first ~2 reps), then 5 timed
  *     reps recording the MIN; all reps printed so a contended run is
  *     visible in the artifact.
  *   - stream: 30 s saturated window (offered load 6M rows/s), first 4
  *     micro-batches dropped as warm-up, throughput = rows over
  *     trigger-execution time.
  *   - session: local[32], 32 shuffle partitions.
  * A row-count argument overrides for DEV runs only — the printed
  * protocol line marks any non-pinned run as such.
  *
  * Usage: runMain graft.streaming.ThroughputBench [totalRows]
  */
object ThroughputBench {
  val PinnedRows = 8000000L

  /** Quiet-machine calibration pin: [[graft.Bench.calibrate]] seconds in
    * the band the protocol's 8-12 M rows/s numbers were recorded at
    * (rounds 12-13 pin runs: 0.394-0.454 s). A session whose calib reads
    * past [[CalibGate]]× this is CONTENDED — the run still prints its
    * numbers as diagnostics, but marks them non-protocol so a depressed
    * sample can never enter the recorded band (the round-14 sample read
    * ~2.5× low for exactly this reason). */
  val PinnedCalib = 0.45
  val CalibGate = 1.5

  /** The standing PROTOCOL band (round-15 quiet-window run, calib
    * 0.580 against the 0.675 gate; BASELINE.md protocol table): BOTH
    * modes are pinned — batch AND micro-batch streaming — so a
    * contended run's refusal text can restate the full band and a
    * depressed sample can never silently shrink either row. */
  val ProtocolBand: String =
    "batch 11.34 (sql) / 10.55 (vrl) M rows/s; " +
      "micro-batch streaming 15.76 (sql) / 15.04 (vrl) M rows/s " +
      "[recorded at calib 0.580]"

  def main(args: Array[String]): Unit = {
    val totalRows = args.headOption.map(_.toLong).getOrElse(PinnedRows)
    println(s"protocol: batch ${totalRows / 1000000}M rows, 2 warm-ups + " +
      "5 timed reps (min); stream 30s saturated window, 4 warm-up batches " +
      "dropped; local[32]" +
      (if (totalRows == PinnedRows) "" else " [DEV RUN — row count off-protocol]"))
    // GraftSession with the protocol's pinned core count (the recorded
    // throughput band is a local[32] figure; SPARK_GRAFT_CPUS must not
    // silently move it)
    val spark = graft.GraftSession.builder("32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // calib FIRST (it doubles as the JIT warm-up the protocol wants
    // anyway): a contended machine is detected before any timed rep runs
    val calib = graft.Bench.calibrate(spark)
    val contended = calib > CalibGate * PinnedCalib
    println(f"calib: $calib%.3f s (pin $PinnedCalib%.2f, gate ${CalibGate * PinnedCalib}%.3f) — " +
      (if (contended)
        "CONTENDED: REFUSING to record a protocol row; numbers below are " +
          s"diagnostic only. The recorded protocol band STANDS: $ProtocolBand"
      else s"quiet window, protocol row valid (standing band: $ProtocolBand)"))

    val ctx = """{"device":"sensor-7","reading":41.5,"seq":12345}"""
    val procs = Seq(
      Processors.fromConf(Seq(ComponentConf("json_to_arrow", Map.empty))),
      Processors.fromConf(Seq(ComponentConf("sql",
        Map("query" -> "SELECT device, reading * 2 AS r2, seq FROM flow WHERE reading > 0")))))
      .flatten
    // a REPRESENTATIVE remap program (fallible assignment, stdlib calls,
    // expression-form if, `??`) — measures the VRL compiler's per-batch
    // planning overhead on top of the same codec + row volume; the
    // reference's context-pool test bounds exactly this per-batch cost
    // (processor/sql.rs:432-450)
    val vrlProcs = Seq(
      Processors.fromConf(Seq(ComponentConf("json_to_arrow", Map.empty))),
      Processors.fromConf(Seq(ComponentConf("vrl", Map("statement" ->
        """.dev = upcase(.device)
          |.r2, err = .reading * 2
          |.band = if .reading > 40 { "high" } else { "low" }
          |.seq2 = to_int(.seq) ?? 0
          |""".stripMargin)))))
      .flatten

    // --- batch EOF path (generate count=N) ---
    def runBatchOnce(ps: Seq[Processors.BatchTransform]): Double = {
      val in = Engine.inputFromConf(spark,
        ComponentConf("generate", Map("count" -> totalRows.toString, "context" -> ctx)))
      val t0 = System.nanoTime()
      Engine.runBatch(in, ps, Engine.NoopSink, None)
      (System.nanoTime() - t0) / 1e9
    }
    (1 to 2).foreach(_ => runBatchOnce(procs)) // warm codegen + JIT (protocol)
    val bs = (1 to 5).map(_ => runBatchOnce(procs))
    val bBest = bs.min
    println(f"batch: $totalRows rows in $bBest%.2f s = ${totalRows / bBest / 1e6}%.2f M rows/s (reps ${bs.map(s => f"$s%.2f").mkString("/")})")
    (1 to 2).foreach(_ => runBatchOnce(vrlProcs))
    val vs = (1 to 5).map(_ => runBatchOnce(vrlProcs))
    val vBest = vs.min
    println(f"batch-vrl: $totalRows rows in $vBest%.2f s = ${totalRows / vBest / 1e6}%.2f M rows/s (reps ${vs.map(s => f"$s%.2f").mkString("/")})")

    // --- micro-batch streaming path: the engine's own rate input, rows
    // generated ON EXECUTORS (MemoryStream would measure driver-side
    // serialization, not the pipeline). Offered load is set well above
    // capacity so the engine runs saturated; throughput = processed
    // rows over trigger-execution time from Spark's progress metrics,
    // first batches dropped as warm-up.
    def runStream(label: String, ps: Seq[Processors.BatchTransform]): Unit = {
      val in = Engine.inputFromConf(spark, ComponentConf("generate",
        Map("rows_per_second" -> "6000000", "context" -> ctx)))
      val q = Engine.start(in, ps, Engine.NoopSink, None,
        trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L),
        checkpoint = None)
      Thread.sleep(30000)
      q.stop()
      // durationMs is a java.util.Map — absent keys return null, so guard
      // with Option; and a window with <5 productive batches has nothing to
      // report (secs would be 0 → divide-by-zero), so bail with a message.
      val progress = q.recentProgress.drop(4)
        .filter(p => p.numInputRows > 0)
      val rows = progress.map(_.numInputRows).sum
      val secs = progress
        .flatMap(p => Option(p.durationMs.get("triggerExecution")).map(_.toLong))
        .sum / 1e3
      if (progress.isEmpty || secs <= 0)
        println(s"$label: too few productive micro-batches in the measurement " +
          s"window (${progress.length} after warm-up) — no throughput to report")
      else
        println(f"$label: $rows rows / ${progress.length} micro-batches in $secs%.2f s busy = ${rows / secs / 1e6}%.2f M rows/s (${progress.length / secs}%.1f batches/s)")
    }
    runStream("stream", procs)
    runStream("stream-vrl", vrlProcs)
    spark.stop()
  }
}
