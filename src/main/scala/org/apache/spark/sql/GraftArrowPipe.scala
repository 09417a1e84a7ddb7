package org.apache.spark.sql

import scala.jdk.CollectionConverters._

import org.apache.arrow.vector.VectorSchemaRoot
import org.apache.arrow.vector.ipc.{ArrowStreamReader, ArrowStreamWriter}
import org.apache.spark.TaskContext
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.arrow.ArrowWriter
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.ArrowUtils
import org.apache.spark.sql.vectorized.{ArrowColumnVector, ColumnarBatch, ColumnVector}

/** Arrow-IPC subprocess interchange — the Spark shape of the reference's
  * python processor (processor/python.rs:27-140: RecordBatch → PyArrow →
  * RecordBatch). Each partition streams its rows to a `python3` worker as
  * an Arrow IPC stream over stdin, the worker applies a user
  * `transform(batch)` with pyarrow, and the JVM reads the result stream
  * back — the same wire contract `mapInArrow` uses, without requiring the
  * job to be authored in PySpark. One worker per task, both directions
  * streaming (a writer thread feeds stdin while the task thread consumes
  * stdout), so no partition is ever materialized in memory.
  *
  * Lives in the `org.apache.spark.sql` package for the `private[sql]`
  * Arrow converters (ArrowWriter/ArrowUtils) — the same bridge pattern as
  * [[GraftInternal]].
  */
object GraftArrowPipe {

  /** Is a python3 with pyarrow importable on this host? (Probed once;
    * the python processor is unavailable — with a clear error — when not.) */
  lazy val pythonArrowAvailable: Boolean =
    try {
      val p = new ProcessBuilder("python3", "-c", "import pyarrow").start()
      p.waitFor() == 0
    } catch { case _: java.io.IOException => false }

  /** The reference python processor's module/function contract
    * (processor/python.rs:27-145): `script` is a FULL Python module
    * source run into `__main__` (py.run), `module` names where the
    * callable lives (default `__main__`), `function` names the callable,
    * and `pythonPath` entries are prepended to sys.path (after an
    * implicit "."). The engine's body-only shorthand (no `function:`)
    * compiles to a script defining `transform` — see [[PythonEntry.body]]. */
  final case class PythonEntry(script: Option[String], module: Option[String],
      function: String, pythonPath: Seq[String]) {
    require(function.matches("[A-Za-z_][A-Za-z0-9_]*"),
      s"python processor: `function` must be a Python identifier, got `$function`")
    module.foreach(m => require(m.matches("[A-Za-z_][A-Za-z0-9_.]*"),
      s"python processor: `module` must be a Python module name, got `$m`"))
    require(script.nonEmpty || module.nonEmpty,
      "python processor: needs `script` (inline module source) or `module` (import)")
  }
  object PythonEntry {
    /** Body-only shorthand: indented statements of a fixed
      * `transform(batch)` function. */
    def body(b: String): PythonEntry =
      PythonEntry(Some("def transform(batch):\n" + b), None, "transform", Nil)
  }

  private def pyStrLit(s: String): String =
    "\"" + s.flatMap {
      case '\\' => "\\\\"
      case '"' => "\\\""
      case '\n' => "\\n"
      case c => c.toString
    } + "\""

  /** Run the entry's callable over every Arrow batch of every partition.
    * Mirrors processor/python.rs order exactly: sys.path setup → import
    * `module` → run `script` into `__main__` (the worker IS `__main__`,
    * so the source is inlined verbatim) → getattr(module, function).
    * The callable may return a RecordBatch, a list/tuple of
    * RecordBatches, or a Table (the reference's Single/Multiple
    * ProcessResult); every batch in one worker stream must share the
    * first batch's schema (Arrow IPC is single-schema — pyarrow raises
    * otherwise, which surfaces as the task error). */
  private def workerScript(e: PythonEntry): String = {
    val pathInserts = ("." +: e.pythonPath)
      .map(p => s"sys.path.insert(0, ${pyStrLit(p)})").mkString("\n")
    val moduleLit = pyStrLit(e.module.getOrElse("__main__"))
    // the user script is concatenated AFTER each template fragment is
    // stripMargin'd — interpolating it into the margin template would
    // silently truncate any script line whose first non-blank char is
    // '|' (an ASCII table in a docstring, a `x \n  | y` continuation).
    // pathInserts/moduleLit are safe to interpolate: pyStrLit escapes
    // newlines, so neither can start a template line.
    val prelude = s"""import sys
       |import importlib
       |import pyarrow as pa
       |
       |$pathInserts
       |_graft_mod = importlib.import_module($moduleLit)
       |""".stripMargin
    prelude + e.script.map(_ + "\n").getOrElse("") + s"""_graft_entry = getattr(_graft_mod, ${pyStrLit(e.function)})
       |
       |reader = pa.ipc.open_stream(sys.stdin.buffer)
       |writer = None
       |def _graft_write(b):
       |    global writer
       |    if writer is None:
       |        writer = pa.ipc.new_stream(sys.stdout.buffer, b.schema)
       |    writer.write_batch(b)
       |for batch in reader:
       |    out = _graft_entry(batch)
       |    if isinstance(out, pa.RecordBatch):
       |        _graft_write(out)
       |    elif isinstance(out, pa.Table):
       |        for b in out.to_batches():
       |            _graft_write(b)
       |    elif isinstance(out, (list, tuple)):
       |        for b in out:
       |            if not isinstance(b, pa.RecordBatch):
       |                raise TypeError(
       |                    "python processor: list element is not a RecordBatch: %r"
       |                    % (type(b),))
       |            _graft_write(b)
       |    else:
       |        raise TypeError(
       |            "python processor: transform must return a RecordBatch, a "
       |            "list of RecordBatches, or a Table, got %r" % (type(out),))
       |if writer is not None:
       |    writer.close()
       |""".stripMargin
  }

  def pipePython(df: DataFrame, body: String, outSchema: StructType,
      batchSize: Int = 4096): DataFrame =
    pipePython(df, PythonEntry.body(body), outSchema, batchSize)

  def pipePython(df: DataFrame, entry: PythonEntry, outSchema: StructType,
      batchSize: Int): DataFrame = {
    require(pythonArrowAvailable,
      "python processor needs python3 with pyarrow on the worker hosts")
    // The script travels INSIDE the task closure (as an argv element), so
    // it exists wherever the task runs — a driver-local temp file would be
    // missing on every executor host of a real cluster.
    pipePartitions(df, Seq("python3", "-c", workerScript(entry)), outSchema, batchSize)
  }

  /** Infer the post-transform schema the way the REFERENCE does — from
    * the worker's returned RecordBatch (processor/python.rs runs the
    * transform and takes the result's schema, per batch) — by running
    * the SAME worker once, driver-side, over a bounded sample of the
    * batch, and reading the returned stream's schema. None for an empty
    * batch (the transform never runs, so there is nothing to infer —
    * callers pass the empty frame through). Cost per micro-batch: one
    * local python3 spawn + ≤`sampleRows` rows, independent of cluster
    * size; the distributed pass then runs with the inferred schema. */
  def inferPythonSchema(df: DataFrame, body: String,
      sampleRows: Int = 8): Option[StructType] =
    inferPythonSchema(df, PythonEntry.body(body), sampleRows)

  def inferPythonSchema(df: DataFrame, entry: PythonEntry,
      sampleRows: Int): Option[StructType] = {
    require(pythonArrowAvailable,
      "python processor needs python3 with pyarrow on this host")
    val spark = df.sparkSession.asInstanceOf[classic.SparkSession]
    val rows = df.limit(sampleRows).queryExecution.executedPlan.executeCollect()
    if (rows.isEmpty) None
    else {
      val tz = spark.sessionState.conf.sessionLocalTimeZone
      val allocator = ArrowUtils.rootAllocator.newChildAllocator(
        s"graft_infer_${java.util.UUID.randomUUID()}", 0, Long.MaxValue)
      val arrowSchema = ArrowUtils.toArrowSchema(df.schema, tz,
        errorOnDuplicatedFieldNames = true, largeVarTypes = false)
      val root = VectorSchemaRoot.create(arrowSchema, allocator)
      val proc = new ProcessBuilder(
        Seq("python3", "-c", workerScript(entry)).asJava)
        .redirectError(ProcessBuilder.Redirect.INHERIT).start()
      try {
        val arrowWriter = ArrowWriter.create(root)
        val out = new java.io.BufferedOutputStream(proc.getOutputStream)
        val sw = new ArrowStreamWriter(root, null, out)
        sw.start()
        rows.foreach(arrowWriter.write)
        arrowWriter.finish()
        sw.writeBatch()
        sw.end()
        out.close()
        val reader = new ArrowStreamReader(
          new java.io.BufferedInputStream(proc.getInputStream), allocator)
        try {
          if (!reader.loadNextBatch())
            throw new RuntimeException(
              "python schema inference: the worker returned no batch for a " +
                "non-empty sample (did transform() return None?)")
          Some(ArrowUtils.fromArrowSchema(reader.getVectorSchemaRoot.getSchema))
        } finally reader.close()
      } finally {
        try root.close() finally { proc.destroy(); allocator.close() }
      }
    }
  }

  /** Arrow IPC FILE format input (the reference file input's `arrow`
    * format, input/file.rs register_arrow): `binaryFiles` distributes the
    * file set, each task materializes its file's record batches through
    * `ArrowFileReader` (the file format is random-access, so the task
    * buffers one file's bytes — arrow files are bounded by writer-side
    * batch size). Schema read once, driver-side, from the first footer.
    */
  def readArrowFiles(session: SparkSession, path: String): DataFrame = {
    val spark = session.asInstanceOf[classic.SparkSession]
    val bin = spark.sparkContext.binaryFiles(path)
    val first = bin.values.take(1)
    require(first.nonEmpty, s"arrow input: no files under $path")
    val schema = {
      val allocator = ArrowUtils.rootAllocator.newChildAllocator("graft_arrow_schema", 0, Long.MaxValue)
      val reader = new org.apache.arrow.vector.ipc.ArrowFileReader(
        new org.apache.arrow.vector.util.ByteArrayReadableSeekableByteChannel(
          first.head.toArray()), allocator)
      try ArrowUtils.fromArrowSchema(reader.getVectorSchemaRoot.getSchema)
      finally { reader.close(); allocator.close() }
    }
    val outRdd = bin.values.flatMap { pds =>
      val allocator = ArrowUtils.rootAllocator.newChildAllocator(
        s"graft_arrow_read_${java.util.UUID.randomUUID()}", 0, Long.MaxValue)
      val reader = new org.apache.arrow.vector.ipc.ArrowFileReader(
        new org.apache.arrow.vector.util.ByteArrayReadableSeekableByteChannel(
          pds.toArray()), allocator)
      Option(TaskContext.get()).foreach(_.addTaskCompletionListener[Unit] { _ =>
        reader.close(); allocator.close()
      })
      new Iterator[InternalRow] {
        private var current: Iterator[InternalRow] = Iterator.empty
        private var done = false
        override def hasNext: Boolean = {
          while (!current.hasNext && !done) {
            if (reader.loadNextBatch()) {
              val vroot = reader.getVectorSchemaRoot
              val cols = vroot.getFieldVectors.asScala
                .map(v => new ArrowColumnVector(v): ColumnVector).toArray
              current = new ColumnarBatch(cols, vroot.getRowCount)
                .rowIterator().asScala.map(_.copy())
            } else done = true
          }
          current.hasNext
        }
        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException
          current.next()
        }
      }
    }
    spark.internalCreateDataFrame(outRdd, schema)
  }

  /** Generic per-partition Arrow IPC pipe through an external command. */
  def pipePartitions(df: DataFrame, command: Seq[String], outSchema: StructType,
      batchSize: Int): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[classic.SparkSession]
    val inSchema = df.schema
    val tz = spark.sessionState.conf.sessionLocalTimeZone
    val outRdd = df.queryExecution.toRdd.mapPartitions { rows =>
      if (!rows.hasNext) Iterator.empty
      else pipeOnePartition(rows, command, inSchema, outSchema, tz, batchSize)
    }
    spark.internalCreateDataFrame(outRdd, outSchema)
  }

  /** The worker's returned schema must agree with `outSchema` (names +
    * types, nullability ignored): the rows are re-bound to `outSchema`
    * by `internalCreateDataFrame`, so a silent disagreement (an inferred
    * schema pinned from a sample that doesn't represent this batch, or a
    * wrong declared DDL) would mis-read memory downstream. */
  private def checkReturnedSchema(actual: StructType, expected: StructType): Unit = {
    val ok = actual.length == expected.length &&
      actual.fields.zip(expected.fields).forall { case (a, e) =>
        a.name == e.name && org.apache.spark.sql.types.DataType
          .equalsIgnoreNullability(a.dataType, e.dataType)
      }
    if (!ok) throw new RuntimeException(
      "python processor: the worker returned a batch whose schema " +
        s"disagrees with the expected output schema.\n  returned: " +
        s"${actual.toDDL}\n  expected: ${expected.toDDL}\nWhen the schema " +
        "was inferred from a sample (no `output_schema:` declared), the " +
        "sample may not represent every batch (e.g. an all-null column); " +
        "declare `output_schema:` to pin the contract.")
  }

  private def pipeOnePartition(rows: Iterator[InternalRow], command: Seq[String],
      inSchema: StructType, outSchema: StructType, tz: String,
      batchSize: Int): Iterator[InternalRow] = {
    val allocator = ArrowUtils.rootAllocator.newChildAllocator(
      s"graft_pipe_${java.util.UUID.randomUUID()}", 0, Long.MaxValue)
    val arrowSchema = ArrowUtils.toArrowSchema(inSchema, tz,
      errorOnDuplicatedFieldNames = true, largeVarTypes = false)
    val root = VectorSchemaRoot.create(arrowSchema, allocator)

    val proc = new ProcessBuilder(command.asJava)
      .redirectError(ProcessBuilder.Redirect.INHERIT).start()

    // feeder thread: task rows -> arrow batches -> worker stdin
    val feederError = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val feeder = new Thread(() => {
      try {
        val arrowWriter = ArrowWriter.create(root)
        val out = new java.io.BufferedOutputStream(proc.getOutputStream)
        val streamWriter = new ArrowStreamWriter(root, null, out)
        streamWriter.start()
        while (rows.hasNext) {
          var n = 0
          while (rows.hasNext && n < batchSize) { arrowWriter.write(rows.next()); n += 1 }
          arrowWriter.finish()
          streamWriter.writeBatch()
          arrowWriter.reset()
        }
        streamWriter.end()
        out.close()
      } catch { case t: Throwable => feederError.set(t) }
      finally root.close()
    }, "graft-arrow-pipe-feeder")
    feeder.setDaemon(true)
    feeder.start()

    val reader = new ArrowStreamReader(
      new java.io.BufferedInputStream(proc.getInputStream), allocator)

    def cleanup(): Unit = {
      try reader.close() finally {
        proc.destroy()
        allocator.close()
      }
    }
    Option(TaskContext.get()).foreach(_.addTaskCompletionListener[Unit](_ => cleanup()))

    new Iterator[InternalRow] {
      private var current: Iterator[InternalRow] = Iterator.empty
      private var done = false
      private var schemaChecked = false
      override def hasNext: Boolean = {
        while (!current.hasNext && !done) {
          if (feederError.get() != null) throw feederError.get()
          if (reader.loadNextBatch()) {
            val vroot = reader.getVectorSchemaRoot
            if (!schemaChecked) {
              checkReturnedSchema(
                ArrowUtils.fromArrowSchema(vroot.getSchema), outSchema)
              schemaChecked = true
            }
            val cols = vroot.getFieldVectors.asScala
              .map(v => new ArrowColumnVector(v): ColumnVector).toArray
            val cb = new ColumnarBatch(cols, vroot.getRowCount)
            current = cb.rowIterator().asScala.map(_.copy())
          } else {
            done = true
            val exit = proc.waitFor()
            if (exit != 0)
              throw new RuntimeException(s"arrow pipe worker exited with $exit")
          }
        }
        current.hasNext
      }
      override def next(): InternalRow = {
        if (!hasNext) throw new NoSuchElementException
        current.next()
      }
    }
  }
}
