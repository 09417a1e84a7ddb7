package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

/** Compatibility sweep over the REFERENCE ENGINE'S OWN example configs
  * (every .yaml under /root/reference/examples, read-only): every stream config a
  * reference user has today must parse under [[Config.fromYaml]] and
  * resolve every top-level component kind against this engine's
  * registries — the concrete form of the "switch engines and run what
  * you run today" claim. Divergences must be EXPLICIT entries below
  * with a documented rationale, never silent failures.
  */
class ReferenceExamplesSpec extends AnyFunSuite {

  private val dir = new java.io.File("/root/reference/examples")

  // Non-stream topology files: the hub/agent control plane maps to
  // Spark's own cluster manager (README §hub), not to a stream config.
  private val structuralSkips: Set[String] = Set(
    "control_plane_hub.yaml", "control_plane_node.yaml")

  private val supportedInputs = Set(
    "generate", "memory", "file", "kafka", "sql", "redis", "modbus",
    "http", "mqtt", "nats", "websocket", "pulsar", "multiple_inputs")
  private val supportedOutputs = Set(
    "parquet", "stdout", "drop", "memory", "sql", "http", "kafka",
    "influxdb", "redis", "nats", "mqtt", "mongodb", "pulsar")
  private val supportedProcessors = Set(
    "sql", "json_to_arrow", "arrow_to_json", "protobuf_to_arrow",
    "arrow_to_protobuf", "debezium_json", "batch", "drift", "expr",
    "python", "vrl", "remap")
  // Window buffers resolve through the buffer registry.
  private val supportedBuffers = Set(
    "memory", "tumbling_window", "sliding_window", "session_window",
    "window", "join")

  private def yamlFiles: Seq[java.io.File] =
    Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".yaml")).sortBy(_.getName).toSeq

  test("reference examples directory is present and non-trivial") {
    assert(yamlFiles.size >= 20, s"expected the reference example corpus, found ${yamlFiles.size}")
  }

  test("every reference stream example parses and its component kinds resolve") {
    val problems = scala.collection.mutable.ArrayBuffer.empty[String]
    yamlFiles.filterNot(f => structuralSkips(f.getName)).foreach { f =>
      val text = new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
      try {
        val conf = Config.fromYaml(text)
        conf.streams.foreach { s =>
          if (!supportedInputs(s.input.kind))
            problems += s"${f.getName}: input '${s.input.kind}'"
          if (!supportedOutputs(s.output.kind))
            problems += s"${f.getName}: output '${s.output.kind}'"
          s.errorOutput.foreach(e => if (!supportedOutputs(e.kind))
            problems += s"${f.getName}: error_output '${e.kind}'")
          s.buffer.foreach(b => if (!supportedBuffers(b.kind))
            problems += s"${f.getName}: buffer '${b.kind}'")
          s.processors.foreach(p => if (!supportedProcessors(p.kind))
            problems += s"${f.getName}: processor '${p.kind}'")
        }
      } catch {
        case e: Exception => problems += s"${f.getName}: parse failed (${e.getMessage})"
      }
    }
    assert(problems.isEmpty,
      "reference configs this engine cannot accept:\n  " + problems.mkString("\n  "))
  }
}
