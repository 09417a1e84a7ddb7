package graft.streaming

import org.apache.spark.sql.SparkSession

/** CLI entry point — the equivalent of the reference's
  * `arkflow --config stream.yaml` (crates/arkflow/src/main.rs:24-40):
  * load the YAML engine config, run every stream.
  *
  * Usage: runMain graft.streaming.Main <config.yaml> [maxSeconds]
  * Streaming queries run until maxSeconds (default: forever).
  */
object Main {
  def main(args: Array[String]): Unit = {
    val configPath = args(0)
    val maxSeconds = args.lift(1).map(_.toLong)
    // GraftSession (round-18): the CLI runs under the SAME engine config
    // the bench measures — before this, the AQE coalescing floor and
    // tmpfs shuffle dir existed only in the benchmark session, so a real
    // consumer got a differently-configured engine than the one graded.
    val spark = graft.GraftSession.builder()
      .appName("graft")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val yaml = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(configPath)), java.nio.charset.StandardCharsets.UTF_8)
    val conf = Config.fromYaml(yaml)
    // the reference engine serves its control-plane API beside the
    // streams (arkflow/src/main.rs `serve(engine.control_plane(), ...)`);
    // the id -> config registry backs the start/restart lifecycle routes
    val registry = Config.streamIds(conf).zip(conf.streams)
    val cp = conf.http.map(h =>
      new ControlPlane(spark, h.port, h.bearerToken, registry, h.versionDir))
    cp.foreach(c => println(s"[graft] control plane on port ${c.boundPort}"))
    val queries = Engine.run(spark, conf)
    // graceful shutdown: stop streams (ALL active ones — lifecycle routes
    // may have started queries beyond the initial set), release connector
    // inputs, stop the API — the reference's cancellation-token path
    def shutdown(): Unit = {
      spark.streams.active.foreach(q => try q.stop() catch {
        case scala.util.control.NonFatal(_) => () })
      Engine.closeConfigInputs()
      cp.foreach(_.stop())
    }
    Runtime.getRuntime.addShutdownHook(new Thread(() => shutdown(), "graft-shutdown"))
    maxSeconds match {
      case Some(s) =>
        Thread.sleep(s * 1000)
        shutdown()
      case None =>
        // with a control plane, stopped streams can be restarted over
        // HTTP at any time — stay up as a service until killed; without
        // one, exit when the configured queries terminate
        if (cp.isDefined) while (true) Thread.sleep(60000)
        else queries.foreach(_.awaitTermination())
    }
    spark.stop()
  }
}
