package graft.streaming

import java.nio.charset.StandardCharsets
import org.apache.spark.sql.DataFrame

/** HTTP output (SURVEY.md §2.2; reference output/http.rs:36-60: POSTs each
  * batch body to a URL with optional auth). The symmetric twin of
  * [[HttpInput]]: rows serialize to JSON lines and POST from the
  * EXECUTORS via foreachPartition — no driver-side collect, so the sink
  * scales with partitions; `rows_per_request` bounds each POST body.
  * Non-2xx responses throw, failing the batch (routes to error_output or
  * retries under the engine's policy).
  */
final case class HttpOutputSink(url: String, bearerToken: Option[String] = None,
    rowsPerRequest: Int = 1000) extends Engine.BatchSink {

  def write(batch: DataFrame, batchId: Long): Unit = {
    val (u, tok, cap) = (url, bearerToken, rowsPerRequest)
    batch.toJSON.foreachPartition { (rows: Iterator[String]) =>
      rows.grouped(cap).foreach { lines =>
        val conn = new java.net.URI(u).toURL.openConnection()
          .asInstanceOf[java.net.HttpURLConnection]
        try {
          conn.setRequestMethod("POST")
          conn.setDoOutput(true)
          conn.setRequestProperty("Content-Type", "application/x-ndjson")
          tok.foreach(t => conn.setRequestProperty("Authorization", s"Bearer $t"))
          val out = conn.getOutputStream
          try out.write(lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
          finally out.close()
          val code = conn.getResponseCode
          if (code < 200 || code >= 300)
            throw new java.io.IOException(s"http output: POST $u returned $code")
        } finally conn.disconnect()
      }
    }
  }
}
