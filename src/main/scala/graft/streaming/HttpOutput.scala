package graft.streaming

import java.nio.charset.StandardCharsets
import org.apache.spark.sql.DataFrame

/** HTTP output (SURVEY.md §2.2; reference output/http.rs:36-60: POSTs each
  * batch body to a URL with optional auth). The symmetric twin of
  * [[HttpInput]]: rows serialize to JSON lines and POST from the
  * EXECUTORS via foreachPartition — no driver-side collect, so the sink
  * scales with partitions; `rows_per_request` bounds each POST body.
  *
  * Transient failures retry per request with exponential backoff —
  * 100ms · 2^(attempt-1), the reference's schedule (output/http.rs:
  * 181-210, `retry_count`). Retries apply only to TRANSPORT errors and
  * 5xx: a 4xx is the server rejecting the request — retrying it verbatim
  * can't succeed and is skipped. A request that exhausts its retries (or
  * gets a 4xx) throws, failing the batch (routes to error_output or
  * Spark's task retry).
  *
  * Delivery is at-least-once: a connection that dies AFTER the server
  * applied the POST is retried, duplicating rows. Every request carries
  * `X-Batch-Id: <batchId>/<partitionId>/<chunk>` so receivers can dedupe
  * replays — the HTTP analogue of [[Engine.KafkaSink]]'s batch_id header.
  */
final case class HttpOutputSink(url: String, bearerToken: Option[String] = None,
    rowsPerRequest: Int = 1000, retryCount: Int = 0) extends Engine.BatchSink {

  def write(batch: DataFrame, batchId: Long): Unit = {
    val (u, tok, cap, retries) = (url, bearerToken, rowsPerRequest, retryCount)
    batch.toJSON.foreachPartition { (rows: Iterator[String]) =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      rows.grouped(cap).zipWithIndex.foreach { case (lines, chunk) =>
        val body = lines.mkString("\n").getBytes(StandardCharsets.UTF_8)
        val requestId = s"$batchId/$pid/$chunk"
        var attempt = 0
        var done = false
        while (!done) {
          try {
            HttpOutputSink.post(u, tok, body, requestId)
            done = true
          } catch {
            case e: HttpOutputSink.HttpStatusException
                if e.code >= 400 && e.code < 500 &&
                  e.code != 408 && e.code != 429 =>
              // the server rejected the request ITSELF — a verbatim replay
              // can't succeed. 408 (timeout) and 429 (rate limit) are the
              // transient exceptions and stay on the backoff path.
              throw e
            case e: java.io.IOException if attempt < retries =>
              attempt += 1
              Thread.sleep(100L * (1L << (attempt - 1)))
            case e: java.io.IOException => throw e
          }
        }
      }
    }
  }
}

object HttpOutputSink {
  /** Non-2xx response — carries the status so retry policy can branch. */
  final class HttpStatusException(val code: Int, msg: String)
    extends java.io.IOException(msg)

  private def post(u: String, tok: Option[String], body: Array[Byte],
      requestId: String): Unit = {
    val conn = new java.net.URI(u).toURL.openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    try {
      conn.setRequestMethod("POST")
      conn.setDoOutput(true)
      conn.setRequestProperty("Content-Type", "application/x-ndjson")
      conn.setRequestProperty("X-Batch-Id", requestId)
      tok.foreach(t => conn.setRequestProperty("Authorization", s"Bearer $t"))
      val out = conn.getOutputStream
      try out.write(body)
      finally out.close()
      val code = conn.getResponseCode
      if (code < 200 || code >= 300)
        throw new HttpStatusException(code, s"http output: POST $u returned $code")
    } finally conn.disconnect()
  }
}
