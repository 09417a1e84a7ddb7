package graft.operators

import graft.{Q, Tables}
import graft.Q.QueryFn
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media (image/audio/video) travels as an
  * opaque `binary` column plus typed metadata, exactly like Spark's own
  * `binaryFile` source contract. Decoding/feature extraction runs
  * per-partition (one codec instance per task, streaming through rows,
  * no driver involvement) — the Scala analogue of `mapInPandas`.
  *
  * The actual byte-level codec is STUBBED (this container ships no
  * image/audio libraries) with a deterministic fake that derives
  * "decoded" metadata from the bytes; the Spark-side plumbing — schema,
  * partition processing, batch shape — is real and tested.
  */
object Multimodal {

  /** Typed decoded-media metadata row. */
  final case class MediaMeta(
    doc_id: Long, n_bytes: Long, width: Int, height: Int,
    n_frames: Int, digest: String)

  /** STUB decoder: stands in for an image/audio codec. Deterministic on
    * the input bytes so tests and the oracle can pin it; swap the body
    * for a real codec (e.g. javax.imageio / ffmpeg bindings) in
    * production.
    */
  def decodeStub(id: Long, bytes: Array[Byte]): MediaMeta = {
    val n = bytes.length.toLong
    MediaMeta(
      doc_id = id,
      n_bytes = n,
      width = (64 + n % 64).toInt,
      height = (64 + (n / 64) % 64).toInt,
      n_frames = (n % 10).toInt,
      digest = {
        val md = java.security.MessageDigest.getInstance("MD5")
        md.digest(bytes).map("%02x".format(_)).mkString
      })
  }

  /** Per-partition decode over (id, payload) binary rows — the real
    * distribution shape: one decoder per task, streaming iterator, no
    * collect. */
  def decodeMedia(spark: SparkSession, media: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    media.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows => rows.map { case (id, bytes) => decodeStub(id, bytes) } }
  }

  /** documents.text re-encoded as a fake binary payload column. */
  def fakeMediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))

  val queries: Map[String, QueryFn] = Map(
    // Same decode logic expressed as columnar expressions (codegen path);
    // the mapPartitions path is covered by MultimodalSpec.
    "q65_multimodal_meta" -> ((s, dir) =>
      fakeMediaTable(s, dir)
        .select(col("doc_id"),
          octet_length(col("payload")).cast("long").as("n_bytes"),
          (lit(64) + octet_length(col("payload")) % 64).cast("long").as("width"),
          (lit(64) + (octet_length(col("payload")).cast("long") / lit(64)).cast("long") % 64)
            .cast("long").as("height"),
          (octet_length(col("payload")) % 10).cast("long").as("n_frames"),
          md5(col("payload")).as("digest"))
        .orderBy(col("doc_id"))),

    // Frame sampling (the brief's video-style op over the opaque payload):
    // fixed-size frames, every 2nd frame up to 16, each fingerprinted.
    // Pure explode + substring + hash — codegen, zero shuffle, scales
    // with the scan like the rest of the media ops. The byte-level codec
    // stays the documented stub; the sampling/distribution plumbing is
    // the real contract.
    "q68_frame_sample" -> ((s, dir) => {
      Tables.register(s, dir)
      s.sql(
        """SELECT doc_id, frame_idx,
          |  CAST(length(substring(text, frame_idx * 64 + 1, 64)) AS BIGINT) AS frame_len,
          |  md5(CAST(substring(text, frame_idx * 64 + 1, 64) AS BINARY)) AS frame_digest
          |FROM (
          |  SELECT doc_id, text,
          |    explode(sequence(0, CAST(least((n_chars - 1) DIV 64, 15) AS INT), 2)) AS frame_idx
          |  FROM documents)
          |ORDER BY doc_id, frame_idx""".stripMargin)
    }),

    // Resize to a fixed-size "thumbnail": crop-or-pad the payload to 128
    // units and fingerprint the result — the deterministic stand-in for
    // a pixel resize, same crop/pad contract, pure codegen row ops.
    "q69_resize" -> ((s, dir) => {
      Tables.register(s, dir)
      s.sql(
        """SELECT doc_id,
          |  CAST(length(rpad(substring(text, 1, 128), 128, '.')) AS BIGINT) AS thumb_len,
          |  CAST(least(n_chars, 128) AS BIGINT) AS kept_len,
          |  md5(CAST(rpad(substring(text, 1, 128), 128, '.') AS BINARY)) AS thumb_digest
          |FROM documents
          |ORDER BY doc_id""".stripMargin)
    })
  )

  val oracle: Map[String, String] = Map(
    // DuckDB md5 is VARCHAR-only; the payload is utf-8 text bytes, so
    // md5(text) is byte-identical.
    "q65_multimodal_meta" ->
      """SELECT doc_id,
        |  CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
        |  CAST(64 + octet_length(CAST(text AS BLOB)) % 64 AS BIGINT) AS width,
        |  CAST(64 + (octet_length(CAST(text AS BLOB)) // 64) % 64 AS BIGINT) AS height,
        |  CAST(octet_length(CAST(text AS BLOB)) % 10 AS BIGINT) AS n_frames,
        |  md5(text) AS digest
        |FROM documents
        |ORDER BY doc_id""".stripMargin,

    // payload is utf-8 text bytes, so text substrings == byte frames and
    // DuckDB's VARCHAR md5 matches Spark's md5-over-binary.
    "q68_frame_sample" ->
      """SELECT doc_id, frame_idx,
        |  CAST(length(substring(text, frame_idx * 64 + 1, 64)) AS BIGINT) AS frame_len,
        |  md5(substring(text, frame_idx * 64 + 1, 64)) AS frame_digest
        |FROM (
        |  SELECT doc_id, text,
        |    unnest(generate_series(0, least((n_chars - 1) // 64, 15), 2)) AS frame_idx
        |  FROM documents) t
        |ORDER BY doc_id, frame_idx""".stripMargin,

    "q69_resize" ->
      """SELECT doc_id,
        |  CAST(length(rpad(substring(text, 1, 128), 128, '.')) AS BIGINT) AS thumb_len,
        |  CAST(least(n_chars, 128) AS BIGINT) AS kept_len,
        |  md5(rpad(substring(text, 1, 128), 128, '.')) AS thumb_digest
        |FROM documents
        |ORDER BY doc_id""".stripMargin
  )
}
