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
  * IMAGES decode for real since round 7: `javax.imageio` ships in the
  * JDK, so PNG/JPEG/GIF/BMP width/height/format come from actually
  * parsing the bytes ([[decodeImages]], graded by q65 against planted
  * dimensions), and [[resizeImages]] runs a real Graphics2D rescale
  * (q69; pixel math pinned in OperatorsSpec). AUDIO/VIDEO remain the
  * documented deterministic stub ([[decodeStub]], q68's frame sampler)
  * — this container ships no media codecs beyond the JDK.
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

  /** Decoded IMAGE metadata: real pixel dimensions + container format. */
  final case class ImageMeta(doc_id: Long, width: Int, height: Int,
    format: String, n_bytes: Long)

  /** REAL image decode via `javax.imageio`: parses the actual PNG/JPEG/
    * GIF/BMP bytes for pixel dimensions and sniffs the container format
    * from the reader. Bytes no installed reader recognizes decode as
    * `format = "unknown"` with −1 dimensions (callers route those to
    * the stub/error path). Distribution shape identical to
    * [[decodeMedia]]: per-partition, streaming, zero driver state. */
  def decodeImages(spark: SparkSession, media: DataFrame): Dataset[ImageMeta] = {
    import spark.implicits._
    media.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          val iis = javax.imageio.ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(bytes))
          try {
            val readers = javax.imageio.ImageIO.getImageReaders(iis)
            if (readers.hasNext) {
              val r = readers.next()
              try {
                r.setInput(iis)
                ImageMeta(id, r.getWidth(0), r.getHeight(0),
                  r.getFormatName.toLowerCase, bytes.length.toLong)
              } finally r.dispose()
            } else ImageMeta(id, -1, -1, "unknown", bytes.length.toLong)
          } finally iis.close()
        }
      }
  }

  /** Real thumbnail resize: decode, Graphics2D bilinear rescale to
    * (tw, th), re-encode PNG. Returns (doc_id, orig_w, orig_h, thumb
    * bytes); unreadable rows pass through with −1 dims and empty
    * thumb. One image in flight per task — memory is O(largest image),
    * not O(batch). */
  def resizeImages(spark: SparkSession, media: DataFrame, tw: Int,
      th: Int): DataFrame = {
    import spark.implicits._
    require(tw > 0 && th > 0, s"thumb dims must be positive, got $tw x $th")
    media.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bytes))
          if (img == null) (id, -1, -1, Array.empty[Byte])
          else {
            val thumb = new java.awt.image.BufferedImage(tw, th,
              java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = thumb.createGraphics()
            try {
              g.setRenderingHint(
                java.awt.RenderingHints.KEY_INTERPOLATION,
                java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
              g.drawImage(img, 0, 0, tw, th, null)
            } finally g.dispose()
            val out = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(thumb, "png", out)
            (id, img.getWidth, img.getHeight, out.toByteArray)
          }
        }
      }.toDF("doc_id", "orig_w", "orig_h", "thumb")
  }

  /** Deterministic PNG fixture generator — dimensions planted from the
    * id, an (x·31 + y·17 + id)-derived gray pattern so pixel content is
    * reproducible for the resize spec. Runs on EXECUTORS inside the
    * graded queries (per-partition, like any media ingest). */
  def makePng(id: Long, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = ((x * 31 + y * 17 + id) % 256).toInt
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** One generated PNG per document, dims planted as
    * `16 + id % 32` × `16 + (id / 32) % 32` — the graded decode
    * queries' fixture (the q120/q95 planting pattern: the oracle knows
    * the FORMULA, the engine must recover it from real bytes). */
  def pngMediaTable(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "documents").select(col("doc_id").cast("long"))
      .as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          (id, makePng(id, (16 + id % 32).toInt, (16 + (id / 32) % 32).toInt))
        }
      }.toDF("doc_id", "payload")
  }

  /** documents.text re-encoded as a fake binary payload column. */
  def fakeMediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))

  /** Decoded AUDIO metadata + planted-content features (q256). */
  final case class AudioMeta(doc_id: Long, sample_rate: Int, channels: Int,
    n_frames: Long, duration_ms: Long, energy: Long)

  /** Deterministic RIFF/WAVE PCM16 fixture: a REAL WAV container built
    * byte-for-byte (RIFF header, `fmt ` chunk, `data` chunk, little-
    * endian int16 samples) — the same planting pattern as [[makePng]]:
    * rate/channels/frames and every sample value derive from the id, so
    * the oracle knows the FORMULAS while the engine must recover them
    * from the actual bytes. */
  def makeWav(id: Long): Array[Byte] = {
    val rate = (8000 + (id % 4) * 4000).toInt
    val channels = (1 + id % 2).toInt
    val frames = (64 + id % 128).toInt
    val n = frames * channels
    val dataLen = n * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(channels.toShort)
      .putInt(rate)
      .putInt(rate * channels * 2) // byte rate
      .putShort((channels * 2).toShort) // block align
      .putShort(16) // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < n) {
      bb.putShort((((id * 31 + i * 7) % 4096) - 2048).toShort)
      i += 1
    }
    bb.array()
  }

  /** One generated WAV per document — q256's fixture, built on executors
    * like [[pngMediaTable]]. */
  def wavMediaTable(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "documents").select(col("doc_id").cast("long"))
      .as[Long]
      .mapPartitions(ids => ids.map(id => (id, makeWav(id))))
      .toDF("doc_id", "payload")
  }

  /** REAL WAV parse: walks the RIFF chunk list (not fixed offsets — a
    * LIST/INFO chunk before `data` is handled), reads rate/channels/bits
    * from `fmt `, then streams the PCM16 frames once for the content
    * features (frame count, duration, total energy as exact integer
    * math). Malformed bytes yield a −1-filled row rather than a thrown
    * task — the decode twin of the TRY-cast discipline elsewhere.
    * Distribution shape identical to [[decodeImages]]: per-partition,
    * one file in flight per task, zero driver state. */
  def decodeWav(spark: SparkSession, media: DataFrame): Dataset[AudioMeta] = {
    import spark.implicits._
    media.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          try {
            val bb = java.nio.ByteBuffer.wrap(bytes)
              .order(java.nio.ByteOrder.LITTLE_ENDIAN)
            require(bytes.length >= 12 &&
              new String(bytes, 0, 4, "US-ASCII") == "RIFF" &&
              new String(bytes, 8, 4, "US-ASCII") == "WAVE", "not RIFF/WAVE")
            var pos = 12
            var rate = -1; var channels = -1; var bits = -1
            var dataOff = -1; var dataLen = -1
            while (pos + 8 <= bytes.length && (rate < 0 || dataOff < 0)) {
              val cid = new String(bytes, pos, 4, "US-ASCII")
              val size = bb.getInt(pos + 4)
              // a negative size would make the walk step non-positive —
              // an infinite loop, not an exception, so guard explicitly
              require(size >= 0, s"negative chunk size $size")
              cid match {
                case "fmt " =>
                  require(bb.getShort(pos + 8) == 1, "not PCM")
                  channels = bb.getShort(pos + 10).toInt
                  rate = bb.getInt(pos + 12)
                  bits = bb.getShort(pos + 22).toInt
                case "data" => dataOff = pos + 8; dataLen = size
                case _ =>
              }
              pos += 8 + size + (size & 1) // chunks are word-aligned
            }
            require(rate > 0 && channels > 0 && bits == 16 && dataOff >= 0,
              "missing fmt/data chunk or non-16-bit samples")
            val nSamples = dataLen / 2
            val frames = nSamples.toLong / channels
            var energy = 0L
            var i = 0
            while (i < nSamples) {
              val s = bb.getShort(dataOff + i * 2).toLong
              energy += s * s
              i += 1
            }
            AudioMeta(id, rate, channels, frames,
              frames * 1000L / rate, energy)
          } catch {
            case scala.util.control.NonFatal(_) =>
              AudioMeta(id, -1, -1, -1L, -1L, -1L)
          }
        }
      }
  }

  /** Decoded VIDEO container metadata + planted-content features (q261). */
  final case class VideoMeta(doc_id: Long, width: Long, height: Long,
    fps: Long, n_frames: Long, duration_ms: Long, total_frame_bytes: Long,
    byte_sum: Long)

  /** Deterministic RIFF/AVI fixture — a REAL AVI container built
    * byte-for-byte (RIFF 'AVI ' → LIST hdrl with avih + LIST strl
    * (strh 'vids'/strf BITMAPINFOHEADER) → LIST movi with word-aligned
    * '00dc' frame chunks → idx1 index), the q256/WAV planting pattern:
    * width/height/fps/frame-count and every frame byte derive from the
    * id, so the oracle knows the FORMULAS while the engine must recover
    * them from the actual bytes. Frame i carries sz_i = 16 +
    * (id*31 + i*7) % 48 bytes, each of value (id*17 + i*11) % 251. */
  def makeAvi(id: Long): Array[Byte] = {
    val width = (16 * (1 + id % 8)).toInt
    val height = (16 * (1 + id % 6)).toInt
    val fps = (10 + id % 21).toInt
    val frames = (4 + id % 12).toInt
    def sz(i: Int) = (16 + (id * 31 + i * 7) % 48).toInt
    def bv(i: Int) = ((id * 17 + i * 11) % 251).toByte
    val moviBody = 4 + (0 until frames).map(i => 8 + sz(i) + (sz(i) & 1)).sum
    val idx1Body = 16 * frames
    // hdrl: avih(56) + LIST strl { strh(56) + strf(40) }
    val strlBody = 4 + 8 + 56 + 8 + 40
    val hdrlBody = 4 + 8 + 56 + 8 + strlBody
    val riffBody = 4 + 8 + hdrlBody + 8 + moviBody + 8 + idx1Body
    val bb = java.nio.ByteBuffer.allocate(8 + riffBody)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(s: String) = bb.put(s.getBytes("US-ASCII"))
    fourcc("RIFF"); bb.putInt(riffBody); fourcc("AVI ")
    fourcc("LIST"); bb.putInt(hdrlBody); fourcc("hdrl")
    fourcc("avih"); bb.putInt(56)
    bb.putInt(1000000 / fps) // dwMicroSecPerFrame
      .putInt(0).putInt(0).putInt(0)
      .putInt(frames) // dwTotalFrames
      .putInt(0)
      .putInt(1) // dwStreams
      .putInt(0)
      .putInt(width).putInt(height)
      .putInt(0).putInt(0).putInt(0).putInt(0)
    fourcc("LIST"); bb.putInt(strlBody); fourcc("strl")
    fourcc("strh"); bb.putInt(56)
    fourcc("vids"); fourcc("MJPG")
    bb.putInt(0).putShort(0).putShort(0).putInt(0)
      .putInt(1) // dwScale
      .putInt(fps) // dwRate — fps = rate/scale
      .putInt(0)
      .putInt(frames) // dwLength
      .putInt(0).putInt(0).putInt(0)
      .putShort(0).putShort(0).putShort(0).putShort(0)
    fourcc("strf"); bb.putInt(40)
    bb.putInt(40).putInt(width).putInt(height)
      .putShort(1).putShort(24)
    fourcc("MJPG")
    bb.putInt(width * height * 3).putInt(0).putInt(0).putInt(0).putInt(0)
    fourcc("LIST"); bb.putInt(moviBody); fourcc("movi")
    val frameOffsets = new Array[Int](frames) // offset of ckid within movi LIST (idx1 convention: from 'movi')
    var moviPos = 4
    var i = 0
    while (i < frames) {
      frameOffsets(i) = moviPos
      fourcc("00dc"); bb.putInt(sz(i))
      var j = 0
      while (j < sz(i)) { bb.put(bv(i)); j += 1 }
      if ((sz(i) & 1) == 1) bb.put(0.toByte)
      moviPos += 8 + sz(i) + (sz(i) & 1)
      i += 1
    }
    fourcc("idx1"); bb.putInt(idx1Body)
    i = 0
    while (i < frames) {
      fourcc("00dc")
      bb.putInt(0x10) // AVIIF_KEYFRAME
      bb.putInt(frameOffsets(i))
      bb.putInt(sz(i))
      i += 1
    }
    bb.array()
  }

  def aviMediaTable(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "documents").select(col("doc_id").cast("long"))
      .as[Long]
      .mapPartitions(ids => ids.map(id => (id, makeAvi(id))))
      .toDF("doc_id", "payload")
  }

  /** REAL AVI parse: walks the top-level RIFF chunk list, descends the
    * hdrl LIST for avih (dims, total frames) and the strl LIST for strh
    * (fps = dwRate/dwScale), iterates the movi LIST's word-aligned
    * '00dc'/'00db' frame chunks summing sizes and content bytes, and
    * CROSS-CHECKS the idx1 index (entry count, offsets, sizes) against
    * the walked chunks — a decoder that trusts the header without the
    * walk, or the walk without the index, fails the planted fixtures.
    * Malformed bytes → −1 row, q256's TRY discipline. */
  def decodeAvi(spark: SparkSession, media: DataFrame): Dataset[VideoMeta] = {
    import spark.implicits._
    media.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          try {
            val bb = java.nio.ByteBuffer.wrap(bytes)
              .order(java.nio.ByteOrder.LITTLE_ENDIAN)
            def cc(off: Int) = new String(bytes, off, 4, "US-ASCII")
            require(bytes.length >= 12 && cc(0) == "RIFF" && cc(8) == "AVI ",
              "not RIFF/AVI")
            var width = -1L; var height = -1L; var fps = -1L
            var hdrFrames = -1L
            var nFrames = 0L; var totalBytes = 0L; var byteSum = 0L
            val walked = scala.collection.mutable.ArrayBuffer[(Int, Int)]()
            var idxEntries: Int = -1
            var idxOk = true
            var pos = 12
            while (pos + 8 <= bytes.length) {
              val ckid = cc(pos)
              val size = bb.getInt(pos + 4)
              require(size >= 0, s"negative chunk size $size")
              ckid match {
                case "LIST" =>
                  val ltype = cc(pos + 8)
                  if (ltype == "hdrl") {
                    // avih directly follows; strl LIST nested after it
                    var p = pos + 12
                    val end = pos + 8 + size
                    while (p + 8 <= end) {
                      val cid = cc(p)
                      val csz = bb.getInt(p + 4)
                      require(csz >= 0, s"negative chunk size $csz")
                      if (cid == "avih") {
                        fps = 1000000L / bb.getInt(p + 8)
                        hdrFrames = bb.getInt(p + 24).toLong
                        width = bb.getInt(p + 40).toLong
                        height = bb.getInt(p + 44).toLong
                        p += 8 + csz + (csz & 1)
                      } else if (cid == "LIST" && cc(p + 8) == "strl") {
                        var q = p + 12
                        val lend = p + 8 + csz
                        while (q + 8 <= lend) {
                          val scid = cc(q)
                          val ssz = bb.getInt(q + 4)
                          require(ssz >= 0, s"negative chunk size $ssz")
                          if (scid == "strh" && cc(q + 8) == "vids") {
                            val scale = bb.getInt(q + 28).toLong
                            val rate = bb.getInt(q + 32).toLong
                            // exact rate/scale outranks avih's rounded
                            // µs-per-frame; fractional rates keep avih's
                            if (scale > 0 && rate % scale == 0)
                              fps = rate / scale
                          }
                          q += 8 + ssz + (ssz & 1)
                        }
                        p += 8 + csz + (csz & 1)
                      } else p += 8 + csz + (csz & 1)
                    }
                  } else if (ltype == "movi") {
                    var p = pos + 12
                    val end = pos + 8 + size
                    while (p + 8 <= end) {
                      val cid = cc(p)
                      val csz = bb.getInt(p + 4)
                      require(csz >= 0, s"negative chunk size $csz")
                      if (cid.endsWith("dc") || cid.endsWith("db")) {
                        nFrames += 1
                        totalBytes += csz
                        walked += ((p - (pos + 8), csz))
                        var j = 0
                        while (j < csz) {
                          byteSum += (bytes(p + 8 + j) & 0xff).toLong
                          j += 1
                        }
                      }
                      p += 8 + csz + (csz & 1)
                    }
                  }
                case "idx1" =>
                  idxEntries = size / 16
                  var e = 0
                  while (e < idxEntries && idxOk) {
                    val off = bb.getInt(pos + 8 + e * 16 + 8)
                    val len = bb.getInt(pos + 8 + e * 16 + 12)
                    idxOk = e < walked.length &&
                      walked(e) == ((off, len))
                    e += 1
                  }
                case _ =>
              }
              pos += 8 + size + (size & 1)
            }
            require(width > 0 && fps > 0 && nFrames > 0, "missing headers")
            require(hdrFrames == nFrames, "header/chunk frame-count mismatch")
            require(idxEntries == nFrames && idxOk, "idx1 disagrees with movi walk")
            VideoMeta(id, width, height, fps, nFrames,
              nFrames * 1000L / fps, totalBytes, byteSum)
          } catch {
            case scala.util.control.NonFatal(_) =>
              VideoMeta(id, -1, -1, -1, -1, -1, -1, -1)
          }
        }
      }
  }

  val queries: Map[String, QueryFn] = Map(
    // REAL decode graded against planted dimensions: each doc gets a
    // generated PNG whose dims derive from its id; javax.imageio must
    // recover exactly those dims from the actual bytes (the oracle
    // knows only the formula — a decoder that misparses IHDR or
    // mis-sniffs the container fails the hash).
    "q65_multimodal_meta" -> ((s, dir) =>
      decodeImages(s, pngMediaTable(s, dir)).toDF()
        .select(col("doc_id"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("format"))
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

    // REAL resize: decode each generated PNG, Graphics2D-rescale to
    // 24×24, report the ORIGINAL dims recovered from the bytes (planted
    // formula = the oracle) plus the thumbnail contract. Pixel-level
    // resize math is pinned in OperatorsSpec (a checkerboard averages
    // to mid-gray) — interpolation output isn't cross-engine-stable, so
    // the graded columns are the decode-recovered facts.
    "q69_resize" -> ((s, dir) =>
      resizeImages(s, pngMediaTable(s, dir), tw = 24, th = 24)
        .select(col("doc_id"),
          col("orig_w").cast("long").as("orig_w"),
          col("orig_h").cast("long").as("orig_h"),
          (octet_length(col("thumb")) > 0).as("thumb_ok"))
        .orderBy(col("doc_id"))),

    // REAL audio decode graded against planted formulas: each doc gets a
    // genuine RIFF/WAVE PCM16 file whose rate/channels/frame-count and
    // every sample value derive from its id; the chunk walker + PCM
    // energy sum must recover exactly what the oracle computes in closed
    // form (a parser that misreads the fmt chunk, forgets word alignment,
    // or mis-signs int16 samples fails the hash).
// REAL video-container decode graded against planted formulas: each
    // doc gets a genuine RIFF/AVI file (hdrl/avih/strl/strh/strf, movi
    // frame chunks, idx1 index) whose dims/fps/frame count and every
    // frame byte derive from its id; the chunk walker must recover the
    // header facts, walk the word-aligned frame chunks for the content
    // sums, and survive the idx1 cross-check (a parser that skips the
    // index, misreads strh's rate/scale, or forgets word alignment
    // fails the hash).
    "q261_video_meta" -> ((s, dir) =>
      decodeAvi(s, aviMediaTable(s, dir)).toDF()
        .select(col("doc_id"), col("width"), col("height"), col("fps"),
          col("n_frames"), col("duration_ms"), col("total_frame_bytes"),
          col("byte_sum"))
        .orderBy(col("doc_id"))),

"q256_audio_features" -> ((s, dir) =>
      decodeWav(s, wavMediaTable(s, dir)).toDF()
        .select(col("doc_id"), col("sample_rate"), col("channels"),
          col("n_frames"), col("duration_ms"), col("energy"))
        .orderBy(col("doc_id")))
  )

  val oracle: Map[String, String] = Map(
    // the planted-dimension formulas — the engine must recover these
    // from the real PNG bytes
    "q65_multimodal_meta" ->
      """SELECT doc_id,
        |  CAST(16 + doc_id % 32 AS BIGINT) AS width,
        |  CAST(16 + (doc_id // 32) % 32 AS BIGINT) AS height,
        |  'png' AS format
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
        |  CAST(16 + doc_id % 32 AS BIGINT) AS orig_w,
        |  CAST(16 + (doc_id // 32) % 32 AS BIGINT) AS orig_h,
        |  TRUE AS thumb_ok
        |FROM documents
        |ORDER BY doc_id""".stripMargin,

    // the planted WAV formulas — the engine must recover rate/channels/
    // frames from the real RIFF bytes and the energy from the PCM data
    // the planted AVI formulas — header facts plus the two content sums
    // over every frame byte
    "q261_video_meta" ->
      """SELECT doc_id,
        |  CAST(16 * (1 + doc_id % 8) AS BIGINT) AS width,
        |  CAST(16 * (1 + doc_id % 6) AS BIGINT) AS height,
        |  CAST(10 + doc_id % 21 AS BIGINT) AS fps,
        |  n_frames,
        |  CAST(n_frames * 1000 // (10 + doc_id % 21) AS BIGINT) AS duration_ms,
        |  CAST(sum(16 + (doc_id * 31 + i * 7) % 48) AS BIGINT) AS total_frame_bytes,
        |  CAST(sum((16 + (doc_id * 31 + i * 7) % 48)
        |         * ((doc_id * 17 + i * 11) % 251)) AS BIGINT) AS byte_sum
        |FROM (
        |  SELECT doc_id, CAST(4 + doc_id % 12 AS BIGINT) AS n_frames
        |  FROM documents) d,
        |  LATERAL (SELECT unnest(generate_series(0, n_frames - 1)) AS i) s
        |GROUP BY doc_id, n_frames
        |ORDER BY doc_id""".stripMargin,

    "q256_audio_features" ->
      """SELECT doc_id, sample_rate, channels, n_frames,
        |  CAST(n_frames * 1000 // sample_rate AS BIGINT) AS duration_ms,
        |  CAST(sum(((doc_id * 31 + i * 7) % 4096 - 2048)
        |         * ((doc_id * 31 + i * 7) % 4096 - 2048)) AS BIGINT) AS energy
        |FROM (
        |  SELECT doc_id,
        |    CAST(8000 + (doc_id % 4) * 4000 AS INT) AS sample_rate,
        |    CAST(1 + doc_id % 2 AS INT) AS channels,
        |    CAST(64 + doc_id % 128 AS BIGINT) AS n_frames
        |  FROM documents) d,
        |  LATERAL (SELECT unnest(generate_series(0, n_frames * channels - 1)) AS i) s
        |GROUP BY 1, 2, 3, 4
        |ORDER BY doc_id""".stripMargin
  )
}
