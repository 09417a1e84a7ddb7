package graft.streaming

import java.net.{HttpURLConnection, URI, URL}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs._
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** Read-only Hadoop FileSystem over HTTP(S) — the Spark-native
  * counterpart of the reference file input's `http` object store
  * (input/file.rs:368-378 registers object_store's HTTP adapter on the
  * DataFusion session; Spark reaches schemes through Hadoop FileSystem
  * implementations, so this is the same capability in the engine's own
  * execution model).
  *
  * Reads are HTTP Range requests, which makes the scheme fully
  * SPLITTABLE: Spark's file scan partitions a large parquet file by
  * `maxPartitionBytes` and each task issues its own ranged GETs — the
  * read distributes across executors exactly like s3a/abfs (the class
  * rides the application classpath; no driver-side staging). A server
  * that ignores Range (200 instead of 206) still works — the stream
  * skips to the requested offset — just without the byte savings.
  *
  * Read-only by contract: every mutating call throws. Listing a path
  * returns the file itself — an HTTP endpoint has no directory
  * enumeration, so globs/directories are out of scope (same boundary as
  * the reference's HTTP store, which serves single objects by URL).
  */
class HttpFileSystem extends FileSystem {
  private var fsUri: URI = _

  override def initialize(name: URI, conf: Configuration): Unit = {
    super.initialize(name, conf)
    setConf(conf)
    fsUri = URI.create(s"${getScheme}://${name.getAuthority}")
  }

  override def getScheme: String = "http"
  override def getUri: URI = fsUri

  private def urlOf(f: Path): URL = f.toUri.toURL

  /** Content length via HEAD, falling back to a 1-byte ranged GET for
    * servers that omit Content-Length on HEAD (Content-Range carries the
    * total). */
  private def contentLength(u: URL): Long = {
    val head = u.openConnection().asInstanceOf[HttpURLConnection]
    head.setRequestMethod("HEAD")
    head.setConnectTimeout(15000)
    head.setReadTimeout(30000)
    try {
      val code = head.getResponseCode
      if (code == 404) throw new java.io.FileNotFoundException(u.toString)
      if (code >= 400) throw new java.io.IOException(s"HTTP $code for HEAD $u")
      val len = head.getContentLengthLong
      if (len >= 0) len
      else {
        val get = u.openConnection().asInstanceOf[HttpURLConnection]
        get.setRequestProperty("Range", "bytes=0-0")
        get.setConnectTimeout(15000)
        get.setReadTimeout(30000)
        try {
          val c2 = get.getResponseCode
          if (c2 == 404) throw new java.io.FileNotFoundException(u.toString)
          val range = Option(get.getHeaderField("Content-Range"))
          range.flatMap(r => r.split('/').lastOption)
            .flatMap(s => scala.util.Try(s.trim.toLong).toOption)
            .getOrElse {
              if (c2 == 200 && get.getContentLengthLong >= 0) get.getContentLengthLong
              else throw new java.io.IOException(
                s"cannot determine length of $u (no Content-Length, no Content-Range)")
            }
        } finally get.disconnect()
      }
    } finally head.disconnect()
  }

  override def getFileStatus(f: Path): FileStatus = {
    val len = contentLength(urlOf(f))
    new FileStatus(len, false, 1, 128L * 1024 * 1024, 0L, f)
  }

  override def listStatus(f: Path): Array[FileStatus] = Array(getFileStatus(f))

  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    val u = urlOf(f)
    val len = contentLength(u)
    new FSDataInputStream(new BufferedFSInputStream(
      new HttpFileSystem.RangeStream(u, len), math.max(bufferSize, 128 * 1024)))
  }

  override def getWorkingDirectory: Path = new Path(fsUri)
  override def setWorkingDirectory(dir: Path): Unit = ()

  private def readOnly(op: String) =
    throw new UnsupportedOperationException(
      s"http object store is read-only: $op is not supported")
  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream = readOnly("create")
  override def append(f: Path, bufferSize: Int,
      progress: Progressable): FSDataOutputStream = readOnly("append")
  override def rename(src: Path, dst: Path): Boolean = readOnly("rename")
  override def delete(f: Path, recursive: Boolean): Boolean = readOnly("delete")
  override def mkdirs(f: Path, permission: FsPermission): Boolean = readOnly("mkdirs")
}

/** Same filesystem, `https` scheme. */
class HttpsFileSystem extends HttpFileSystem {
  override def getScheme: String = "https"
}

object HttpFileSystem {
  /** Seekable HTTP stream: each read is one ranged GET at the current
    * position (the BufferedFSInputStream wrapper above coalesces small
    * parquet footer reads into buffer-sized ranges). FSInputStream's
    * default PositionedReadable is seek+read over this. */
  private[streaming] final class RangeStream(url: URL, length: Long)
      extends FSInputStream {
    private var pos = 0L

    override def seek(p: Long): Unit = {
      if (p < 0 || p > length)
        throw new java.io.EOFException(s"seek $p outside [0, $length] for $url")
      pos = p
    }
    override def getPos: Long = pos
    override def seekToNewSource(targetPos: Long): Boolean = false

    override def read(): Int = {
      val b = new Array[Byte](1)
      val n = read(b, 0, 1)
      if (n <= 0) -1 else b(0) & 0xff
    }

    override def read(b: Array[Byte], off: Int, len: Int): Int = {
      if (len == 0) return 0
      if (pos >= length) return -1
      val want = math.min(len.toLong, length - pos).toInt
      val conn = url.openConnection().asInstanceOf[HttpURLConnection]
      conn.setRequestProperty("Range", s"bytes=$pos-${pos + want - 1}")
      conn.setConnectTimeout(15000)
      conn.setReadTimeout(60000)
      try {
        val code = conn.getResponseCode
        if (code != 206 && code != 200)
          throw new java.io.IOException(s"HTTP $code reading $url")
        val in = conn.getInputStream
        // a Range-blind server returns the whole body with 200 — skip to pos
        if (code == 200 && pos > 0) {
          var toSkip = pos
          while (toSkip > 0) {
            val s = in.skip(toSkip)
            if (s <= 0) throw new java.io.IOException(s"short skip on $url")
            toSkip -= s
          }
        }
        var got = 0
        var eof = false
        while (got < want && !eof) {
          val n = in.read(b, off + got, want - got)
          if (n < 0) eof = true else got += n
        }
        if (got == 0) -1 else { pos += got; got }
      } finally conn.disconnect()
    }

    override def close(): Unit = ()
  }
}
