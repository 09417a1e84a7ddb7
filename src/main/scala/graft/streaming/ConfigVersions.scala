package graft.streaming

import java.nio.charset.StandardCharsets

/** Content-addressed config version log behind the control plane's
  * `/config/apply` / `/config/versions` / `/config/rollback/{id}` routes
  * (reference crates/arkflow-server/src/lib.rs:205-213 + storage.rs
  * `cp_config_versions`; the reference persists versions in its own
  * sqlite control-plane store — on Spark the natural durable substrate
  * is the same Hadoop FileSystem the checkpoints live on, so the store
  * works against ANY hadoop-fs path: local dir, HDFS, s3a).
  *
  * Layout under `dir`:
  *   - `cfg-<16-hex-of-sha256>.yaml`  one file per distinct content
  *     (the digest IS the version id — re-applying identical content
  *     reuses the id, the content-addressed property)
  *   - `CURRENT`                       the active version id
  *
  * All operations are small-file reads/writes on the driver — this is
  * control-plane metadata (a few KB per config), never a data path.
  */
final class ConfigVersionStore(dir: String,
    hadoopConf: org.apache.hadoop.conf.Configuration) {
  import org.apache.hadoop.fs.Path

  private val root = new Path(dir)
  private def fs = root.getFileSystem(hadoopConf)

  final case class Rec(id: String, createdMs: Long, bytes: Long, active: Boolean)

  // 16 hex chars = 64 digest bits: accidental collision needs ~2^32
  // stored versions (birthday bound) — far past any config log; save()
  // still verifies content on id reuse so even a collision fails loudly
  // instead of silently aliasing a new config to an old one.
  //
  // FORMAT MIGRATION: ids were 12 hex chars before round 15. A store
  // written by the old format keeps its files loadable/rollbackable
  // (load() is id-agnostic), and save() probes the LEGACY id first so
  // re-applying content that already exists under a 12-hex id reuses
  // that id instead of writing a 16-hex twin — the content-addressed
  // "identical content reuses the id" property holds across the
  // migration, not just within one format.
  private def idOf(content: String): String = digestHex(content, 8)

  private def legacyIdOf(content: String): String = digestHex(content, 6)

  // Whether this store holds any pre-round-15 12-hex files — probed ONCE
  // (first save), not per save: on a remote fs (HDFS/s3a) the legacy
  // exists+read probe costs two round-trips per /config/apply, and a
  // store born after the migration would have paid them forever for a
  // namespace it never used. Legacy files are never created anew, so a
  // one-time listing is exact (lazy, so constructing a store against a
  // not-yet-created dir stays cheap and failure-free).
  private lazy val hasLegacyFiles: Boolean =
    fs.exists(root) && fs.listStatus(root).exists(s =>
      s.isFile && s.getPath.getName.matches("cfg-[0-9a-f]{12}\\.yaml"))

  private def digestHex(content: String, nBytes: Int): String = {
    val d = java.security.MessageDigest.getInstance("SHA-256")
      .digest(content.getBytes(StandardCharsets.UTF_8))
    "cfg-" + d.take(nBytes).map(b => f"$b%02x").mkString
  }

  private def write(p: Path, content: String): Unit = {
    val out = fs.create(p, true)
    try out.write(content.getBytes(StandardCharsets.UTF_8)) finally out.close()
  }

  private def read(p: Path): String = {
    val in = fs.open(p)
    try new String(in.readAllBytes(), StandardCharsets.UTF_8) finally in.close()
  }

  /** Persist `content`; returns its (possibly pre-existing) version id.
    * On id reuse the stored bytes must MATCH — a digest collision
    * aliasing distinct configs would otherwise make rollback restore the
    * wrong configuration. Probes the pre-round-15 12-hex id first (see
    * the format-migration note on [[idOf]]): content already stored
    * under the legacy format keeps its id. */
  def save(content: String): String = synchronized {
    fs.mkdirs(root)
    if (hasLegacyFiles) {
      val legacy = legacyIdOf(content)
      val lp = new Path(root, s"$legacy.yaml")
      if (fs.exists(lp) && read(lp) == content) return legacy
    }
    val id = idOf(content)
    val p = new Path(root, s"$id.yaml")
    if (!fs.exists(p)) write(p, content)
    else require(read(p) == content,
      s"config version id collision: $id already stores different content")
    id
  }

  def load(id: String): Option[String] = synchronized {
    require(id.matches("[A-Za-z0-9._-]+"), s"bad version id `$id`")
    val p = new Path(root, s"$id.yaml")
    if (fs.exists(p)) Some(read(p)) else None
  }

  def setActive(id: String): Unit = synchronized {
    write(new Path(root, "CURRENT"), id)
  }

  /** Work-in-progress config draft (reference lib.rs:202-203
    * `/configuration/draft` GET/PUT; one draft per store — the console's
    * scratchpad, durable across server restarts but NOT versioned until
    * applied). */
  def saveDraft(content: String): Unit = synchronized {
    fs.mkdirs(root)
    write(new Path(root, "DRAFT"), content)
  }

  def draft(): Option[String] = synchronized {
    val p = new Path(root, "DRAFT")
    if (fs.exists(p)) Some(read(p)) else None
  }

  def active(): Option[String] = synchronized {
    val p = new Path(root, "CURRENT")
    if (fs.exists(p)) Some(read(p).trim).filter(_.nonEmpty) else None
  }

  /** Every stored version, newest first. */
  def list(): Seq[Rec] = synchronized {
    if (!fs.exists(root)) return Nil
    val cur = active()
    fs.listStatus(root).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".yaml"))
      .map { s =>
        val id = s.getPath.getName.stripSuffix(".yaml")
        Rec(id, s.getModificationTime, s.getLen, cur.contains(id))
      }
      .sortBy(-_.createdMs)
  }
}
