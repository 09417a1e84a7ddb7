package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Confluent Schema Registry wire-format codec (SURVEY.md §2.5;
  * reference: codec/schema_registry.rs:37-200): messages are
  * `0x00 magic | 4-byte big-endian schema id | payload`.
  *
  * The resolver is pluggable exactly like the reference's trait (REST in
  * production, static map in tests) and cached. Spark-shaped decode: the
  * distinct schema ids of the batch are resolved once on the driver
  * (the id set is tiny), then each id's slice of the batch is decoded
  * with the native protobuf expression and unioned — all row work stays
  * distributed and codegen'd.
  */
object SchemaRegistry {

  /** resolver: schema id -> protobuf message fields. */
  trait SchemaResolver {
    def resolve(id: Int): Seq[ProtoField]
  }

  /** Caching wrapper (reference caches REST lookups,
    * schema_registry.rs:135-200). */
  final class CachingResolver(underlying: SchemaResolver) extends SchemaResolver {
    private val cache = new scala.collection.concurrent.TrieMap[Int, Seq[ProtoField]]()
    var misses = 0
    def resolve(id: Int): Seq[ProtoField] =
      cache.getOrElseUpdate(id, { misses += 1; underlying.resolve(id) })
  }

  /** REST resolver (codec/schema_registry.rs:135-200: GET
    * `{base}/schemas/ids/{id}` with optional bearer auth). The registry
    * answers `{"schema": "..."}`; the schema document is the proto field
    * spec this codec's registry serves — one `idx:name:type` per line
    * (e.g. `1:timestamp:int64`). Wrap in [[CachingResolver]] so each id
    * is fetched once per stream, like the reference's cache.
    */
  final class RestResolver(baseUrl: String, bearerToken: Option[String] = None,
      basicAuth: Option[(String, String)] = None) extends SchemaResolver {
    def resolve(id: Int): Seq[ProtoField] = {
      val conn = new java.net.URI(s"$baseUrl/schemas/ids/$id").toURL
        .openConnection().asInstanceOf[java.net.HttpURLConnection]
      try {
        bearerToken.foreach(t => conn.setRequestProperty("Authorization", s"Bearer $t"))
        basicAuth.foreach { case (user, pass) =>
          val cred = java.util.Base64.getEncoder.encodeToString(
            s"$user:$pass".getBytes(java.nio.charset.StandardCharsets.UTF_8))
          conn.setRequestProperty("Authorization", s"Basic $cred")
        }
        if (conn.getResponseCode != 200)
          throw new IllegalArgumentException(
            s"schema registry: id $id -> HTTP ${conn.getResponseCode}")
        val body = new String(conn.getInputStream.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8)
        // JSON is a YAML subset; reuse the config parser instead of a new dep
        val doc = new org.yaml.snakeyaml.Yaml()
          .load[java.util.Map[String, Object]](body)
        parseFieldSpec(doc.get("schema").toString)
      } finally conn.disconnect()
    }
  }

  /** `idx:name:type` lines -> proto fields. */
  def parseFieldSpec(spec: String): Seq[ProtoField] =
    spec.linesIterator.map(_.trim).filter(_.nonEmpty).map { line =>
      line.split(":") match {
        case Array(idx, name, tpe) => ProtoField(idx.trim.toInt, name.trim, tpe.trim)
        case _ => throw new IllegalArgumentException(s"bad field spec line: $line")
      }
    }.toSeq

  /** Frame a payload in the wire format (producer side / test fixture). */
  def frame(schemaId: Int, payload: Array[Byte]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(5 + payload.length)
    bb.put(0x00.toByte).putInt(schemaId).put(payload)
    bb.array()
  }

  /** Decode a batch of wire-framed `__value__` messages. Rows with a bad
    * magic byte fail the batch (routing to error_output is the engine's
    * job). Output schema is the union of each id's decoded struct plus
    * `__schema_id`.
    */
  def decodeBatch(batch: DataFrame, resolver: SchemaResolver): DataFrame = {
    val withId = batch
      .withColumn("__magic", expr(s"CAST(conv(hex(substring(${Codecs.ValueCol}, 1, 1)), 16, 10) AS INT)"))
      .withColumn("__schema_id", expr(s"CAST(conv(hex(substring(${Codecs.ValueCol}, 2, 4)), 16, 10) AS INT)"))
      .withColumn("__payload", expr(s"substring(${Codecs.ValueCol}, 6, octet_length(${Codecs.ValueCol}) - 5)"))
    // ONE driver job collects the (magic, id) combinations — the magic
    // check rides along with id discovery instead of its own probe pass
    val combos = withId.select("__magic", "__schema_id").distinct().collect()
    combos.find(_.getInt(0) != 0).foreach { bad =>
      throw new IllegalArgumentException(
        s"schema-registry wire format: bad magic byte ${bad.getInt(0)}")
    }
    val ids = combos.map(_.getInt(1)).distinct.sorted
    val parts = ids.map { id =>
      val fields = resolver.resolve(id)
      Protobuf.register(batch.sparkSession, s"sr_$id", fields)
      withId.filter(col("__schema_id") === id)
        .selectExpr("__schema_id", s"proto_decode_sr_$id(__payload) AS __m")
        .select(col("__schema_id"), col("__m.*"))
    }
    parts.reduce(_.unionByName(_, allowMissingColumns = true))
  }
}
