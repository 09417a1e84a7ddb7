package graft.streaming

import org.apache.avro.SchemaBuilder
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericDatumWriter, GenericRecord, GenericRecordBuilder}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The two round-1 "documented gap" components now implemented on
  * in-sandbox pieces: the avro file input (avro core jars, no spark-avro
  * datasource) and the schema-registry REST resolver (embedded JDK
  * HttpServer standing in for Confluent SR).
  */
class AvroRestSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private def writeAvroFixture(dir: String): Unit = {
    val schema = SchemaBuilder.record("sensor").fields()
      .requiredLong("timestamp")
      .requiredDouble("value")
      .optionalString("sensor")
      .endRecord()
    val writer = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](schema))
    writer.create(schema, new java.io.File(s"$dir/part-0.avro"))
    Seq((1625000000000L, 10.5, "temp_1"), (1625000001000L, 0.0, null))
      .foreach { case (ts, v, s) =>
        writer.append(new GenericRecordBuilder(schema)
          .set("timestamp", ts).set("value", v).set("sensor", s).build())
      }
    writer.close()
  }

  test("avro file input reads container files with schema mapping (input/file.rs register_avro)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_avro").toString
    writeAvroFixture(dir)
    val df = AvroInput.read(spark, s"$dir/*.avro")
    assert(df.schema.map(f => (f.name, f.dataType.typeName)).toSeq ==
      Seq(("timestamp", "long"), ("value", "double"), ("sensor", "string")))
    assert(df.schema("sensor").nullable && !df.schema("timestamp").nullable)
    assert(df.collect().map(r => (r.getLong(0), r.getDouble(1), Option(r.getString(2)))).toSet ==
      Set((1625000000000L, 10.5, Some("temp_1")), (1625000001000L, 0.0, None)))
  }

  test("engine file input resolves format=avro incl. query-over-scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_avro2").toString
    writeAvroFixture(dir)
    val out = Engine.inputFromConf(spark, ComponentConf("file", Map(
      "format" -> "avro", "path" -> s"$dir/*.avro",
      "query" -> "SELECT count(*) AS n FROM flow WHERE value > 1")))
    assert(out.as[Long].collect().toSeq == Seq(1L))
  }

  test("arrow file input reads IPC container files (input/file.rs register_arrow)") {
    import org.apache.arrow.memory.RootAllocator
    import org.apache.arrow.vector.{BigIntVector, Float8Vector, VectorSchemaRoot}
    import org.apache.arrow.vector.ipc.ArrowFileWriter
    import org.apache.arrow.vector.types.FloatingPointPrecision
    import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema => ASchema}
    import scala.jdk.CollectionConverters._

    val dir = java.nio.file.Files.createTempDirectory("graft_arrow").toString
    val schema = new ASchema(Seq(
      new Field("id", FieldType.nullable(new ArrowType.Int(64, true)), null),
      new Field("v", FieldType.nullable(
        new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE)), null)).asJava)
    val allocator = new RootAllocator(Long.MaxValue)
    val root = VectorSchemaRoot.create(schema, allocator)
    val fos = new java.io.FileOutputStream(s"$dir/part-0.arrow")
    val writer = new ArrowFileWriter(root, null, fos.getChannel)
    writer.start()
    val ids = root.getVector("id").asInstanceOf[BigIntVector]
    val vs = root.getVector("v").asInstanceOf[Float8Vector]
    Seq((1L, 1.5), (2L, 2.5), (3L, 3.5)).zipWithIndex.foreach { case ((i, d), r) =>
      ids.setSafe(r, i); vs.setSafe(r, d)
    }
    root.setRowCount(3)
    writer.writeBatch(); writer.end(); writer.close(); fos.close()
    root.close(); allocator.close()

    val df = Engine.inputFromConf(spark, ComponentConf("file", Map(
      "format" -> "arrow", "path" -> s"$dir/*.arrow",
      "query" -> "SELECT id, v FROM flow WHERE v > 2")))
    assert(df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSet ==
      Set((2L, 2.5), (3L, 3.5)))
  }

  test("schema-registry REST resolver fetches and caches per id (schema_registry.rs:135-200)") {
    val hits = new java.util.concurrent.atomic.AtomicInteger(0)
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/schemas/ids/", { exchange =>
      try {
        hits.incrementAndGet()
        val ok = Option(exchange.getRequestHeaders.getFirst("Authorization"))
          .contains("Bearer sr-tok")
        val id = exchange.getRequestURI.getPath.split("/").last.toInt
        if (!ok) exchange.sendResponseHeaders(401, -1)
        else if (id != 1) exchange.sendResponseHeaders(404, -1)
        else {
          val body =
            """{"schema": "1:timestamp:int64\n2:value:double\n3:sensor:string"}"""
              .getBytes(java.nio.charset.StandardCharsets.UTF_8)
          exchange.sendResponseHeaders(200, body.length)
          exchange.getResponseBody.write(body)
        }
      } finally exchange.close()
    })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      val resolver = new SchemaRegistry.CachingResolver(
        new SchemaRegistry.RestResolver(base, Some("sr-tok")))
      val fields = Seq(ProtoField(1, "timestamp", "int64"),
        ProtoField(2, "value", "double"), ProtoField(3, "sensor", "string"))
      val payload = Processors.ArrowToProtobuf(fields)(
        Seq((7L, 1.5, "s1")).toDF("timestamp", "value", "sensor"))
        .collect().head.getAs[Array[Byte]](0)
      val batch = Seq(
        SchemaRegistry.frame(1, payload),
        SchemaRegistry.frame(1, payload)).toDF(Codecs.ValueCol)
      val out = SchemaRegistry.decodeBatch(batch, resolver)
      assert(out.count() == 2)
      assert(out.select("timestamp", "value", "sensor").collect()
        .forall(r => r.getLong(0) == 7L && r.getDouble(1) == 1.5 && r.getString(2) == "s1"))
      assert(hits.get() == 1, s"expected one REST fetch for one id, got ${hits.get()}")
      // unknown id surfaces the HTTP status
      intercept[IllegalArgumentException](resolver.resolve(9))
      // wrong token -> 401
      intercept[IllegalArgumentException](
        new SchemaRegistry.RestResolver(base, Some("bad")).resolve(1))
    } finally server.stop(0)
  }

  test("schema-registry REST resolver supports basic auth (schema_registry.rs basic)") {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val expected = "Basic " + java.util.Base64.getEncoder.encodeToString(
      "sr-user:sr-pass".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    server.createContext("/schemas/ids/", { exchange =>
      try {
        if (!Option(exchange.getRequestHeaders.getFirst("Authorization")).contains(expected))
          exchange.sendResponseHeaders(401, -1)
        else {
          val body = """{"schema": "1:v:int64"}"""
            .getBytes(java.nio.charset.StandardCharsets.UTF_8)
          exchange.sendResponseHeaders(200, body.length)
          exchange.getResponseBody.write(body)
        }
      } finally exchange.close()
    })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      val ok = new SchemaRegistry.RestResolver(base,
        basicAuth = Some(("sr-user", "sr-pass"))).resolve(1)
      assert(ok == Seq(ProtoField(1, "v", "int64")))
      intercept[IllegalArgumentException](
        new SchemaRegistry.RestResolver(base,
          basicAuth = Some(("sr-user", "wrong"))).resolve(1))
    } finally server.stop(0)
  }

  test("sliding window builder rejects invalid sizes (sliding_window.rs builder)") {
    import spark.implicits._
    val ds = Seq(Windows.Keyed("k", 1.0)).toDS()
    intercept[IllegalArgumentException](Windows.countSlidingWindow(ds, 0, 1))
    intercept[IllegalArgumentException](Windows.countSlidingWindow(ds, 3, 0))
    intercept[IllegalArgumentException](Windows.countSlidingWindow(ds, 2, 3))
  }
}
