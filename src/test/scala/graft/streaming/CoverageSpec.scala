package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Coverage fill-ins: csv/orc file formats through the engine input,
  * metadata column stamping, MLlib-LSH ANN vs brute force. */
class CoverageSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  test("file input reads csv with header and orc (input/file.rs formats enum)") {
    val base = java.nio.file.Files.createTempDirectory("graft_fmt").toString
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "tag")
    df.write.option("header", "true").csv(s"$base/c")
    df.write.orc(s"$base/o")
    val csv = Engine.inputFromConf(spark, ComponentConf("file",
      Map("format" -> "csv", "path" -> s"$base/c", "header" -> "true",
        "inferSchema" -> "true")))
    assert(csv.collect().map(r => (r.getInt(0), r.getString(1))).toSet ==
      Set((1, "a"), (2, "b")))
    val orc = Engine.inputFromConf(spark, ComponentConf("file",
      Map("format" -> "orc", "path" -> s"$base/o")))
    assert(orc.collect().map(r => (r.getLong(0), r.getString(1))).toSet ==
      Set((1L, "a"), (2L, "b")))
  }

  test("metadata columns stamp and strip (lib.rs:56-69)") {
    val df = Seq(1, 2).toDF("x")
    val stamped = Metadata.stamp(df, "kafka_in", Map("env" -> "test"))
    assert(stamped.columns.toSet ==
      Set("x", Metadata.Source, Metadata.IngestTime, Metadata.Ext))
    val row = stamped.select(Metadata.Source, Metadata.Ext).collect().head
    assert(row.getString(0) == "kafka_in")
    assert(row.getMap[String, String](1) == Map("env" -> "test"))
    assert(Metadata.strip(stamped).columns.toSeq == Seq("x"))
  }

  test("mllib LSH ANN finds neighbors consistent with brute force") {
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val lsh = graft.operators.Similarity.mllibLshKnn(emb, queryId = 0L, k = 5)
      .select("vec_id").as[Long].collect().toSet
    val brute = graft.operators.Similarity
      .bruteForceKnn(emb, nQueries = 1, k = 10)
      .select("cid").as[Long].collect().toSet
    // approx NN by euclidean vs exact top-10 by cosine: expect overlap
    assert(lsh.nonEmpty)
    assert((lsh & brute).nonEmpty, s"no overlap between lsh=$lsh and brute=$brute")
  }
}
