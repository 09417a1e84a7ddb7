package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the analytics-operator library over the sf0.001 fixtures. */
class OperatorsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.streaming.SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("flagship entry returns rows") {
    assert(graft.SparkEntry.entry(spark).count() > 0)
  }

  test("every query key has either an oracle or a documented omission") {
    val qs = graft.SparkEntry.queries.keySet
    val os = graft.SparkEntry.oracleSql.keySet
    assert(os.subsetOf(qs), s"oracle keys without queries: ${os -- qs}")
    // only approx aggregates are allowed to skip the oracle
    assert((qs -- os).forall(_.contains("approx")), s"missing oracles: ${qs -- os}")
  }

  test("module query maps never shadow each other (Map ++ overwrites silently)") {
    val modules: Seq[(String, Set[String])] = Seq(
      "Relational" -> Relational.queries.keySet,
      "Functions" -> Functions.queries.keySet,
      "Analytics" -> Analytics.queries.keySet,
      "EventsOps" -> EventsOps.queries.keySet,
      "Dedup" -> Dedup.queries.keySet,
      "TextAnalysis" -> TextAnalysis.queries.keySet,
      "Similarity" -> Similarity.queries.keySet,
      "Multimodal" -> Multimodal.queries.keySet,
      "Extensions" -> Extensions.queries.keySet)
    val total = modules.map(_._2.size).sum
    assert(total == graft.SparkEntry.queries.size,
      s"key collision: modules declare $total keys, merged map has ${graft.SparkEntry.queries.size}")
  }

  test("multimodal mapPartitions decode matches the columnar path") {
    import spark.implicits._
    val meta = Multimodal.decodeMedia(spark, Multimodal.fakeMediaTable(spark, sf))
      .collect().sortBy(_.doc_id)
    val cols = graft.SparkEntry.queries("q65_multimodal_meta")(spark, sf)
      .collect()
    assert(meta.length == cols.length)
    val first = meta.head
    val firstCols = cols.head
    assert(first.n_bytes == firstCols.getLong(1))
    assert(first.width.toLong == firstCols.getLong(2))
    assert(first.height.toLong == firstCols.getLong(3))
    assert(first.digest == firstCols.getString(5))
  }

  test("minhash finds high-jaccard pairs and dedup_exact groups are consistent") {
    val pairs = Dedup.minhashPairs(graft.Tables.load(spark, sf, "documents"), "doc_id", "text")
    assert(pairs.count() >= 0) // shape check: columns + no self-pairs
    assert(pairs.columns.toSeq == Seq("doc_a", "doc_b"))
    assert(pairs.filter("doc_a >= doc_b").count() == 0)
  }

  test("knn returns k neighbors per query with cosine in [-1, 1]") {
    val k = Similarity.bruteForceKnn(graft.Tables.load(spark, sf, "embeddings"), 3, 4)
    val rows = k.collect()
    assert(rows.groupBy(_.getLong(0)).forall(_._2.length == 4))
    assert(rows.forall(r => math.abs(r.getDouble(2)) <= 1.000001))
  }
}
