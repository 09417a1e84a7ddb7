package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property pins for the round-7 operators — invariants the DuckDB
  * oracle diff cannot express (the oracle proves both engines agree;
  * these prove the agreed answer has the MATHEMATICAL shape the
  * operator claims).
  */
class RoundSevenSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.streaming.SparkTestSession.spark
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  test("waterFill: allocations sum to the budget and never exceed a source") {
    val docs = graft.Tables.load(spark, sf, "documents")
    val out = Selection.waterFill(docs, "source",
      size(split(col("text"), " ")), budgetFrac = 0.5).collect()
    val budget = out.head.getDouble(2)
    val allocSum = out.map(_.getDouble(4)).sum
    // rounding each of k allocs at 4dp bounds the drift at k*5e-5
    assert(math.abs(allocSum - budget) < out.length * 5e-5,
      s"sum(alloc)=$allocSum != budget=$budget")
    out.foreach { r =>
      assert(r.getDouble(4) <= r.getLong(1) + 1e-9, s"alloc exceeds source: $r")
      assert(r.getDouble(4) <= r.getDouble(3) + 1e-9, s"alloc exceeds level: $r")
    }
    // budget >= total: every source keeps everything
    val full = Selection.waterFill(docs, "source",
      size(split(col("text"), " ")), budgetFrac = 2.0).collect()
    full.foreach(r => assert(r.getDouble(4) == r.getLong(1).toDouble))
  }

  test("isotonic fit is monotone, bounded, and exact on already-monotone data") {
    val out = Eval.isotonicCalibration(
      Eval.scoredDocs(spark, sf), "score", "label", nBins = 10)
      .orderBy(col("bin")).collect()
    val fitted = out.map(_.getDouble(4))
    fitted.sliding(2).foreach { case Array(a, b) =>
      assert(a <= b + 1e-9, s"PAV output must be nondecreasing: ${fitted.toSeq}")
    }
    fitted.foreach(f => assert(f >= 0.0 && f <= 1.0))
    // a hand-built monotone table must be returned unchanged
    val mono = Seq((0.05, 0), (0.15, 0), (0.25, 1), (0.35, 1))
      .flatMap { case (s, l) => Seq.fill(10)((s, l)) }
      .toDF("score", "label")
    val fit2 = Eval.isotonicCalibration(mono, "score", "label", nBins = 10)
      .orderBy(col("bin")).collect()
    fit2.foreach(r => assert(r.getDouble(4) == r.getDouble(3),
      s"monotone input must be its own PAV fit: $r"))
  }

  test("rboAtK: identical rankings score the p-series max, disjoint score 0") {
    val a = Seq((0L, 10L, 1), (0L, 11L, 2), (0L, 12L, 3))
      .toDF("qid", "cid", "rnk")
    val b = Seq((0L, 20L, 1), (0L, 21L, 2), (0L, 22L, 3))
      .toDF("qid", "cid", "rnk")
    val same = Similarity.rboAtK(a, a, k = 3, p = 0.9).collect().head
    val maxRbo = (1 - 0.9) * (1 to 3).map(d => math.pow(0.9, d - 1) / d * d).sum
    assert(math.abs(same.getDouble(2) - math.rint(maxRbo * 1e6) / 1e6) < 1e-6)
    val disj = Similarity.rboAtK(a, b, k = 3, p = 0.9).collect().head
    assert(disj.getLong(1) == 0 && disj.getDouble(2) == 0.0)
  }

  test("kCore converges on a fixture: peeled graph has min degree >= k") {
    // path 1-2-3 hangs off a triangle 3-4-5(-3); 2-core = the triangle
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (3L, 5L))
      .toDF("doc_a", "doc_b")
    val core = Corpus.kCore(pairs, "doc_a", "doc_b", k = 2, rounds = 5)
      .orderBy(col("doc_id")).collect()
    assert(core.map(_.getLong(0)).toSeq == Seq(3L, 4L, 5L))
    core.foreach(r => assert(r.getLong(1) >= 2))
  }

  test("spearman hits the +1/-1 poles on perfectly monotone data") {
    val up = (1 to 50).map(i => (i.toLong, i.toDouble, (i * 3 + 7).toDouble))
      .toDF("id", "x", "y")
    assert(Eval.spearman(up, "x", "y", "id").collect().head.getDouble(1) == 1.0)
    val down = (1 to 50).map(i => (i.toLong, i.toDouble, (100 - i).toDouble))
      .toDF("id", "x", "y")
    assert(Eval.spearman(down, "x", "y", "id").collect().head.getDouble(1) == -1.0)
  }

  test("mannWhitney: a pure location shift gives the expected sign and |z|") {
    // group b strictly above group a -> U_ab (a-side rank sum form) = 0
    // -> z strongly negative; symmetric swap flips the sign
    val rows = (1 to 30).map(i => ("a", i.toDouble)) ++
      (1 to 30).map(i => ("b", i + 100.0))
    val out = Corpus.mannWhitneyAllPairs(rows.toDF("g", "v"), "g", col("v"))
      .collect().head
    assert(out.getLong(4) == 0L) // 2U: no b-value below any a-value
    assert(out.getDouble(5) < -6.0, s"expected strong negative z: $out")
  }

  test("psi: a slice-invariant distribution reports zero drift everywhere") {
    // identical score distribution in both slices (consecutive id PAIRS
    // share a score, the parity split separates them) -> psi_part = 0
    val rows = (0 until 200).map { i =>
      (i.toLong, (i / 2 % 10) / 10.0 + 0.05)
    }.toDF("doc_id", "score")
    val out = Eval.psi(rows, "score", col("doc_id") % 2 === 0, nBins = 10)
      .collect()
    out.foreach(r => assert(r.getDouble(5) == 0.0, s"nonzero psi: $r"))
  }

  test("continuationPairs finds exactly a planted split") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "gamma delta epsilon zeta eta theta"), // continues doc 1
      (3L, "iota kappa lambda mu")).toDF("doc_id", "text")
    val out = Dedup.continuationPairs(docs, "doc_id", "text", n = 3).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 2L)))
  }

  test("concentration: uniform sources give gini 0 and effective = n") {
    val docs = (0 until 100).map(i => (i.toLong, s"src${i % 4}"))
      .toDF("doc_id", "source")
    val r = Corpus.concentrationReport(docs, "source").collect().head
    assert(r.getLong(0) == 4 && r.getDouble(5) == 0.0) // gini
    assert(math.abs(r.getDouble(3) - 4.0) < 1e-4) // effective_sources
    assert(r.getDouble(4) == 0.25) // hhi
  }
}
