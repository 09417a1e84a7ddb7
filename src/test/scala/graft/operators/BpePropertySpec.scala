package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck-generated parity pinning for the BPE encode paths
  * (BpeTokenizer.tokenize): the plan-constant type-table FAST path
  * (driver `encodeLocal` per word type) vs the codegen `bpe_encode`
  * FALLBACK (memoized per-row map) must agree token-for-token on any
  * corpus, any learned merge table, and at every threshold regime —
  * 0 (always fallback), 1, the exact distinct-word boundary, boundary-1,
  * and unbounded. Words are generated across scripts with different
  * UTF-8 widths (ASCII, accented Latin, Greek, Cyrillic, CJK) because
  * the two paths split words to symbols in different engines (Java
  * String.split on the driver vs Spark's split in codegen) and any
  * divergence would silently fork the vocabulary.
  */
class BpePropertySpec extends AnyFunSuite {
  lazy val spark = graft.streaming.SparkTestSession.spark

  // deliberately small alphabet so generated corpora repeat words and
  // symbol pairs (minFreq thresholds engage); spans 1-, 2- and 3-byte
  // UTF-8 scripts. '<'/'>' excluded: a word containing a literal "</w>"
  // run would collide with the end-of-word marker by construction (a
  // documented encoding-domain restriction, not a path divergence).
  private val alphabet: Seq[String] =
    ("abcde".map(_.toString) ++ "éüñ".map(_.toString) ++
      "αβγ".map(_.toString) ++ "жд".map(_.toString) ++
      "你好数".map(_.toString))

  private val wordGen: Gen[String] = for {
    n <- Gen.frequency(3 -> Gen.choose(1, 4), 2 -> Gen.choose(5, 9))
    cs <- Gen.listOfN(n, Gen.oneOf(alphabet))
  } yield cs.mkString

  /** A corpus: a small word pool sampled WITH repetition into a few
    * documents, so pair frequencies clear minFreq and merges learn. */
  private val corpusGen: Gen[Seq[String]] = for {
    poolSize <- Gen.choose(2, 8)
    pool <- Gen.listOfN(poolSize, wordGen)
    nDocs <- Gen.choose(1, 4)
    docs <- Gen.listOfN(nDocs, for {
      len <- Gen.choose(1, 12)
      ws <- Gen.listOfN(len, Gen.oneOf(pool))
    } yield ws.mkString(" "))
  } yield docs

  private def cases[T](g: Gen[T], n: Int): Seq[T] = {
    val params = Gen.Parameters.default
    Iterator.iterate(rng.Seed(20260813L))(_.next).take(n).toSeq
      .map(s => g.pureApply(params, s))
  }

  test("fast path and codegen fallback agree on generated unicode corpora at every threshold") {
    import spark.implicits._
    cases(corpusGen, 12).zipWithIndex.foreach { case (docsSeq, i) =>
      val docs = docsSeq.zipWithIndex
        .map { case (t, j) => (j.toLong, t) }.toDF("doc_id", "text")
      val merges = BpeTokenizer.train(docs, "text", numMerges = 12, minFreq = 2)
      val distinctWords = docsSeq.flatMap(_.split(" ")).filter(_.nonEmpty).distinct.size.toLong
      def toks(thr: Long): Seq[(Long, Seq[String])] =
        BpeTokenizer.tokenize(docs, "doc_id", "text", merges,
          localTypeThreshold = thr)
          .orderBy(col("doc_id")).collect()
          .map(r => (r.getLong(0), r.getSeq[String](1).toList)).toSeq
      // unbounded fast path is the reference; every other regime must match
      val ref = toks(Long.MaxValue)
      for (thr <- Seq(0L, 1L, math.max(distinctWords - 1, 0L), distinctWords))
        assert(toks(thr) == ref,
          s"case $i: threshold $thr diverged from the fast path " +
            s"(corpus=$docsSeq, merges=${merges.map(m => m.left -> m.right)})")
      // detok invariant holds for every generated corpus
      val normalized = docsSeq.map(_.split(" ").filter(_.nonEmpty).mkString(" "))
      ref.map(_._2.mkString.replace("</w>", " ").trim).zip(normalized)
        .foreach { case (got, want) => assert(got == want,
          s"case $i: token concatenation must reproduce the document") }
    }
  }

  test("encodeLocal equals the codegen expression word-for-word on generated words") {
    import spark.implicits._
    // one corpus's learned table applied to FRESH words (unseen at train
    // time) — the per-type memoized fallback and the driver encoder must
    // still agree symbol-for-symbol
    val trainDocs = cases(corpusGen, 1).head.zipWithIndex
      .map { case (t, j) => (j.toLong, t) }.toDF("doc_id", "text")
    val merges = BpeTokenizer.train(trainDocs, "text", numMerges = 10, minFreq = 2)
    val sorted = merges.sortBy(_.rank)
    val words = cases(wordGen, 120).distinct
    val df = words.zipWithIndex.map { case (w, j) => (j.toLong, w) }.toDF("doc_id", "text")
    val codegen = BpeTokenizer.tokenize(df, "doc_id", "text", merges,
      localTypeThreshold = 0L)
      .orderBy(col("doc_id")).collect().map(_.getSeq[String](1).toList)
    words.zip(codegen).foreach { case (w, got) =>
      assert(BpeTokenizer.encodeLocal(w, sorted).toList == got,
        s"encodeLocal vs bpe_encode diverged on word '$w'")
    }
  }

  test("both paths agree on supplementary-plane (astral) characters") {
    import spark.implicits._
    // 4-byte UTF-8 / surrogate-pair chars: the driver splits words with
    // Java String.split(""), codegen with Spark's split — both advance
    // by code point, and this pins that they keep doing so
    val astral = Seq((0L, "😀a 😀a b💩"),
      (1L, "😀a b💩 b💩"))
    val docs = astral.toDF("doc_id", "text")
    val merges = BpeTokenizer.train(docs, "text", numMerges = 5, minFreq = 2)
    def toks(thr: Long) =
      BpeTokenizer.tokenize(docs, "doc_id", "text", merges, localTypeThreshold = thr)
        .orderBy(col("doc_id")).collect().map(_.getSeq[String](1).toList).toSeq
    assert(toks(Long.MaxValue) == toks(0L),
      "astral-character words must tokenize identically on both paths")
    assert(toks(Long.MaxValue).head.mkString.replace("</w>", " ").trim ==
      astral.head._2, "astral detok must reproduce the document")
  }
}
