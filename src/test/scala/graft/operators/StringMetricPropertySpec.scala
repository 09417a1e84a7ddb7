package graft.operators

import org.scalacheck.{Gen, rng}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{CharEntropy, DamerauLevenshtein, JaroWinkler}
import org.apache.spark.unsafe.types.UTF8String

/** ScalaCheck-generated invariant pinning for the round-6 string-metric
  * expressions. The DuckDB oracle pins exact VALUES at sf0.01; these pin
  * the METRIC laws (symmetry, bounds, triangle inequality, degeneracy)
  * across thousands of adversarial strings — repeated chars, shared
  * prefixes, transposition soup — where a kernel indexing bug would
  * surface as a law violation long before it perturbs corpus values.
  */
class StringMetricPropertySpec extends AnyFunSuite {

  private def u(s: String) = UTF8String.fromString(s)
  private def dl(a: String, b: String): Int =
    DamerauLevenshtein.distance(u(a), u(b))
  private def jw(a: String, b: String): Double =
    JaroWinkler.similarity(u(a), u(b))

  // small alphabet so collisions, shared prefixes, and transpositions
  // actually occur in generated pairs
  private val word: Gen[String] =
    Gen.chooseNum(0, 12).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', 'd')).map(_.mkString))

  private def samples[A](g: Gen[A], n: Int, seedBase: Long): Seq[A] =
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default, rng.Seed(seedBase + i)))

  test("damerau-levenshtein is a metric: symmetry, identity, triangle inequality") {
    val triples = samples(Gen.zip(word, word, word), 400, 101L)
    triples.foreach { case (a, b, c) =>
      assert(dl(a, b) == dl(b, a), s"symmetry ($a,$b)")
      assert((dl(a, b) == 0) == (a == b), s"identity ($a,$b)")
      assert(dl(a, c) <= dl(a, b) + dl(b, c),
        s"triangle ($a,$b,$c): ${dl(a, c)} > ${dl(a, b)} + ${dl(b, c)}")
      assert(dl(a, b) >= math.abs(a.length - b.length))
      assert(dl(a, b) <= math.max(a.length, b.length))
    }
  }

  test("damerau never exceeds levenshtein; one adjacent swap costs exactly 1") {
    def lev(a: String, b: String): Int = {
      val m = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        m(i)(j) = math.min(math.min(m(i - 1)(j) + 1, m(i)(j - 1) + 1),
          m(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      m(a.length)(b.length)
    }
    samples(Gen.zip(word, word), 400, 202L).foreach { case (a, b) =>
      assert(dl(a, b) <= lev(a, b), s"dl > lev on ($a,$b)")
    }
    // swapping two DISTINCT adjacent chars is exactly one edit
    samples(word.suchThat(_.length >= 2), 200, 303L).foreach { w =>
      val i = w.length / 2 - 1
      if (w(i) != w(i + 1)) {
        val swapped = w.substring(0, i) + w(i + 1) + w(i) + w.substring(i + 2)
        assert(dl(w, swapped) == 1, s"swap in '$w' -> '$swapped'")
      }
    }
  }

  test("jaro-winkler: bounds, symmetry, 1 iff equal (non-empty), boost monotonicity") {
    samples(Gen.zip(word, word), 500, 404L).foreach { case (a, b) =>
      val s = jw(a, b)
      assert(s >= 0.0 && s <= 1.0, s"bounds ($a,$b): $s")
      assert(s == jw(b, a), s"symmetry ($a,$b)")
      if (a.nonEmpty && b.nonEmpty)
        assert((s == 1.0) == (a == b), s"unit iff equal ($a,$b): $s")
      else assert(s == 0.0, s"empty-side zero ($a,$b)")
    }
  }

  test("char entropy: bounds [0, log2(distinct)], permutation invariance") {
    samples(word, 400, 505L).foreach { w =>
      val e = CharEntropy.entropy(u(w))
      val distinct = w.toSet.size
      assert(e >= -1e-12, s"negative entropy on '$w'")
      if (distinct > 0)
        assert(e <= math.log(distinct.toDouble) / math.log(2.0) + 1e-12,
          s"entropy over log2(distinct) on '$w'")
      // entropy depends only on the multiset of chars
      assert(CharEntropy.entropy(u(w.sorted)) == e, s"permutation variance on '$w'")
      assert(CharEntropy.entropy(u(w.reverse)) == e, s"reversal variance on '$w'")
    }
  }

  test("banded levenshtein == reference DP within threshold, -1 beyond " +
      "(the built-in 3-arg contract, kernel swapped for speed)") {
    def lev(a: String, b: String): Int = {
      val m = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        m(i)(j) = math.min(math.min(m(i - 1)(j) + 1, m(i)(j - 1) + 1),
          m(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      m(a.length)(b.length)
    }
    def bl(a: String, b: String, t: Int): Int =
      graft.functions.BandedLevenshtein.distance(u(a), u(b), t)
    samples(Gen.zip(word, word, Gen.chooseNum(0, 14)), 800, 404L)
      .foreach { case (a, b, t) =>
        val exact = lev(a, b)
        val banded = bl(a, b, t)
        if (exact <= t) assert(banded == exact,
          s"banded($a,$b,$t)=$banded != exact $exact")
        else assert(banded == -1, s"banded($a,$b,$t)=$banded, want -1 (exact $exact)")
        assert(bl(a, b, t) == bl(b, a, t), s"symmetry ($a,$b,$t)")
      }
    assert(bl("anything", "x", -1) == -1, "negative threshold is always -1")
    assert(bl("", "", 0) == 0)
    assert(bl("", "abc", 2) == -1 && bl("", "abc", 3) == 3)
  }
}
