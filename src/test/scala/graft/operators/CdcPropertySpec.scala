package graft.operators

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, rng}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the rolling-hash text kernels (CdcChunks AND
  * WinnowFps — they share the polynomial window hash): the O(1)-slide
  * rolling/deque maintenance must equal the explicit windowed
  * formulation the DuckDB oracles compute, for ANY text (multi-script,
  * astral, degenerate lengths) and any parameters — the generated-input
  * counterpart of SelectionSpec's fixed-fixture parity tests, same
  * harness pattern as BpePropertySpec pinning the BPE encode paths.
  */
class CdcPropertySpec extends AnyFunSuite {

  // spans 1-, 2-, 3- and 4-byte UTF-8 (astral 😀🚀), plus separators
  private val alphabet: Seq[String] =
    ("abz09 .".map(_.toString) ++ "éñ".map(_.toString) ++
      "αж".map(_.toString) ++ "你好".map(_.toString) ++ Seq("😀", "🚀"))

  private val textGen: Gen[String] = for {
    n <- Gen.frequency(1 -> Gen.choose(0, 7), 4 -> Gen.choose(8, 400))
    cs <- Gen.listOfN(n, Gen.oneOf(alphabet))
  } yield cs.mkString

  private val caseGen: Gen[(String, Int, Int)] = for {
    s <- textGen
    k <- Gen.choose(2, 12)
    d <- Gen.oneOf(2, 8, 32, 64)
  } yield (s, k, d)

  private def cases[T](g: Gen[T], n: Int): Seq[T] = {
    val params = Gen.Parameters.default
    Iterator.iterate(rng.Seed(20260813L))(_.next).take(n).toSeq
      .map(s => g.pureApply(params, s))
  }

  /** Independent reference: the explicit windowed sum per position —
    * exactly the formulation the DuckDB oracle runs. */
  private def windowedChunks(s: String, k: Int, d: Int): Seq[String] = {
    val M = 1000000007L
    val cps = s.codePoints().toArray
    val pow = Array.iterate(1L, k)(_ * 257L % M).reverse
    val cuts = (k to cps.length).filter { i =>
      (i - k until i).map(j => cps(j) * pow(j - (i - k)) % M).sum % M % d == 0
    }
    val bounds = (0 +: cuts :+ cps.length).distinct
    bounds.sliding(2).collect { case Seq(a, b) if b > a =>
      new String(cps.slice(a, b), 0, b - a)
    }.toSeq
  }

  private def rollingChunks(s: String, k: Int, d: Int): Seq[String] = {
    val a = graft.functions.CdcChunks.chunks(UTF8String.fromString(s), k, d)
    (0 until a.numElements()).map(i => a.getUTF8String(i).toString)
  }

  test("rolling == windowed for 300 generated multi-script (text, k, d) cases") {
    cases(caseGen, 300).foreach { case (s, k, d) =>
      assert(rollingChunks(s, k, d) == windowedChunks(s, k, d),
        s"k=$k d=$d text=${s.take(40)}")
    }
  }

  test("chunks always partition the text exactly") {
    cases(caseGen, 300).foreach { case (s, k, d) =>
      assert(rollingChunks(s, k, d).mkString == s, s"k=$k d=$d text=${s.take(40)}")
    }
  }

  test("winnow_fps equals the explicit per-window list_min reference (oracle formulation)") {
    def refFps(s: String, k: Int, w: Int): Set[Long] = {
      val M = 1000000007L
      val cps = s.codePoints().toArray
      val pow = Array.iterate(1L, k)(_ * 257L % M).reverse
      val hs = (k to cps.length).map { i =>
        (i - k until i).map(j => cps(j) * pow(j - (i - k)) % M).sum % M
      }
      (0 to hs.length - w).map(j => hs.slice(j, j + w).min).toSet
    }
    val caseGen = for {
      s <- textGen; k <- Gen.choose(2, 10); w <- Gen.choose(1, 6)
    } yield (s, k, w)
    cases(caseGen, 300).foreach { case (s, k, w) =>
      val a = graft.functions.WinnowFps.fps(UTF8String.fromString(s), k, w)
      val got = (0 until a.numElements()).map(a.getLong).toSet
      assert(got == refFps(s, k, w), s"k=$k w=$w text=${s.take(40)}")
      // sorted-distinct output contract
      val seq = (0 until a.numElements()).map(a.getLong)
      assert(seq == seq.distinct.sorted)
    }
  }

  test("winnowing guarantee: a shared ≥ k+w−1 run yields a shared fingerprint, anywhere") {
    def fps(s: String): Set[Long] = {
      val a = graft.functions.WinnowFps.fps(UTF8String.fromString(s), 8, 4)
      (0 until a.numElements()).map(a.getLong).toSet
    }
    val shared = "THE-SHARED-SEGMENT-IS-THIS" // 26 ≥ k+w−1 = 11
    cases(Gen.zip(textGen, textGen), 100).foreach { case (p1, p2) =>
      val d1 = p1 + shared
      val d2 = shared + p2 // at a DIFFERENT offset
      assert((fps(d1) & fps(d2)).nonEmpty,
        s"shared run must fingerprint-collide: ${p1.take(20)} / ${p2.take(20)}")
    }
    assert(fps("0123456789").isEmpty, "texts shorter than k+w−1 emit no fingerprints")
  }

  test("a suffix edit never changes chunks before the last one (CDC locality)") {
    cases(textGen, 150).filter(s => s.codePointCount(0, s.length) >= 32)
      .foreach { s =>
        val (k, d) = (8, 32)
        val before = rollingChunks(s, k, d)
        val after = rollingChunks(s + "APPENDED TAIL", k, d)
        // every chunk but the last ends at a CONTENT boundary, which a
        // suffix-only edit cannot move — only the final partial chunk may
        // re-form
        assert(after.startsWith(before.dropRight(1)),
          s"prefix chunks changed after a suffix-only edit: ${s.take(30)}")
      }
  }
}
