package graft.operators

import org.scalacheck.{Gen, rng}
import org.scalatest.funsuite.AnyFunSuite

/** Generated-input pin for RangeJoin.intervalOverlapPairs: the binned
  * equi-join + first-agreeing-bin dedup must reproduce the brute-force
  * pairwise overlap predicate on arbitrary intervals — including
  * NEGATIVE coordinates, where Spark's integral `div` truncates toward
  * zero instead of flooring. Correctness only needs the bin mapping to
  * be monotonic non-decreasing (so an interval's covered bins form the
  * contiguous range [bin(lo), bin(hi)] and the overlap start's bin lies
  * in both ranges), which trunc-division satisfies — this spec pins
  * that argument with generated data on both sides of zero.
  */
class IntervalPropertySpec extends AnyFunSuite {

  private def cases[T](g: Gen[T], n: Int): Seq[T] = {
    val params = Gen.Parameters.default
    Iterator.iterate(rng.Seed(20260814L))(_.next).take(n).toSeq
      .map(s => g.pureApply(params, s))
  }

  test("binned overlap join matches brute force on random signed intervals") {
    val ivGen = for {
      n <- Gen.choose(2, 30)
      ivs <- Gen.listOfN(n, for {
        key <- Gen.choose(0L, 2L)
        lo <- Gen.choose(-500L, 500L)
        len <- Gen.choose(-20L, 200L) // negative => empty interval rows
      } yield (key, lo, lo + len))
      w <- Gen.oneOf(1L, 7L, 64L, 1000L)
    } yield (ivs.zipWithIndex.map { case ((k, lo, hi), i) => (i.toLong, k, lo, hi) }, w)
    val spark = graft.streaming.SparkTestSession.spark
    import spark.implicits._
    cases(ivGen, 30).foreach { case (ivs, w) =>
      val brute = (for {
        (ia, ka, loa, hia) <- ivs if hia >= loa
        (ib, kb, lob, hib) <- ivs if hib >= lob
        if ka == kb && ia < ib && loa <= hib && lob <= hia
      } yield (ka, ia, ib, math.min(hia, hib) - math.max(loa, lob))).toSet
      val got = RangeJoin.intervalOverlapPairs(
          ivs.toDF("id", "key", "lo", "hi"), Seq("key"), "id", "lo", "hi", w)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(got.length == got.toSet.size,
        s"duplicate pairs at binWidth=$w over ${ivs.size} intervals")
      assert(got.toSet == brute,
        s"pair drift at binWidth=$w: missing=${brute -- got.toSet} extra=${got.toSet -- brute}")
    }
  }
}
