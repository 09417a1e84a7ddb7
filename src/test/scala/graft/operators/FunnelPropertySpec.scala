package graft.operators

import org.scalacheck.{Gen, rng}
import org.scalatest.funsuite.AnyFunSuite

/** Generated-input pin for the funnel operator (EventsOps.funnel): the
  * chained-window formulation must reproduce the semantics of a
  * sequential cursor walk over each user's time-ordered events — the
  * obviously-correct reference implementation.
  */
class FunnelPropertySpec extends AnyFunSuite {

  private def cases[T](g: Gen[T], n: Int): Seq[T] = {
    val params = Gen.Parameters.default
    Iterator.iterate(rng.Seed(20260813L))(_.next).take(n).toSeq
      .map(s => g.pureApply(params, s))
  }

  test("funnel matches a sequential-scan reference on random event streams") {
    // independent reference: walk each user's time-ordered events once,
    // advancing a cursor through the step list — the semantics the
    // window formulation must reproduce
    val steps = Seq("view", "click", "purchase")
    def ref(evs: Seq[(Long, String, Long)]): Map[Long, (Int, Array[Option[Long]])] =
      evs.groupBy(_._1).map { case (u, es) =>
        val sorted = es.sortBy(_._3)
        val hit = Array.fill[Option[Long]](steps.size)(None)
        var last = Long.MinValue
        var depth = 0
        sorted.foreach { case (_, t, ts) =>
          if (depth < steps.size && t == steps(depth) && ts > last) {
            hit(depth) = Some(ts); last = ts; depth += 1
          }
        }
        u -> (depth, hit)
      }
    val evGen = for {
      nUsers <- Gen.choose(1, 6)
      n <- Gen.choose(1, 40)
      evs <- Gen.listOfN(n, for {
        u <- Gen.choose(0L, nUsers.toLong)
        t <- Gen.oneOf("view", "click", "purchase", "error", "signup")
        ts <- Gen.choose(1L, 30L)
      } yield (u, t, ts))
    } yield evs.distinctBy(e => (e._1, e._3)) // unique (user, ts): ties undefined
    val spark = graft.streaming.SparkTestSession.spark
    import spark.implicits._
    cases(evGen, 40).filter(_.nonEmpty).foreach { evs =>
      val got = graft.operators.EventsOps
        .funnel(evs.toDF("user_id", "event_type", "tsn"),
          "user_id", "event_type", "tsn", steps)
        .collect().map(r => r.getLong(0) ->
          (r.getInt(4), Array(1, 2, 3).map(i => if (r.isNullAt(i)) None else Some(r.getLong(i)))))
        .toMap
      val expect = ref(evs)
      assert(got.keySet == expect.keySet)
      got.foreach { case (u, (d, hits)) =>
        val (rd, rh) = expect(u)
        assert(d == rd && hits.sameElements(rh),
          s"user $u: got depth $d ${hits.toSeq}, ref $rd ${rh.toSeq} — events ${evs.filter(_._1 == u)}")
      }
    }
  }

}
