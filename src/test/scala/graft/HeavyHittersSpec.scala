package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.EventOps
import TestSpark._

/** The Misra–Gries guarantees are merge-order-FREE even though counter
  * values aren't: every item with frequency > n/(k+1) survives, and
  * every estimate ĉ obeys c − n/(k+1) ≤ ĉ ≤ c. Both asserted through
  * the DataFrame operator under forced repartitioning (adversarial
  * partial-aggregation splits). */
class HeavyHittersSpec extends AnyFunSuite {

  private def eventsOf(users: Seq[Long]) = {
    val s = spark
    import s.implicits._
    users.zipWithIndex.map { case (u, i) =>
      (i.toLong, ts("2024-01-01 00:00:00"), u, "a", 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  test("planted heavy user survives every split with a bounded estimate") {
    val k = 16
    val users = Seq.fill(1000)(7L) ++ (100L until 150L) // n = 1050
    val n = users.size
    val bound = n.toDouble / (k + 1)
    for (parts <- Seq(1, 4, 13)) {
      val out = EventOps.heavyUsers(eventsOf(users).repartition(parts), k)
        .collect().map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("est_count"))
        .toMap
      assert(out.contains(7L), s"heavy user evicted at parts=$parts")
      assert(out(7L) <= 1000 && out(7L) >= 1000 - bound,
        s"estimate ${out(7L)} outside [${1000 - bound}, 1000] at parts=$parts")
    }
  }

  test("every reported estimate is an under-count within the error bound") {
    val k = 8
    // skewed zipf-ish mix: several mid-weight users + tail
    val users = (1L to 5L).flatMap(u => Seq.fill(60 * u.toInt)(u)) ++
      (1000L until 1100L)
    val n = users.size
    val truth = users.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val out = EventOps.heavyUsers(eventsOf(users).repartition(7), k)
      .collect().map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("est_count"))
    out.foreach { case (u, est) =>
      val c = truth(u)
      assert(est <= c, s"over-count for $u: $est > $c")
      assert(est >= c - n.toDouble / (k + 1), s"under bound for $u: $est vs $c")
    }
    // the top item must be reported: freq 300 > n/(k+1)
    assert(out.map(_._1).contains(5L))
  }
}
