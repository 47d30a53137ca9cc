package graft

import java.time.LocalDate

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.WeeklySummary
import TestSpark._

/** Snapshot semantics on hand-built edge fixtures (FIXTURES.md §A):
  * null return_date, same-week return, Sunday/Monday week boundaries,
  * year wrap, and the return_date < rental_date anomaly. The nested-loop
  * variant is an independent formulation and serves as internal oracle.
  */
class WeeklySummarySpec extends AnyFunSuite {
  private val asOf = LocalDate.parse("2022-03-01")

  private val fixture = rentalDf(Seq(
    // plain: rented Wed 2021-12-29, returned Tue 2022-01-04 (year wrap, crosses week)
    RentalVersion(1, ts("2021-12-29 10:00:00"), Some(ts("2022-01-04 09:00:00")), ts("2022-01-04 09:00:00")),
    // same-week rental+return (Mon..Sun 2022-01-03..09)
    RentalVersion(2, ts("2022-01-03 08:00:00"), Some(ts("2022-01-09 23:59:59")), ts("2022-01-09 23:59:59")),
    // Sunday rental (end of week), never returned
    RentalVersion(3, ts("2022-01-09 12:00:00"), None, ts("2022-01-09 12:00:00")),
    // Monday-midnight rental (start of week), returned weeks later
    RentalVersion(4, ts("2022-01-10 00:00:00"), Some(ts("2022-02-01 00:00:00")), ts("2022-02-01 00:00:00")),
    // anomaly: return before rental (data error) — must never count as outstanding
    RentalVersion(5, ts("2022-01-20 00:00:00"), Some(ts("2022-01-15 00:00:00")), ts("2022-01-20 00:00:00"))))

  test("snapshot week boundaries and counts") {
    val out = WeeklySummary.snapshot(fixture, asOf).collect()
    val byWeek = out.map(r => r.getDate(0).toString -> r).toMap
    // spine: week(2021-12-27) .. week(asOf 2022-03-01 → 2022-02-28)
    assert(out.head.getDate(0).toString == "2021-12-27")
    assert(out.last.getDate(0).toString == "2022-02-28")
    assert(out.length == 10)
    // year-wrap week holds rental 1 only
    assert(byWeek("2021-12-27").getLong(1) == 1) // newly rented
    assert(byWeek("2021-12-27").getLong(4) == 1) // outstanding at week end
    // week 2022-01-03: rentals 2,3 rented; 1,2 returned; outstanding: 3 (id 3)
    assert(byWeek("2022-01-03").getLong(1) == 2)
    assert(byWeek("2022-01-03").getLong(2) == 2)
    assert(byWeek("2022-01-03").getLong(3) == 0)
    assert(byWeek("2022-01-03").getLong(4) == 1)
    // Monday-start rental 4 lands in week 2022-01-10, not the week before
    assert(byWeek("2022-01-10").getLong(1) == 1)
    // anomaly row 5: counted rented in week 2022-01-17, returned in week
    // 2022-01-10, never outstanding at any week end
    assert(byWeek("2022-01-17").getLong(1) == 1)
    assert(byWeek("2022-01-10").getLong(2) == 1)
    assert(byWeek("2022-01-17").getLong(4) == 2) // ids 3 and 4 only
    // open rentals keep outstanding constant to end of spine
    assert(byWeek("2022-02-28").getLong(4) == 1) // id 3 still out
  }

  test("cumulative reformulation equals nested-loop formulation") {
    assertSameRows(
      WeeklySummary.snapshot(fixture, asOf),
      WeeklySummary.snapshotNestedLoop(fixture, asOf))
  }

  test("statsForWeeks on sparse week set matches snapshot at those weeks") {
    val s = spark
    import s.implicits._
    val weeks = Seq(d("2022-01-03"), d("2022-02-21")).toDF("week_beginning")
    val sparse = WeeklySummary.statsForWeeks(fixture, weeks)
    val full = WeeklySummary.snapshot(fixture, asOf)
      .filter(org.apache.spark.sql.functions.col("week_beginning")
        .isin(d("2022-01-03"), d("2022-02-21")))
    assertSameRows(sparse, full)
  }
}
