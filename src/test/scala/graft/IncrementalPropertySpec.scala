package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.incremental._
import graft.ops.WeeklySummary
import TestSpark._

/** Property: for any rental log whose `last_update` tracks activity time
  * (the reference's intended CDC contract, README.md:100-103 "last_update
  * must be updated to the current time"), replaying the log in arbitrary
  * batch splits through the incremental pipeline converges to the snapshot
  * query over the final source — README.md:67-74's dual-implementation
  * oracle, mechanized (SURVEY.md §5).
  *
  * Uses raw ScalaCheck generators with fixed seeds (the
  * scalatest-scalacheck bridge isn't in the offline artifact cache).
  */
class IncrementalPropertySpec extends AnyFunSuite {

  private val base = ts("2022-01-03 00:00:00").getTime
  private val day = 86400000L

  /** (id, rentalDay, returnDelay: None=open) over a ~20-week range. */
  private val logGen: Gen[List[(Long, Int, Option[Int])]] =
    Gen.chooseNum(1, 25).flatMap { n =>
      Gen.sequence[List[(Long, Int, Option[Int])], (Long, Int, Option[Int])](
        (1 to n).map { id =>
          for {
            rd <- Gen.chooseNum(0, 140)
            ret <- Gen.option(Gen.chooseNum(0, 60))
          } yield (id.toLong, rd, ret)
        }.toList)
    }

  private val cutsGen: Gen[List[Int]] =
    Gen.chooseNum(1, 4).flatMap(k => Gen.listOfN(k, Gen.chooseNum(0, 210)))

  test("incremental replay converges to snapshot (random logs, random batches)") {
    for (trial <- 1 to 8) {
      val rows = logGen.pureApply(Gen.Parameters.default, Seed(trial.toLong))
      val cuts = cutsGen.pureApply(Gen.Parameters.default, Seed(1000L + trial))

      val versions = rows.flatMap { case (id, rd, ret) =>
        val rdTs = new Timestamp(base + rd * day)
        val v1 = RentalVersion(id, rdTs, None, rdTs)
        ret match {
          case Some(delay) =>
            val retTs = new Timestamp(base + (rd + delay) * day)
            // activity-time CDC: the return version carries last_update =
            // greatest(rental, return), like Tables.rental's view
            List(v1, RentalVersion(id, rdTs, Some(retTs),
              new Timestamp(math.max(rdTs.getTime, retTs.getTime))))
          case None => List(v1)
        }
      }
      val log = rentalDf(versions)
      val dir = Files.createTempDirectory("graft-prop").toString
      val orderedCuts = (cuts.map(c => new Timestamp(base + c * day)) :+
        new Timestamp(base + 250 * day)).sortBy(_.getTime)
      orderedCuts.foreach { t =>
        IncrementalWeeklySummary.run(spark, sourceAsOf(log, t), dir, now = ts("2030-01-01 00:00:00"))
      }
      val finalSource = sourceAsOf(log, orderedCuts.last)
      val maxW = finalSource
        .agg(WeeklySummary.weekStart(to_date(max(
          greatest(col("rental_date"), coalesce(col("return_date"), col("rental_date")))))))
        .head().getDate(0)
      val expected = WeeklySummary.snapshot(finalSource, SparkEntry.AsOf)
        .filter(col("week_beginning") <= lit(maxW))
      val got = IncrementalWeeklySummary.readSummary(spark, dir).select(
        col("week_beginning"),
        col("newly_rented_during_week"),
        col("ReturnedRentals").as("returned_rentals_during_week"),
        col("net_change_in_outstanding"),
        col("OutstandingRentals").as("outstanding_rentals_at_week_end"))
      withClue(s"trial $trial (rows=${rows.size}, cuts=$cuts): ") {
        assertSameRows(got, expected)
      }
    }
  }

  test("summary and watermark advance as ONE atomic commit — a torn commit rolls back both") {
    // The reference commits summary + watermark in ONE Postgres
    // transaction (etl:272). The pre-r13 sink swapped two directories
    // independently, so a crash could land between them (summary
    // advanced, watermark behind) and this spec pinned the convergent
    // REPAIR. The watermark now rides the summary commit as the
    // SnapshotTable tag, so that torn state is structurally impossible
    // — there is no independent watermark left to rewind. Pin the
    // stronger invariant instead:
    //  (a) every committed version carries its run's watermark in the
    //      SAME manifest as its rows, so time travel yields consistent
    //      (summary, watermark) pairs at every version;
    //  (b) a commit torn mid-write (exactly what a crash leaves: a
    //      claimed, unterminated manifest + orphaned data files) is
    //      invisible — summary AND watermark both still read the
    //      pre-crash state, together — and a re-run converges.
    for (trial <- 1 to 3) {
      val rows = logGen.pureApply(Gen.Parameters.default, Seed(9000L + trial))
      val versions = rows.flatMap { case (id, rd, ret) =>
        val rdTs = new Timestamp(base + rd * day)
        val v1 = RentalVersion(id, rdTs, None, rdTs)
        ret match {
          case Some(delay) =>
            val retTs = new Timestamp(base + (rd + delay) * day)
            List(v1, RentalVersion(id, rdTs, Some(retTs),
              new Timestamp(math.max(rdTs.getTime, retTs.getTime))))
          case None => List(v1)
        }
      }
      val log = rentalDf(versions)
      val dir = Files.createTempDirectory("graft-crash").toString
      val t1 = new Timestamp(base + 70 * day)
      val t2 = new Timestamp(base + 250 * day)
      val now = ts("2030-01-01 00:00:00")

      IncrementalWeeklySummary.run(spark, sourceAsOf(log, t1), dir, now = now)
      val table = IncrementalWeeklySummary.summaryTable(spark, dir)
      val v1Version = table.currentVersion.get
      val wm1 = IncrementalWeeklySummary.watermark(spark, dir)
      val summary1 = collectSorted(IncrementalWeeklySummary.readSummary(spark, dir))

      // a t2 run crashed mid-commit: claimed manifest, body never
      // terminated (plus data-file orphans we don't bother planting —
      // they are invisible by construction and vacuum-reclaimable)
      Files.writeString(
        java.nio.file.Paths.get(dir, "weekly_rental_summary", "manifests",
          f"v${v1Version + 1}%019d.json"),
        s"#graft-snapshot 1\n#parent $v1Version\n#op merge\n#tag $t2\n")
      // (b) both facts still read the PRE-crash state — neither can be
      // ahead of the other, they are one manifest
      assert(IncrementalWeeklySummary.watermark(spark, dir) === wm1)
      assert(collectSorted(IncrementalWeeklySummary.readSummary(spark, dir)) == summary1)

      // recovery re-run over the same source claims past the torn
      // version and commits rows + watermark together
      val r = IncrementalWeeklySummary.run(spark, sourceAsOf(log, t2), dir, now = now)
      val wm2 = IncrementalWeeklySummary.watermark(spark, dir)
      assert(wm2 === r.newWatermark, "watermark must re-advance")

      // (a) time travel: the t1 version still carries the t1 watermark
      // and the t1 rows — one consistent fact set per version
      assert(table.tagAt(v1Version).contains(wm1.toString))
      assert(collectSorted(table.readVersion(v1Version)) == summary1)

      val finalSource = sourceAsOf(log, t2)
      val maxW = finalSource
        .agg(WeeklySummary.weekStart(to_date(max(
          greatest(col("rental_date"), coalesce(col("return_date"), col("rental_date")))))))
        .head().getDate(0)
      val expected = WeeklySummary.snapshot(finalSource, SparkEntry.AsOf)
        .filter(col("week_beginning") <= lit(maxW))
      val got = IncrementalWeeklySummary.readSummary(spark, dir).select(
        col("week_beginning"),
        col("newly_rented_during_week"),
        col("ReturnedRentals").as("returned_rentals_during_week"),
        col("net_change_in_outstanding"),
        col("OutstandingRentals").as("outstanding_rentals_at_week_end"))
      withClue(s"crash trial $trial: ") { assertSameRows(got, expected) }
    }
  }

  test("run log appends one auditable row per run with monotone watermarks") {
    // deterministic two-phase log: one rental before the t1 cut, one
    // between t1 and t2, so BOTH runs process a non-empty delta
    val log = rentalDf(Seq(
      RentalVersion(1, new Timestamp(base + 10 * day), None, new Timestamp(base + 10 * day)),
      RentalVersion(2, new Timestamp(base + 100 * day), None, new Timestamp(base + 100 * day))))
    val dir = Files.createTempDirectory("graft-runlog").toString
    val t1 = new Timestamp(base + 70 * day)
    val t2 = new Timestamp(base + 250 * day)
    val r1 = IncrementalWeeklySummary.run(spark, sourceAsOf(log, t1), dir,
      now = ts("2030-01-01 00:00:00"))
    RunLog.append(spark, dir, r1, ts("2030-01-01 00:00:00"))
    val r2 = IncrementalWeeklySummary.run(spark, sourceAsOf(log, t2), dir,
      now = ts("2030-01-02 00:00:00"))
    RunLog.append(spark, dir, r2, ts("2030-01-02 00:00:00"))

    val audit = RunLog.read(spark, dir)
      .orderBy(col("run_ts")).collect()
    assert(audit.length === 2)
    assert(audit(0).getAs[Timestamp]("new_watermark") ===
      audit(1).getAs[Timestamp]("previous_watermark"),
      "run N+1 must start where run N committed")
    assert(audit.forall(_.getAs[Boolean]("processed")))
  }

  test("catalog DDL registers state tables queryable by name (S4)") {
    val rows = logGen.pureApply(Gen.Parameters.default, Seed(77L))
    val versions = rows.map { case (id, rd, _) =>
      val rdTs = new Timestamp(base + rd * day)
      RentalVersion(id, rdTs, None, rdTs)
    }
    val dir = Files.createTempDirectory("graft-ddl").toString
    IncrementalWeeklySummary.run(spark, rentalDf(versions), dir,
      now = ts("2030-01-01 00:00:00"))
    RunLog.append(spark, dir,
      RunReport(Watermarks.DefaultStart, ts("2030-01-01 00:00:00"), 1, 1, processed = true),
      ts("2030-01-01 00:00:00"))
    try {
      CatalogDdl.registerStateTables(spark, dir)
      // registration is metadata-only and idempotent
      CatalogDdl.registerStateTables(spark, dir)
      val viaSql = spark.sql(
        "SELECT count(*) FROM weekly_rental_summary").head().getLong(0)
      assert(viaSql === IncrementalWeeklySummary.readSummary(spark, dir).count())
      assert(viaSql > 0)
      val wm = spark.sql(
        s"SELECT last_successful_update_timestamp FROM etl_watermarks " +
          s"WHERE process_name = '${IncrementalWeeklySummary.ProcessName}'")
      assert(wm.count() === 1)
      // the run log registers through the literal CREATE TABLE IF NOT
      // EXISTS … LOCATION DDL (plain parquet — no manifest to resolve)
      assert(spark.sql("SELECT count(*) FROM etl_run_log").head().getLong(0) === 1)
    } finally {
      spark.sql("DROP VIEW IF EXISTS weekly_rental_summary")
      spark.sql("DROP VIEW IF EXISTS etl_watermarks")
      spark.sql("DROP TABLE IF EXISTS etl_run_log")
    }
  }
}
