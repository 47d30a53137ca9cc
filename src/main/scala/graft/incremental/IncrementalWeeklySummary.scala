package graft.incremental

import java.sql.{Date, Timestamp}
import java.time.LocalDate

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.WeeklySummary

/** How far the per-run recompute reaches.
  *
  * - [[ConsistencyMode.Faithful]] reproduces the reference exactly: only
  *   the weeks of a delta row's `rental_date`/`return_date` plus the
  *   end-of-table backfill gap are recomputed
  *   (etl_script_incremental_pandas.py:131-200). Backdated inserts or
  *   return-date edits therefore leave `OutstandingRentals` stale in
  *   *later*, untouched weeks — the reference inherits this from its
  *   design (README.md:118-130 documents the adjacent holes); it is
  *   invisible when `last_update` tracks activity time, the intended
  *   CDC usage.
  * - [[ConsistencyMode.Strict]] widens the recompute to the contiguous
  *   range [min(affected week), max activity week]. A delta row can only
  *   change counts at weeks ≥ min(week(rental_date), week(return_date)),
  *   so this closes the staleness hole at the cost of recomputing more
  *   weeks per run.
  */
sealed trait ConsistencyMode
object ConsistencyMode {
  case object Faithful extends ConsistencyMode
  case object Strict extends ConsistencyMode
}

/** What a run did — mirrors the reference's step-by-step log output. */
final case class RunReport(
    previousWatermark: Timestamp,
    newWatermark: Timestamp,
    deltaRows: Long,
    affectedWeeks: Long,
    processed: Boolean)

/** The reference's incremental watermark-driven pipeline
  * (etl_script_incremental_pandas.py:24-298), re-expressed as Spark jobs
  * over parquet state:
  *
  *  1. empty-target ⇒ watermark reset to 1900-01-01 (etl:68-85)
  *  2. read watermark; probe `MAX(last_update)` (etl:89-113)
  *  3. delta extract `last_update ∈ (wm, max]` (etl:116-128) — on a real
  *     JDBC/CDC source this predicate pushes down to the scan; on parquet
  *     it prunes row groups via min/max stats
  *  4. affected weeks = weeks of delta rental/return dates ∪ end-gap
  *     backfill weeks (etl:131-200)
  *  5. recompute affected weeks — the reference loops one SQL round-trip
  *     per week (etl:218-243); we run ONE plan:
  *     [[WeeklySummary.statsForWeeks]] over the sparse affected set
  *     (SURVEY.md G2 elimination)
  *  6. keyed upsert into the summary (etl:249-267) = [[SnapshotTable.merge]]:
  *     file-pruned copy-on-write, so only the files whose week range the
  *     affected set touches are rewritten — at 100 TB a weekly delta
  *     rewrites a sliver of the table, never the table
  *  7. watermark advance (etl:274-284) — the watermark RIDES the summary
  *     commit as the snapshot table's application tag, so summary and
  *     watermark are ONE atomic manifest write, exactly the reference's
  *     single-transaction commit (etl:272). The pre-r13 sink swapped two
  *     directories (summary, watermark) independently; a crash between
  *     the swaps left a torn state that re-runs had to repair
  *     convergently. With the tag riding the commit, that state is
  *     structurally impossible: either both advanced or neither did. A
  *     run that changes no rows advances the watermark with a tag-only
  *     commit ([[SnapshotTable.setTag]] — manifest write, no data). The
  *     watermark is MONOTONE: a source whose MAX(last_update) moved
  *     backwards (source-side deletes) never lowers it — see the
  *     `newWatermark` clamp in [[run]].
  *
  * Deliberate divergence: the reference's per-week recompute compares raw
  * timestamps against week-end *midnight* (etl:226,230,234-235), while its
  * own snapshot query buckets by `DATE_TRUNC('week', …)` — the two
  * disagree for intra-day timestamps on the last week day. We use the
  * snapshot's date-truncation semantics in both paths so the incremental
  * state provably converges to the snapshot (the reference's own stated
  * oracle, README.md:67-74).
  */
object IncrementalWeeklySummary {

  val ProcessName = "pagila_weekly_rental_summary" // etl:9

  /** Reference summary schema (etl:43-52), counts widened to LONG. */
  val summarySchema: StructType = StructType(Seq(
    StructField("week_beginning", DateType, nullable = false),
    StructField("OutstandingRentals", LongType, nullable = true),
    StructField("ReturnedRentals", LongType, nullable = true),
    StructField("newly_rented_during_week", LongType, nullable = true),
    StructField("net_change_in_outstanding", LongType, nullable = true),
    StructField("last_updated", TimestampType, nullable = true)))

  /** The summary's storage of record: a manifest-based ACID table keyed
    * on the week, whose commit tag carries the process watermark. */
  def summaryTable(spark: SparkSession, stateDir: String): SnapshotTable =
    new SnapshotTable(spark, s"$stateDir/weekly_rental_summary", "week_beginning")

  /** Watermark ↔ tag encoding: `Timestamp.toString`/`valueOf` round-trip
    * exactly (the session is pinned to UTC, so the wall-clock string is
    * unambiguous). */
  private def tagOf(ts: Timestamp): String = ts.toString

  /** The process watermark — the summary table's current commit tag
    * ([[Watermarks.DefaultStart]] when the table was never committed).
    * There is no separate watermark store to disagree with the summary:
    * both come from one manifest. */
  def watermark(spark: SparkSession, stateDir: String): Timestamp = {
    val t = summaryTable(spark, stateDir)
    if (t.exists) t.currentTag.map(Timestamp.valueOf).getOrElse(Watermarks.DefaultStart)
    else Watermarks.DefaultStart
  }

  /** The reference's one-row `etl_watermarks` view of the watermark
    * (etl:58-66), derived from the summary commit tag — for the catalog
    * surface and the JDBC rollup sync. */
  def watermarkFrame(spark: SparkSession, stateDir: String): DataFrame = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      Seq(Row(ProcessName, watermark(spark, stateDir))).asJava, Watermarks.schema)
  }

  /** One incremental run. `now` parameterizes the reference's
    * `CURRENT_TIMESTAMP` audit column for deterministic tests (SURVEY.md F9).
    */
  def run(
      spark: SparkSession,
      rental0: DataFrame,
      stateDir: String,
      mode: ConsistencyMode = ConsistencyMode.Faithful,
      now: Timestamp = new Timestamp(System.currentTimeMillis())): RunReport = {

    // Timestamp normalization (etl:103-108): sources may carry
    // TIMESTAMP_NTZ (e.g. the harness parquet) or tz-aware timestamps;
    // with the session pinned to UTC this cast is the wall-clock identity
    // and makes driver-side scalar extraction (`getTimestamp`) uniform.
    val rental = Seq("rental_date", "return_date", "last_update")
      .foldLeft(rental0)((df, c) => df.withColumn(c, col(c).cast(TimestampType)))

    val table = summaryTable(spark, stateDir)
    // pin the base version: the merge below is compare-and-swap against
    // it, so a concurrent run fails loudly instead of losing an update
    val baseVersion = table.currentVersion
    val summary = readSummary(spark, stateDir)
    val targetEmpty = summary.limit(1).isEmpty

    // -- step 0/1: window bounds (etl:89-113). Empty target ⇒ watermark
    // resets to DefaultStart (etl:68-85) — with the watermark riding the
    // summary commit, the reset is a READ rule, not a write: an empty
    // summary cannot carry a meaningful watermark.
    val previousWatermark =
      if (targetEmpty) Watermarks.DefaultStart
      else watermark(spark, stateDir)
    val maxSource: Option[Timestamp] =
      Option(rental.agg(max(col("last_update"))).head().getTimestamp(0))
    val currentMax = maxSource.getOrElse(previousWatermark) // etl:109-111
    // Monotone watermark (deliberate divergence, documented): the
    // reference sets watermark = MAX(last_update) unconditionally, so a
    // source whose max moves BACKWARDS (rows deleted at the source —
    // the reference's own documented hole, README.md:118-130) would
    // LOWER the watermark and re-open already-processed deltas on every
    // subsequent run. A lower watermark can never reveal new rows (the
    // delta window is (wm, max], empty when max ≤ wm), so clamping to
    // the previous watermark changes no processed data — it only stops
    // the re-opening. The guard is the one-liner the r13 verdict asked
    // to make explicit.
    //
    // RESIDUAL MISS WINDOW (real divergence, not a pure no-op): after a
    // source-max REGRESSION (erasure dropped the T10 rows, max now T8),
    // a late row arriving with last_update T9 sits below the clamped
    // watermark (T10) and is never picked up — whereas the reference's
    // unclamped watermark would re-open the window and process it, at
    // the cost of re-processing everything on every run meanwhile. If
    // erasure-driven regressions are expected AND sources backfill
    // below them, compare deltas by content (or reset the watermark
    // alongside the erasure); the clamp assumes last_update is
    // assigned monotonically by the source, as the reference does.
    val newWatermark =
      if (currentMax.after(previousWatermark)) currentMax else previousWatermark

    // -- step 2: delta extract (etl:116-128)
    val delta =
      if (currentMax.after(previousWatermark))
        rental.filter(
          col("last_update") > lit(previousWatermark) &&
          col("last_update") <= lit(currentMax))
      else rental.limit(0)

    // -- step 3a: weeks touched by the delta (etl:131-146)
    val wk = WeeklySummary.weekStart _
    val changedWeeks = delta
      .select(wk(to_date(col("rental_date"))).as("week_beginning"))
      .filter(col("week_beginning").isNotNull)
      .union(delta
        .filter(col("return_date").isNotNull)
        .select(wk(to_date(col("return_date"))).as("week_beginning")))
      .distinct()

    // -- step 3b: end-gap backfill weeks (etl:148-194)
    val activity = greatest(col("rental_date"), coalesce(col("return_date"), col("rental_date")))
    val maxActivityWeek: Option[Date] =
      Option(rental.agg(wk(to_date(max(activity)))).head().getDate(0))
    val maxTargetWeek: Option[Date] =
      Option(summary.agg(max(col("week_beginning"))).head().getDate(0))

    val backfillStart: Option[Date] = maxActivityWeek.flatMap { maxW =>
      maxTargetWeek match {
        case None =>
          Option(rental
            .filter(col("rental_date").isNotNull)
            .agg(wk(to_date(min(activity)))).head().getDate(0))
        case Some(t) if t.toLocalDate.isBefore(maxW.toLocalDate) =>
          Some(Date.valueOf(t.toLocalDate.plusWeeks(1)))
        case _ => None
      }
    }
    val backfillWeeks: DataFrame = (backfillStart, maxActivityWeek) match {
      case (Some(s), Some(e)) => weekRange(spark, s, e)
      case _ => changedWeeks.limit(0)
    }

    // -- step 3c: combine (etl:196-200)
    val affectedNarrow = changedWeeks.union(backfillWeeks).distinct().cache()
    val nAffected = affectedNarrow.count()

    if (nAffected == 0) {
      // etl:202-213 — bump watermark, nothing to process: a tag-only
      // commit on the summary table (no data files). An empty source
      // over a never-committed table has nothing to record — stay
      // write-free (the watermark read rule already yields DefaultStart).
      if (table.exists) {
        if (!table.currentTag.contains(tagOf(newWatermark))) table.setTag(tagOf(newWatermark))
      } else if (newWatermark.after(Watermarks.DefaultStart)) {
        table.create(spark.createDataFrame(
          spark.sparkContext.emptyRDD[Row], summarySchema), tagOf(newWatermark))
      }
      affectedNarrow.unpersist()
      return RunReport(previousWatermark, newWatermark, delta.count(), 0, processed = false)
    }

    val affected = mode match {
      case ConsistencyMode.Faithful => affectedNarrow
      case ConsistencyMode.Strict =>
        val minAffected = affectedNarrow.agg(min(col("week_beginning"))).head().getDate(0)
        weekRange(spark, minAffected, maxActivityWeek.getOrElse(minAffected))
    }

    // -- step 4: recompute all affected weeks in one plan (etl:216-244)
    val recomputed = WeeklySummary.statsForWeeks(rental, affected)
      .select(
        col("week_beginning"),
        col("outstanding_rentals_at_week_end").as("OutstandingRentals"),
        col("returned_rentals_during_week").as("ReturnedRentals"),
        col("newly_rented_during_week"),
        col("net_change_in_outstanding"),
        lit(now).as("last_updated"))

    // -- upsert + watermark advance as ONE atomic commit (etl:249-284;
    // the reference's single transaction, etl:272). merge is file-pruned
    // copy-on-write: weeks outside the affected range carry forward by
    // reference ([[SnapshotTable]]); statsForWeeks returns exactly one
    // row per affected week (it semi-joins back to the spine), so the
    // keyed merge is result-identical to anti-join-then-union.
    if (targetEmpty) table.create(recomputed, tagOf(newWatermark))
    else table.merge(recomputed, expectedVersion = baseVersion, tag = tagOf(newWatermark))

    val report = RunReport(previousWatermark, newWatermark, delta.count(), nAffected, processed = true)
    affectedNarrow.unpersist()
    report
  }

  /** Contiguous Monday-week spine [start, end], both inclusive Mondays —
    * the reference's while-loop week enumeration (etl:187-191) as a
    * `sequence`/`explode` generator. */
  def weekRange(spark: SparkSession, start: Date, end: Date): DataFrame =
    spark.range(1).select(
      explode(sequence(
        lit(start), lit(end), expr("INTERVAL 7 DAYS"))).as("week_beginning"))

  /** Current materialized summary (empty frame when never run). */
  def readSummary(spark: SparkSession, stateDir: String): DataFrame = {
    val t = summaryTable(spark, stateDir)
    if (t.exists) t.read()
    else spark.createDataFrame(spark.sparkContext.emptyRDD[Row], summarySchema)
  }
}
