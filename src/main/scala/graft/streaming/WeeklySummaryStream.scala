package graft.streaming

import java.sql.{Date, Timestamp}
import java.time.LocalDate

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Streaming-native maintenance of the weekly rental summary — the
  * Structured Streaming re-expression of the reference's hand-rolled
  * watermark protocol (SURVEY.md §2.9 mapping):
  *
  *   - the CDC log (`rental` row versions keyed by `last_update`,
  *     etl_script_incremental_pandas.py:120-124) becomes a file-source
  *     stream; checkpointed offsets replace the `etl_watermarks` table
  *     (etl:89-96) — a fresh checkpoint dir replays all history, exactly
  *     like the reference's empty-target reset (etl:68-85).
  *   - per-rental change tracking becomes `flatMapGroupsWithState`
  *     keyed by rental_id: the state holds the rental's last applied
  *     version; each newer version emits retraction/addition deltas of
  *     its week-grain contributions. Late or duplicate versions fold
  *     correctly because deltas are exact (old contribution subtracted,
  *     new added) — arbitrary lateness, as the reference requires
  *     (README.md:88-98 ⇒ effectively infinite watermark delay).
  *   - `foreachBatch` merges the summed deltas into a week-grain count
  *     state table (additive, idempotent per micro-batch commit) — the
  *     `ON CONFLICT DO UPDATE` upsert analog (etl:249-267).
  *   - `outstanding_rentals_at_week_end` stays a read-time cumulative
  *     window over the count state ([[summary]]), identical math to
  *     [[graft.ops.WeeklySummary.statsForWeeks]] — cumulative state is
  *     never stored, so per-week counts remain additively mergeable.
  */
object WeeklySummaryStream {

  final case class Version(
      rental_id: Long,
      rental_date: Timestamp,
      return_date: Option[Timestamp],
      last_update: Timestamp)

  /** Week-grain contribution deltas of one version transition. */
  final case class WeekDelta(week: Date, dRented: Long, dReturned: Long, dClosed: Long)

  val countsSchema: StructType = StructType(Seq(
    StructField("week_beginning", DateType, nullable = false),
    StructField("n_rented", LongType, nullable = false),
    StructField("n_returned", LongType, nullable = false),
    StructField("n_closed", LongType, nullable = false)))

  /** Monday of the UTC calendar date of `t` — explicit UTC so the result
    * is independent of the JVM default timezone (the session timezone is
    * pinned to UTC everywhere in this engine). */
  private def monday(t: Timestamp): LocalDate = {
    val d = java.time.Instant.ofEpochMilli(t.getTime)
      .atZone(java.time.ZoneOffset.UTC).toLocalDate
    d.minusDays(d.getDayOfWeek.getValue - 1L)
  }

  /** Week-grain contributions of one version: (+/-1)·sign at the rented /
    * returned / closed weeks — the same three counts the snapshot
    * aggregates (reference_query.sql:20-34 + the closed-week guard of
    * WeeklySummary.statsForWeeks). */
  private def contributions(v: Version, sign: Long): Seq[WeekDelta] = {
    val rentedWeek = monday(v.rental_date)
    val base = WeekDelta(Date.valueOf(rentedWeek), sign, 0, 0) +: v.return_date.toSeq.flatMap { ret =>
      val closedWeek = if (ret.after(v.rental_date)) monday(ret) else rentedWeek
      Seq(
        WeekDelta(Date.valueOf(monday(ret)), 0, sign, 0),
        WeekDelta(Date.valueOf(closedWeek), 0, 0, sign))
    }
    base
  }

  /** Newest-version-wins ordering, same tiebreak as the batch library's
    * source reconstruction (return-bearing version wins a timestamp tie). */
  private def newer(a: Version, b: Version): Boolean = {
    val c = a.last_update.compareTo(b.last_update)
    c > 0 || (c == 0 && a.return_date.isDefined && b.return_date.isEmpty)
  }

  /** Stateful diff: fold incoming versions of one rental against the last
    * applied version, emitting exact retraction/addition deltas. */
  def diffVersions(
      rentalId: Long,
      versions: Iterator[Version],
      state: GroupState[Version]): Iterator[WeekDelta] = {
    var current = state.getOption
    val out = Seq.newBuilder[WeekDelta]
    versions.toSeq.sortBy(v => (v.last_update.getTime, v.return_date.isDefined)).foreach { v =>
      if (current.forall(c => newer(v, c))) {
        current.foreach(c => out ++= contributions(c, -1))
        out ++= contributions(v, +1)
        current = Some(v)
      }
    }
    current.foreach(state.update)
    out.result().iterator
  }

  /** Start the maintenance stream over a growing parquet CDC log. */
  def start(
      spark: SparkSession,
      logDir: String,
      stateDir: String,
      checkpointDir: String,
      maxFilesPerTrigger: Int = 1): StreamingQuery = {
    import spark.implicits._
    val logSchema = StructType(Seq(
      StructField("rental_id", LongType, nullable = false),
      StructField("rental_date", TimestampType, nullable = false),
      StructField("return_date", TimestampType, nullable = true),
      StructField("last_update", TimestampType, nullable = false)))

    val versions = spark.readStream
      .schema(logSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(logDir)
      .as[Version]

    val deltas = versions
      .groupByKey(_.rental_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(diffVersions)

    deltas.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[WeekDelta], batchId: Long) =>
        mergeBatch(batch.sparkSession, batch.toDF(), stateDir, batchId)
      }
      .start()
  }

  /** Merge one micro-batch of deltas additively into the count state.
    *
    * foreachBatch is at-least-once on failure recovery: a replayed
    * batchId must not double-apply additive deltas — the
    * watermark-advanced-only-after-success rule (etl:274-284) in
    * streaming form. The state is a [[graft.incremental.SnapshotTable]]
    * whose commit carries the batch id as its TAG, so the applied-id
    * check and the counts it guards are ONE atomic manifest write. The
    * pre-r12 form kept a separate marker StateStore beside the counts
    * store — two independent swaps, and a crash BETWEEN them (counts
    * committed, marker not) made the recovery replay double-apply that
    * batch's deltas. A snapshot commit closes the window: either the
    * (counts, id) pair landed or neither did. Each batch retires
    * history past a small window and vacuums, so a long-running sink
    * doesn't leak manifests/files. */
  def mergeBatch(spark: SparkSession, batch: DataFrame, stateDir: String, batchId: Long = 0): Unit = {
    val tbl = new graft.incremental.SnapshotTable(
      spark, s"$stateDir/weekly_counts", "week_beginning")
    val applied = tbl.currentTag.flatMap(t => scala.util.Try(t.toLong).toOption)
    if (applied.exists(_ >= batchId)) return
    val agg = batch.groupBy(col("week").as("week_beginning"))
      .agg(
        sum(col("dRented")).cast("long").as("n_rented"),
        sum(col("dReturned")).cast("long").as("n_returned"),
        sum(col("dClosed")).cast("long").as("n_closed"))
    // COST GATE (the bloom-arm pattern): below SmallStateRows the whole
    // state is one small job — a full rewrite is cheaper than the merge
    // machinery's fixed per-commit cost (touched-file read, stats pass)
    // and measured so at week cardinality (drain 15.5 s rewrite vs
    // 20.6 s merge-always at sf0.1). Past it, the FILE-PRUNED merge arm
    // takes over: work ∝ the batch's touched weeks, never ∝ the state.
    // The row count is free — it rides the current manifest.
    val stateRows = if (tbl.exists) tbl.history.last._5 else 0L
    if (!tbl.exists || stateRows < SmallStateRows) {
      val existing =
        if (tbl.exists) tbl.read()
        else spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], countsSchema)
      val merged = existing.unionByName(agg)
        .groupBy("week_beginning")
        .agg(
          sum("n_rented").cast("long").as("n_rented"),
          sum("n_returned").cast("long").as("n_returned"),
          sum("n_closed").cast("long").as("n_closed"))
        .filter(col("n_rented") =!= 0 || col("n_returned") =!= 0 || col("n_closed") =!= 0)
      tbl.create(merged, tag = batchId.toString)
    } else {
      // the merge source is (existing rows for the touched weeks) +
      // (this batch's deltas), summed per week. The touched week set is
      // batch-bounded (collected to the driver as an isin() literal so
      // the parquet scan prunes files/row-groups by week stats); every
      // untouched week's file carries forward by manifest reference. A
      // week whose counts cancel to zero REMAINS as a zero row (MERGE
      // replaces, it cannot delete inside the same atomic commit — and
      // the batch-id tag must ride ONE commit); [[summary]] filters
      // zero rows read-side, so the spine bounds are unaffected.
      // the aggregated batch feeds TWO actions (the touched-week collect
      // and the merge source) — checkpoint the batch-sized frame once
      // instead of re-aggregating the micro-batch per action
      val aggStable = agg.localCheckpoint()
      val weeks = aggStable.select("week_beginning").collect().map(_.getDate(0))
      if (weeks.nonEmpty) {
        val touched = tbl.read()
          .filter(col("week_beginning").isin(weeks.map(w => lit(w)): _*))
        val src = touched.unionByName(aggStable)
          .groupBy("week_beginning")
          .agg(
            sum("n_rented").cast("long").as("n_rented"),
            sum("n_returned").cast("long").as("n_returned"),
            sum("n_closed").cast("long").as("n_closed"))
        tbl.merge(src, tag = batchId.toString)
      } else tbl.setTag(batchId.toString) // empty batch: mark applied atomically
    }
    tbl.retire(keepLast = 3)
    tbl.vacuum()
    // the merge arm accretes one batch-sized file set per micro-batch;
    // past 64 live files fold the small ones back into right-sized
    // clustered files (content-identical, batch-id tag carried — a
    // crash around the maintenance commit replays safely)
    if (tbl.history.last._4 > 64) tbl.optimize()
  }

  /** Below this, a micro-batch commit rewrites the whole counts state
    * (one trivial job); at or above it, the file-pruned merge arm
    * engages. See the cost-gate note in [[mergeBatch]]. A var only as
    * a test seam — the spec lowers it to pin the merge arm's result
    * equality without building a 100k-week state. */
  private[graft] var SmallStateRows: Long = 100000L

  /** Read-time summary over the maintained counts: contiguous week spine
    * from min to max active week, cumulative outstanding — the same
    * output shape as the batch snapshot over those weeks. */
  def summary(spark: SparkSession, stateDir: String): DataFrame = {
    val tbl = new graft.incremental.SnapshotTable(
      spark, s"$stateDir/weekly_counts", "week_beginning")
    val counts = (
      if (tbl.exists) tbl.read()
      else spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], countsSchema))
      // the merge sink leaves fully-retracted weeks as zero rows (MERGE
      // replaces, never deletes mid-commit); they carry no contribution
      // and must not stretch the spine bounds
      .filter(col("n_rented") =!= 0 || col("n_returned") =!= 0 || col("n_closed") =!= 0)
    val bounds = counts.agg(
      min(col("week_beginning")).as("lo"), max(col("week_beginning")).as("hi"))
    val spine = bounds
      .filter(col("lo").isNotNull)
      .select(explode(sequence(col("lo"), col("hi"), expr("INTERVAL 7 DAYS"))).as("week_beginning"))
    // Single-partition window is intentional: week-grain input — see the
    // matching note in WeeklySummary.statsFromCounts.
    val joined = spine.join(broadcast(counts), Seq("week_beginning"), "left")
    val cum = Window.orderBy("week_beginning")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val nRented = coalesce(col("n_rented"), lit(0L))
    val nReturned = coalesce(col("n_returned"), lit(0L))
    val nClosed = coalesce(col("n_closed"), lit(0L))
    joined.select(
      col("week_beginning"),
      nRented.as("newly_rented_during_week"),
      nReturned.as("returned_rentals_during_week"),
      (nRented - nReturned).as("net_change_in_outstanding"),
      (sum(nRented).over(cum) - sum(nClosed).over(cum))
        .as("outstanding_rentals_at_week_end"))
      .orderBy("week_beginning")
  }
}
