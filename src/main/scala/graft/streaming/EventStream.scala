package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One closed user session — append-mode output of
  * [[EventStream.sessionizeStateful]]. Top-level so the product encoder
  * needs no outer instance. */
case class UserSession(
    user_id: Long, session_start: Timestamp, session_end: Timestamp,
    n_events: Long, sum_value: Double)

/** Typed input row for [[EventStream.sessionizeStateful]]. */
case class SessionEvent(user_id: Long, ts: Timestamp, value: Double)

/** Open-session accumulator kept in [[GroupState]] (epoch millis — the
  * state store serializes primitives, not java.sql timestamps). */
case class OpenSession(startMs: Long, lastMs: Long, n: Long, sum: Double)

/** Update-mode output row of [[EventStream.frequentUsersStream]]. */
case class HeavyUser(event_type: String, user_id: Long, est_count: Long, rank: Int)

/** Streaming event rollups — the watermark + windowed-aggregation
  * surface over an unbounded `events` stream (the streaming twin of
  * [[graft.ops.EventOps.hourlyRollup]]).
  *
  * Semantics under append mode: a 1-hour tumbling window finalizes (and
  * emits exactly once) when the event-time watermark — max observed `ts`
  * minus `watermarkDelay` — passes the window's end; events arriving
  * later than the delay are dropped by the watermark instead of
  * reopening the window. That is the streaming contract the reference
  * approximates by hand with its `etl_watermarks` table and per-run
  * delta predicate (etl_script_incremental_pandas.py:89-96,120-124) —
  * except the reference chooses unbounded lateness, which maps to the
  * update-mode/infinite-delay variant maintained in
  * [[WeeklySummaryStream]]; this operator is the bounded-lateness,
  * finalize-once shape used for monitoring rollups.
  *
  * Scale notes: state is one row per open (window, event_type) group —
  * bounded by watermark horizon × type cardinality, independent of
  * event volume. `approx_count_distinct` keeps per-group user
  * cardinality as an HLL sketch (mergeable, fixed size) rather than an
  * exact distinct, which streaming aggregation cannot hold at 100 TB.
  */
object EventStream {

  /** Hourly per-type rollup of a streaming `events` frame
    * (`ts TIMESTAMP, event_type STRING, user_id LONG, value DOUBLE`).
    * Run with `outputMode("append")`: rows emit once, when final. */
  def hourlyRollup(events: DataFrame, watermarkDelay: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        approx_count_distinct(col("user_id")).as("n_users_approx"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(
        col("w.start").as("hour"),
        col("event_type"), col("n_events"), col("n_users_approx"), col("sum_value"))

  /** Stream-stream interval join: each purchase attributes to every view
    * by the same user within the preceding `horizon`. BOTH sides carry
    * watermarks and the join predicate bounds view_ts to a closed
    * interval around purchase_ts — exactly the conditions Spark needs to
    * age out buffered rows, so join state stays bounded by
    * (rate × (horizon + delay)) instead of growing with the stream.
    * Without the time bound this join would be unrunnable at scale. */
  def attribution(views: DataFrame, purchases: DataFrame,
      horizon: String = "1 HOUR", watermarkDelay: String = "30 minutes"): DataFrame = {
    val v = views.withWatermark("ts", watermarkDelay)
      .select(col("user_id").as("v_user"), col("ts").as("view_ts"),
        col("event_id").as("view_id"))
    val p = purchases.withWatermark("ts", watermarkDelay)
      .select(col("user_id"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"), col("value"))
    p.join(v,
      col("user_id") === col("v_user") &&
        col("view_ts") <= col("purchase_ts") &&
        col("view_ts") >= col("purchase_ts") - expr(s"INTERVAL $horizon"))
      .select(col("user_id"), col("purchase_id"), col("purchase_ts"),
        col("value"), col("view_id"), col("view_ts"))
  }

  /** Stream-static enrichment: a streaming fact joined to a batch
    * dimension. The static side needs NO watermark and holds NO join
    * state — Spark re-plans it per micro-batch (so a dimension refresh
    * is picked up on the next batch) and broadcasts it when small, the
    * standard dimension-lookup shape for an ingest pipeline. Left join:
    * facts without a dimension row pass through with nulls rather than
    * silently dropping. */
  def enrich(events: DataFrame, dim: DataFrame): DataFrame =
    events.join(broadcast(dim), Seq("user_id"), "left")

  /** Streaming POINT-IN-TIME enrichment: each incoming fact carries the
    * dimension version valid at its own event time (not the current
    * version — the temporal-correctness upgrade over [[enrich]]'s
    * latest-state join, and what a CDC consumer needs to avoid
    * "time-traveling" dimensions).
    *
    * Runs through `foreachBatch`: the as-of match is an order-dependent
    * join the streaming planner cannot express, but every micro-batch is
    * a bounded delta, so the BATCH machinery ([[graft.ops.Scd.pitEnrich]]
    * → the custom as-of physical operator) applies per batch — work
    * ∝ |batch| + |dim| per trigger, dimension refresh picked up next
    * batch, same contract as [[enrich]].
    *
    * @param versions [[graft.ops.Scd.scd2]] output (static/refreshable)
    * @param sink     receives each enriched micro-batch (write/upsert) */
  def enrichPitStream(
      facts: DataFrame,
      versions: () => DataFrame,
      key: String,
      factTs: String,
      dimCols: Seq[String])(
      sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    facts.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        sink(graft.ops.Scd.pitEnrich(batch, versions(), key, factTs, dimCols))
      }
      .start()

  /** Streaming exact dedup on a key, with state bounded by the
    * watermark: `dropDuplicatesWithinWatermark` keeps each seen key only
    * until the watermark passes its event time, so the dedup map is
    * (rate × delay)-sized — the streaming twin of
    * [[graft.ops.TextOps.dedupExact]]'s batch hash-groupBy, and the
    * at-least-once → exactly-once repair stage of an ingest pipeline. */
  def dedupStream(events: DataFrame, watermarkDelay: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("event_id")

  /** Gap-based sessionization as ARBITRARY KEYED STATE
    * (`flatMapGroupsWithState`, the KeyValueGroupedDataset custom-state
    * surface): one [[OpenSession]] per user in the state store; events
    * within `gapMinutes` of the last seen extend it, a larger gap closes
    * and emits it, and an EVENT-TIME TIMEOUT (watermark passing
    * last + gap) closes idle sessions exactly once with no poll loop.
    * Append output: a session row emits only when the session is closed —
    * the streaming twin of [[graft.ops.EventOps.sessionize]]'s window
    * formulation, with state per OPEN session only (bounded by active
    * users, not event volume). */
  /** Streaming Misra–Gries frequent users per event type — the batch
    * [[graft.ops.EventOps.heavyUsers]] sketch carried as
    * `flatMapGroupsWithState` state: one ≤ k-entry counter map per
    * type, folded forward each micro-batch with the SAME
    * [[graft.functions.HeavyHitters]] reduce step, the full current
    * sketch re-emitted in Update mode. State is bounded by
    * construction (k entries/type, independent of stream length or
    * user cardinality), so no watermark/timeout is needed — the sketch
    * IS the eviction policy. The MG guarantees (freq > n/(k+1) always
    * tracked; estimates under-count by ≤ n/(k+1), n = rows seen so
    * far) hold at every emission point regardless of batch split. */
  def frequentUsersStream(events: DataFrame, k: Int = 16): Dataset[HeavyUser] = {
    import events.sparkSession.implicits._
    val hh = new graft.functions.HeavyHitters(k)
    events.selectExpr("event_type", "user_id").as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Map[Long, Long], HeavyUser](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (typ: String, it: Iterator[(String, Long)], state: GroupState[Map[Long, Long]]) =>
          val updated = it.foldLeft(state.getOption.getOrElse(Map.empty[Long, Long])) {
            (buf, e) => hh.reduce(buf, e._2)
          }
          state.update(updated)
          hh.finish(updated).iterator.zipWithIndex.map { case ((u, c), i) =>
            HeavyUser(typ, u, c, i + 1)
          }
      }
  }

  def sessionizeStateful(events: Dataset[SessionEvent], gapMinutes: Int = 30,
      watermarkDelay: String = "30 minutes"): Dataset[UserSession] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60000L
    def close(user: Long, s: OpenSession): UserSession =
      UserSession(user, new Timestamp(s.startMs), new Timestamp(s.lastMs), s.n, s.sum)
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, UserSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, it: Iterator[SessionEvent], state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            val closed = close(user, state.get)
            state.remove()
            Iterator.single(closed)
          } else {
            // batch events arrive unordered: sort, then fold gap-splits
            val sorted = it.toSeq.sortBy(_.ts.getTime)
            var open = state.getOption
            val closed = Seq.newBuilder[UserSession]
            sorted.foreach { e =>
              val t = e.ts.getTime
              open match {
                case Some(s) if t - s.lastMs <= gapMs =>
                  open = Some(OpenSession(s.startMs, math.max(s.lastMs, t), s.n + 1, s.sum + e.value))
                case Some(s) =>
                  closed += close(user, s)
                  open = Some(OpenSession(t, t, 1L, e.value))
                case None =>
                  open = Some(OpenSession(t, t, 1L, e.value))
              }
            }
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastMs + gapMs)
            }
            closed.result().iterator
          }
      }
  }
}
