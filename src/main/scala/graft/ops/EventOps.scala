package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream operators over the `events` table: tumbling-window
  * rollups, gap-based sessionization, JSON property extraction, grouped
  * top-k, and cardinality (exact + sketch). Batch forms here; the
  * streaming counterparts live in [[graft.streaming]].
  *
  * Determinism notes for the DuckDB oracles: money-like doubles aggregate
  * through DECIMAL(18,2) (exact, order-independent) and surface as
  * doubles; averages are exact-sum / count rounded to 6dp; window orders
  * carry `event_id` as tiebreak.
  */
object EventOps {

  private val valueDec = col("value").cast("decimal(18,2)")

  /** Tumbling 1-hour rollup per event type: count, exact distinct users,
    * decimal-exact value sum/avg. Map-side partial aggregation + one
    * shuffle on (hour, type); the distinct-count expands to a two-phase
    * partial distinct under AQE. */
  def hourlyRollup(events: DataFrame): DataFrame =
    events
      .groupBy(
        date_trunc("hour", col("ts")).as("hour"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        sum(valueDec).cast("double").as("sum_value"),
        round(sum(valueDec).cast("double") / count(lit(1)), 6).as("avg_value"))

  /** Gap-based sessionization (30-min default): a session breaks where
    * the per-user gap exceeds `gapMinutes`. lag → boundary flag →
    * running sum = session id; one shuffle on user_id, two window passes
    * over the same partitioning (Catalyst collapses them into one sort).
    * The streaming analog is `groupByKey.flatMapGroupsWithState`. */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val prevTs = lag(col("ts"), 1).over(byUser)
    // exact microsecond gap math (cast-to-long would truncate to seconds
    // and disagree with the DuckDB oracle's epoch_us)
    val newSession = when(
      prevTs.isNull ||
      unix_micros(col("ts")) - unix_micros(prevTs) > gapMinutes * 60000000L, 1L).otherwise(0L)
    events
      .withColumn("session_seq",
        sum(newSession).over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        countDistinct(col("event_type")).as("n_event_types"),
        sum(valueDec).cast("double").as("sum_value"))
  }

  /** Trailing `windowDays`-day rolling totals per event type: daily
    * pre-aggregation, then a RANGE window frame over the day ordinal —
    * range (value-based) framing, not row counting, so calendar GAPS
    * stay out of the trailing window (a `rowsBetween` frame would
    * silently reach past them; asserted in the spec). The window
    * partitions by type after a day-grain pre-agg, so it sorts
    * |types × days| rows, never raw events. */
  def rollingDaily(events: DataFrame, windowDays: Int = 7): DataFrame = {
    require(windowDays >= 1, s"windowDays=$windowDays must be >= 1")
    val w = Window.partitionBy(col("event_type")).orderBy(col("day_ord"))
      .rangeBetween(-(windowDays - 1), Window.currentRow)
    events
      .groupBy(col("event_type"), date_trunc("day", col("ts")).cast("date").as("day"))
      .agg(count(lit(1)).as("n_events"), sum(valueDec).as("sum_dec"))
      .withColumn("day_ord", datediff(col("day"), to_date(lit("1970-01-01"))))
      .select(col("event_type"), col("day"), col("n_events"),
        col("sum_dec").cast("double").as("sum_value"),
        sum(col("n_events")).over(w).as("roll_events"),
        sum(col("sum_dec")).over(w).cast("double").as("roll_value"))
  }

  /** Re-aggregatable distinct-user counts via Apache DataSketches HLL:
    * per-(day, type) sketches built once, then UNIONED per type and
    * estimated — the precompute-then-merge pattern that makes distinct
    * counts composable at warehouse scale (any date range answers from
    * the daily sketches without rescanning raw events; `approx_
    * count_distinct`'s HLL++ partials merge too, but only inside one
    * query — these sketches are a persistable column). Estimation is
    * deterministic for a given input set, and union-of-parts ≡ one
    * direct sketch (asserted in the spec, with the error bound vs the
    * exact count). */
  def distinctUsersSketchMerge(events: DataFrame): DataFrame =
    events
      .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .groupBy(col("event_type"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("approx_users"))

  /** Error-envelope form of [[distinctUsersSketchMerge]] (see
    * [[approxDistinctUsersChecked]] for the pattern): emits the exact
    * cardinality, violations of the 10%/±2 envelope, and
    * `merge_mismatches` — union-of-daily-sketches vs one direct sketch
    * over the same rows. HLL union is register-wise max, so the two are
    * IDENTICAL by construction for equal lgK; a nonzero mismatch means
    * the mergeable-summaries contract itself broke. DuckDB asserts both
    * columns zero. */
  def distinctUsersSketchMergeChecked(events: DataFrame): DataFrame =
    distinctUsersSketchMerge(events)
      .join(events.groupBy(col("event_type"))
        .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("direct_users"),
          countDistinct(col("user_id")).as("n_users_exact")), Seq("event_type"))
      .select(col("event_type"), col("n_users_exact"),
        when(abs(col("approx_users") - col("n_users_exact")).cast("double") >
            greatest(col("n_users_exact").cast("double") * 0.1, lit(2.0)), 1L)
          .otherwise(0L).as("bound_violations"),
        when(col("approx_users") =!= col("direct_users"), 1L)
          .otherwise(0L).as("merge_mismatches"))

  /** Fixed-width value histogram per event type: bin = `floor(value /
    * width)`, one map-side-combined aggregation on (type, bin). The bin
    * arithmetic is pure IEEE double ops (divide, floor), so both engines
    * bin identically — no boundary drift. Output is |types × occupied
    * bins| rows regardless of input size: the distribution profile that
    * stays tiny at 100 TB. */
  def valueHistogram(events: DataFrame, width: Double = 50.0): DataFrame = {
    require(width > 0, s"width=$width must be > 0")
    events
      .groupBy(col("event_type"),
        floor(col("value") / width).cast("long").as("bin"))
      .agg(count(lit(1)).as("n_events"),
        sum(valueDec).cast("double").as("sum_value"))
      .withColumn("bin_lo", col("bin") * width)
  }

  /** Per-type z-score outliers: events whose value sits ≥ `z` standard
    * deviations from their type's mean. Mean and E[X²] accumulate as
    * DECIMAL sums (partial-aggregation-order-proof), variance =
    * E[X²] − mean² computed with the IDENTICAL double expression on
    * both engines so the rounded z-scores hash-match. The per-type
    * stats frame is groups-sized → broadcast join back; one scan, one
    * tiny shuffle. */
  def valueOutliers(events: DataFrame, z: Double = 3.0): DataFrame = {
    val stats = events.groupBy(col("event_type")).agg(
      (sum(valueDec).cast("double") / count(lit(1))).as("mean"),
      (sum((valueDec * valueDec).cast("decimal(28,4)")).cast("double") / count(lit(1)))
        .as("meansq"))
      .select(col("event_type"), col("mean"),
        sqrt(col("meansq") - col("mean") * col("mean")).as("std"))
    events
      .join(broadcast(stats), Seq("event_type"))
      // std = 0 (constant group) would make every z-score NaN, and BOTH
      // engines order NaN above every number — guard explicitly
      .filter(col("std") > 0)
      .select(col("event_id"), col("event_type"), col("value"),
        round((col("value") - col("mean")) / col("std"), 6).as("z_score"))
      .filter(abs(col("z_score")) >= z)
  }

  /** Pearson correlation between event value and hour-of-day per type,
    * from exact DECIMAL moment sums (n, Σv, Σh, Σv², Σh², Σvh). The five
    * sums are order-independent (decimal addition is exact), so Spark's
    * nondeterministic partial-aggregation order cannot move the result;
    * the closed-form corr then evaluates ONCE per group in double on
    * identical inputs in any engine — unlike the built-in streaming
    * `corr`, whose co-moment updates accumulate float error in a
    * partition-order-dependent way and drift vs other engines in the
    * last digits. One scan, one shuffle at type grain. */
  def valueHourCorr(events: DataFrame): DataFrame = {
    val v = col("value").cast("decimal(18,6)")
    val h = hour(col("ts")).cast("decimal(18,6)")
    def d(c: org.apache.spark.sql.Column) = c.cast("double")
    events.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(v).as("sv"), sum(h).as("sh"),
        sum((v * v).cast("decimal(38,12)")).as("svv"),
        sum((h * h).cast("decimal(38,12)")).as("shh"),
        sum((v * h).cast("decimal(38,12)")).as("svh"))
      .select(col("event_type"), col("n"),
        round(
          (d(col("n")) * d(col("svh")) - d(col("sv")) * d(col("sh"))) /
            sqrt((d(col("n")) * d(col("svv")) - d(col("sv")) * d(col("sv"))) *
              (d(col("n")) * d(col("shh")) - d(col("sh")) * d(col("sh")))),
          6).as("corr_value_hour"))
  }

  /** Frequent users per event type via the Misra–Gries mergeable sketch
    * ([[graft.functions.HeavyHitters]]): fixed k-sized state per (task,
    * type) crosses the shuffle — grouped frequent-items at any scale
    * without materializing the (type, user) long tail the exact
    * count-then-filter formulation shuffles. Sketch counters are
    * merge-order-dependent (rows-only driver check); the SURVIVAL and
    * ERROR-BOUND guarantees are order-free and pinned in
    * HeavyHittersSpec. */
  def heavyUsers(events: DataFrame, k: Int = 16): DataFrame = {
    val hh = udaf(graft.functions.HeavyHitters(k))
    events
      .groupBy(col("event_type"))
      .agg(hh(col("user_id")).as("sk"))
      .select(col("event_type"), posexplode(col("sk")).as(Seq("i", "e")))
      .select(col("event_type"), col("e._1").as("user_id"),
        col("e._2").as("est_count"), (col("i") + 1).cast("int").as("rank"))
  }

  /** Error-envelope form of [[heavyUsers]] (see
    * [[approxDistinctUsersChecked]] for the pattern): the sketch's
    * counter VALUES and its beyond-guarantee tail entries are
    * merge-order-dependent, but Misra–Gries' two guarantees are not —
    * every item with true frequency > n/(k+1) survives, and every
    * estimate ĉ sits in [c − n/(k+1), c]. Emitted per type: the exact
    * row count, the exact heavy-user count, `missed_survivors` (exact
    * heavy users absent from the sketch) and `bound_violations`
    * (reported entries outside the estimate envelope) — both
    * deterministically ZERO whenever the PODS'12 merge rule holds, so
    * DuckDB recomputes the exact side and asserts exactly that. */
  def heavyUsersChecked(events: DataFrame, k: Int = 16): DataFrame = {
    val sk = heavyUsers(events, k)
    val perUser = events.groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("n_u"))
    val totals = events.groupBy(col("event_type")).agg(count(lit(1)).as("n_events"))
    val bound = col("n_events").cast("double") / (k + 1)
    val entryViolations = sk
      .join(perUser, Seq("event_type", "user_id"))
      .join(broadcast(totals), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(sum(when(col("est_count") > col("n_u") ||
          (col("n_u") - col("est_count")).cast("double") > bound, 1L)
        .otherwise(0L)).as("bound_violations"))
    val survivors = perUser
      .join(broadcast(totals), Seq("event_type"))
      .filter(col("n_u").cast("double") > bound)
      .join(sk.select(col("event_type"), col("user_id"), lit(1).as("in_sk")),
        Seq("event_type", "user_id"), "left")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_heavy_exact"),
        sum(when(col("in_sk").isNull, 1L).otherwise(0L)).as("missed_survivors"))
    totals
      .join(entryViolations, Seq("event_type"), "left")
      .join(survivors, Seq("event_type"), "left")
      .select(col("event_type"), col("n_events"),
        coalesce(col("n_heavy_exact"), lit(0L)).as("n_heavy_exact"),
        coalesce(col("missed_survivors"), lit(0L)).as("missed_survivors"),
        coalesce(col("bound_violations"), lit(0L)).as("bound_violations"))
  }

  /** First-order journey transition matrix: counts of consecutive
    * (from_type → to_type) steps per user in time order, with row
    * transition probabilities — the Markov-chain summary of user flows.
    * One user-keyed window pass (the same partitioning sessionize and
    * userJourney shuffle on), then a type²-cardinality aggregate; the
    * probability divides by a type-partitioned window sum over LONGs
    * (exact), evaluated on the tiny aggregate, never the facts. */
  def typeTransitions(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val byFrom = Window.partitionBy(col("from_type"))
    events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("from_type", lag(col("event_type"), 1).over(byUser))
      .filter(col("from_type").isNotNull)
      .groupBy(col("from_type"), col("event_type").as("to_type"))
      .agg(count(lit(1)).as("n_steps"))
      .withColumn("p_transition",
        round(col("n_steps").cast("double") / sum(col("n_steps")).over(byFrom), 6))
      .orderBy(col("from_type"), col("to_type"))
  }

  /** Median absolute deviation per type — the robust scale estimate
    * (immune to the outliers a mean/stddev z-score is skewed by). Two
    * exact-percentile passes: the median, then the median of
    * |x − median|, with the 5-row median table broadcast between them.
    * Exact `percentile` sorts only within each type partition; the
    * sketch-based `approx_percentile` (see valuePercentilesApprox) is
    * the fixed-memory alternative when a single type's values exceed a
    * partition. */
  def valueMad(events: DataFrame): DataFrame = {
    val med = events.groupBy(col("event_type"))
      .agg(percentile(col("value"), lit(0.5)).as("median_value"))
    events.join(broadcast(med), Seq("event_type"))
      .select(col("event_type"), col("median_value"),
        abs(col("value") - col("median_value")).as("adev"))
      .groupBy(col("event_type"))
      .agg(first(col("median_value")).as("mv"),
        percentile(col("adev"), lit(0.5)).as("mad"))
      .select(col("event_type"), round(col("mv"), 6).as("median_value"),
        round(col("mad"), 6).as("mad"))
  }

  /** Cohort retention: users grouped by the week of their FIRST event
    * (the cohort), counted at every later week they were active, keyed
    * by week offset — the classic retention triangle.
    *
    * Plan: one distinct to (user, week) grain, then the cohort week as
    * a user-partitioned window min — NO self-join back to the events
    * table (the usual formulation) and nothing wider than (user, week)
    * ever shuffles. Two shuffles total, both partial-aggregated. */
  def retention(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
    events
      .select(col("user_id"), date_trunc("week", col("ts")).cast("date").as("week"))
      .distinct()
      .withColumn("cohort_week", min(col("week")).over(byUser))
      .select(col("cohort_week"),
        (datediff(col("week"), col("cohort_week")) / 7).cast("int").as("week_offset"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Sliding-window rollup: 1-hour windows every `slideMinutes` — the
    * overlapping-window shape (`window(ts, width, slide)` → one Expand
    * of width/slide rows per event, then ONE shuffle at window grain;
    * never a per-window rescan). */
  def slidingRollup(events: DataFrame, slideMinutes: Int = 15): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour", s"$slideMinutes minutes").as("w"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        sum(valueDec).cast("double").as("sum_value"))
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
        col("n_events"), col("n_users"), col("sum_value"))

  /** JSON property extraction + per-type stats of `props.k`
    * (`get_json_object` — codegen'd Jackson path eval, no UDF). */
  def jsonPropStats(events: DataFrame): DataFrame = {
    val k = get_json_object(col("props"), "$.k").cast("long")
    events
      .select(col("event_type"), k.as("k"))
      .groupBy(col("event_type"))
      .agg(
        count(col("k")).as("n_with_k"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"),
        round(sum(col("k")).cast("double") / count(col("k")), 6).as("avg_k"))
  }

  /** [[jsonPropStats]] over Spark 4's VARIANT type: `try_parse_json`
    * decodes each props string ONCE into the binary variant encoding,
    * then `variant_get` extracts fields without re-parsing — the
    * semi-structured path that amortizes parse cost when several fields
    * are read from the same document (get_json_object re-walks the text
    * per field). try_ variant: malformed rows become NULL and fall out
    * of count(col), instead of failing the job at row 10^12 of a 100 TB
    * ingest. Same aggregate, same oracle as `events_json`. */
  def jsonPropStatsVariant(events: DataFrame): DataFrame = {
    // try_ on BOTH steps: try_parse_json nulls malformed JSON, and
    // try_variant_get nulls a well-formed row whose k isn't castable to
    // long (plain variant_get would throw INVALID_VARIANT_CAST — the
    // exact fail-at-row-10^12 this path exists to avoid)
    val k = try_variant_get(try_parse_json(col("props")), "$.k", "long")
    events
      .select(col("event_type"), k.as("k"))
      .groupBy(col("event_type"))
      .agg(
        count(col("k")).as("n_with_k"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"),
        round(sum(col("k")).cast("double") / count(col("k")), 6).as("avg_k"))
  }

  /** Top-k rows per group by (value desc, event_id asc) — rank via
    * row_number window; the shuffle is one hash partition by type. */
  def topKPerType(events: DataFrame, kTop: Int = 3): DataFrame = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("value").desc, col("event_id"))
    events
      .select(col("event_type"), col("event_id"), col("user_id"), col("value"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= kTop)
  }

  /** Grouped top-k via the typed [[graft.functions.TopK]] Aggregator
    * (`functions.udaf`) instead of a `row_number` window: partial
    * aggregation keeps ≤ k rows per (task, type) ahead of the shuffle,
    * so no per-key sort of the full input ever happens — the grouped
    * top-k shape that still works when one event_type holds billions of
    * rows. Same output contract as [[topKPerType]] (shared oracle). */
  def topKPerTypeAgg(events: DataFrame, kTop: Int = 3): DataFrame = {
    val topk = udaf(graft.functions.TopK.eventsTopK(kTop))
    events
      // EventRow's fields are primitives, so a null id/value would throw
      // inside the typed encoder; nulls also can never rank in the top-k
      // under (value desc, event_id asc), so dropping them up front keeps
      // output parity with the window form whenever a group has ≥ k
      // non-null rows (the nullable-input contract both forms share).
      .filter(col("event_id").isNotNull && col("user_id").isNotNull
        && col("value").isNotNull)
      .groupBy(col("event_type"))
      .agg(topk(col("event_id"), col("user_id"), col("value")).as("top"))
      .select(col("event_type"), posexplode(col("top")).as(Seq("i", "e")))
      .select(col("event_type"), col("e.event_id").as("event_id"),
        col("e.user_id").as("user_id"), col("e.value").as("value"),
        (col("i") + 1).cast("int").as("rn"))
  }

  /** Multi-granularity rollup — native `rollup` (one Expand + one
    * shuffle): levels (type, day), (type), (); `grouping_id`
    * disambiguates the null-filled levels. */
  def multiRollup(events: DataFrame): DataFrame =
    events
      .withColumn("day", date_trunc("day", col("ts")).cast("date"))
      .rollup(col("event_type"), col("day"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(valueDec).cast("double").as("sum_value"),
        grouping_id().as("grouping_level"))

  /** Full-lattice cube over (type, day) — native `cube` (one Expand +
    * one shuffle): levels (type, day), (type), (day), (); `grouping_id`
    * disambiguates, including the (day)-only level `rollup` can't
    * express. */
  def cubeByTypeDay(events: DataFrame): DataFrame =
    events
      .withColumn("day", date_trunc("day", col("ts")).cast("date"))
      .cube(col("event_type"), col("day"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(valueDec).cast("double").as("sum_value"),
        grouping_id().as("grouping_level"))

  /** The distribution-rank window family per type: ties-aware `rank` /
    * `percent_rank` / `cume_dist` over value, plus `ntile` quartiles over
    * the fully-determined (value, event_id) order — ntile splits by
    * POSITION, so an under-determined sort would make bucket membership
    * engine-dependent at tie boundaries. One shuffle (both windows share
    * the partition key). */
  def valueRanks(events: DataFrame): DataFrame = {
    val byValue = Window.partitionBy(col("event_type")).orderBy(col("value"))
    val byValueId = Window.partitionBy(col("event_type"))
      .orderBy(col("value"), col("event_id"))
    events.select(col("event_type"), col("event_id"), col("value"))
      .withColumn("rnk", rank().over(byValue))
      .withColumn("pct_rank", round(percent_rank().over(byValue), 6))
      .withColumn("cume", round(cume_dist().over(byValue), 6))
      .withColumn("quartile", ntile(4).over(byValueId))
  }

  /** Per-type argmax/argmin — `max_by`/`min_by` with a composite
    * (value, event_id) ordering key so ties resolve deterministically.
    * One hash aggregation with map-side partials: the grouped-extreme
    * shape that needs no window and no sort at any scale. */
  def extremesByType(events: DataFrame): DataFrame =
    events.groupBy(col("event_type")).agg(
      max_by(col("event_id"), struct(col("value"), col("event_id"))).as("top_event_id"),
      max(col("value")).as("top_value"),
      min_by(col("event_id"), struct(col("value"), col("event_id"))).as("bottom_event_id"),
      min(col("value")).as("bottom_value"),
      count(lit(1)).as("n_events"))

  /** Daily counts pivoted to one column per event type. The pivot value
    * list is PINNED (not discovered): an unpinned `pivot` runs an extra
    * distinct-scan job to enumerate values and makes the output schema
    * data-dependent — both wrong at scale. Unseen types read as 0 via
    * the coalesce; one shuffle (day grain). */
  def pivotByType(events: DataFrame,
      types: Seq[String] = Seq("click", "error", "purchase", "signup", "view")): DataFrame = {
    val p = events
      .withColumn("day", date_trunc("day", col("ts")).cast("date"))
      .groupBy(col("day"))
      .pivot("event_type", types)
      .agg(count(lit(1)))
    p.select(col("day") +: types.map(t => coalesce(col(t), lit(0L)).as(s"n_$t")): _*)
  }

  /** The inverse reshape: long-form (day, event_type, n_events) from the
    * pivoted wide frame via native `unpivot` — one Expand, no shuffle,
    * no join. Zero-filled cells melt back to explicit zero rows (the
    * pivot⇄unpivot round trip is lossy only in that sense, asserted in
    * EventOpsSpec). */
  def unpivotDaily(events: DataFrame,
      types: Seq[String] = Seq("click", "error", "purchase", "signup", "view")): DataFrame =
    pivotByType(events, types)
      .unpivot(Array(col("day")), types.map(t => col(s"n_$t")).toArray,
        "event_type", "n_events")
      .withColumn("event_type", expr("substring(event_type, 3)"))

  /** Ordered conversion funnel: per stage, the users whose event history
    * contains the step subsequence IN ORDER (first view, then a click
    * after it, then a purchase after that). Each stage is a user-grain
    * min-aggregation joined to the previous stage's timestamps — all
    * shuffles share the user_id key, so the stages co-partition and AQE
    * reuses the exchange; no window over the full event history and no
    * per-user collect. Output: one row per stage with reached-user
    * counts. */
  def funnel(events: DataFrame,
      steps: Seq[String] = Seq("view", "click", "purchase")): DataFrame = {
    require(steps.nonEmpty)
    val e = events.select(col("user_id"), col("event_type"), col("ts"))
    var stage = e.filter(col("event_type") === steps.head)
      .groupBy(col("user_id")).agg(min(col("ts")).as("t"))
    var out = stage.agg(count(lit(1)).as("n_users"))
      .select(lit(1).as("stage"), lit(steps.head).as("step"), col("n_users"))
    steps.tail.zipWithIndex.foreach { case (step, i) =>
      stage = e.filter(col("event_type") === step)
        .join(stage.select(col("user_id"), col("t").as("prev_t")), Seq("user_id"))
        .filter(col("ts") > col("prev_t"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t"))
      out = out.union(stage.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 2).as("stage"), lit(step).as("step"), col("n_users")))
    }
    out
  }

  /** Exact distinct users per type — the oracle-checkable cardinality. */
  def distinctUsers(events: DataFrame): DataFrame =
    events.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_users"))

  /** Per-user ordered journey: lag/lead neighbors and step rank — the
    * navigation-window family over one keyed sort. */
  def userJourney(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events.select(col("user_id"), col("event_id"), col("event_type"), col("ts"))
      .withColumn("step", row_number().over(w))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
  }

  /** Exact linear-interpolated value percentiles per type (`percentile`
    * is the exact sort-based aggregate; the sketch-based
    * `approx_percentile` is the 100 TB path but isn't oracle-portable). */
  def valuePercentiles(events: DataFrame): DataFrame = {
    val p = percentile(col("value"), array(lit(0.5), lit(0.9), lit(0.99)))
    events.groupBy(col("event_type"))
      .agg(p.as("ps"))
      .select(
        col("event_type"),
        round(element_at(col("ps"), 1), 6).as("p50"),
        round(element_at(col("ps"), 2), 6).as("p90"),
        round(element_at(col("ps"), 3), 6).as("p99"))
  }

  /** Sketch-based percentiles — `approx_percentile` (Greenwald-Khanna
    * style mergeable quantile summary, fixed memory per group): the
    * 100 TB path [[valuePercentiles]]' exact sort-based aggregate cannot
    * take. Sketch internals aren't engine-portable (rows-only driver
    * check); EventOpsSpec bounds the rank error against the exact
    * percentiles instead. */
  def valuePercentilesApprox(events: DataFrame, accuracy: Int = 10000): DataFrame = {
    val p = percentile_approx(col("value"),
      array(lit(0.5), lit(0.9), lit(0.99)), lit(accuracy))
    events.groupBy(col("event_type"))
      .agg(p.as("ps"))
      .select(
        col("event_type"),
        round(element_at(col("ps"), 1), 6).as("p50"),
        round(element_at(col("ps"), 2), 6).as("p90"),
        round(element_at(col("ps"), 3), 6).as("p99"))
  }

  /** Error-envelope form of [[valuePercentilesApprox]] (see
    * [[approxDistinctUsersChecked]] for the pattern): the GK summary at
    * `accuracy` guarantees rank error ≤ 1/accuracy; the check brackets
    * each approximate quantile between the EXACT interpolated
    * percentiles at p ± 0.01 — two orders of magnitude looser than the
    * guarantee, but a real envelope (a sketch answering p50 with the
    * p55 value fails it). The exact percentiles are oracle-portable
    * (events_percentiles proves the cross-engine agreement), so DuckDB
    * recomputes them and asserts zero violations. */
  def valuePercentilesApproxChecked(events: DataFrame, accuracy: Int = 10000): DataFrame = {
    val slack = 0.01
    val qs = Seq(0.5, 0.9, 0.99)
    val lo = percentile(col("value"), array(qs.map(q => lit(q - slack)): _*))
    val hi = percentile(col("value"), array(qs.map(q => lit(q + slack)): _*))
    val ex = percentile(col("value"), array(qs.map(q => lit(q)): _*))
    valuePercentilesApprox(events, accuracy)
      .join(events.groupBy(col("event_type"))
        .agg(lo.as("lo"), hi.as("hi"), ex.as("ex")), Seq("event_type"))
      .select(col("event_type"),
        round(element_at(col("ex"), 1), 6).as("p50_exact"),
        round(element_at(col("ex"), 2), 6).as("p90_exact"),
        round(element_at(col("ex"), 3), 6).as("p99_exact"),
        (Seq(("p50", 1), ("p90", 2), ("p99", 3)).map { case (nm, i) =>
          when(col(nm) < element_at(col("lo"), i) ||
            col(nm) > element_at(col("hi"), i), 1L).otherwise(0L)
        }.reduce(_ + _)).as("bound_violations"))
  }

  /** Cross-user activity within "hot windows": the busy sessions of a
    * user cohort become intervals; EVERY event (any user) landing inside
    * a window is counted against it. A genuine unkeyed interval join —
    * runs through [[RangeJoin.pointInInterval]]'s bucketized equi-join,
    * not a nested loop, so both sides scale out. */
  def eventsInActiveWindows(events: DataFrame, maxUser: Long = 50,
      minEvents: Long = 3, bucketSeconds: Long = 3600L): DataFrame = {
    val windows = sessionize(events)
      .filter(col("user_id") < maxUser && col("n_events") >= minEvents)
      .select(col("user_id").as("window_user"), col("session_seq"),
        col("session_start"), col("session_end"))
    val pts = events.select(col("event_id"), col("ts"), col("user_id"), valueDec.as("v"))
    RangeJoin.pointInInterval(pts, windows, "ts", "session_start", "session_end",
        bucketSeconds)
      .groupBy(col("window_user"), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events_in_window"),
        countDistinct(col("user_id")).as("n_users_in_window"),
        sum(col("v")).cast("double").as("sum_value_in_window"))
  }

  /** [[eventsInActiveWindows]] with the interval join written as a
    * LITERAL `BETWEEN` SQL join — the shape every user writes first.
    * Stock Spark plans it as an O(points × intervals) nested loop; with
    * [[graft.GraftSession.install]] the [[graft.plans.BandJoinRewrite]]
    * optimizer rule re-plans it as the bucketized equi-join, unchanged
    * query text. Same result as the operator-API version (shared
    * oracle); BandJoinSpec asserts the no-nested-loop plan property. */
  def eventsInActiveWindowsSql(events: DataFrame, maxUser: Long = 50,
      minEvents: Long = 3): DataFrame = {
    val spark = events.sparkSession
    // The BandJoinRewrite rule must be active when this plan OPTIMIZES
    // (lazily, at action time) — install is idempotent, and entry-point
    // sessions (GraftSession.local, Bench, Verify) install it up front so
    // planning is invocation-order-independent across a shared session.
    graft.GraftSession.install(spark)
    // View names are scoped to this call and dropped before returning:
    // spark.sql analyzes eagerly (the view plan is inlined), so the
    // returned DataFrame doesn't need the catalog entries — and no fixed
    // names leak into the caller's session as a side effect.
    val tag = java.util.UUID.randomUUID().toString.replace("-", "")
    val wView = s"graft_hot_windows_$tag"
    val eView = s"graft_events_pts_$tag"
    sessionize(events)
      .filter(col("user_id") < maxUser && col("n_events") >= minEvents)
      .select(col("user_id").as("window_user"), col("session_seq"),
        col("session_start"), col("session_end"))
      .createOrReplaceTempView(wView)
    events.select(col("ts"), col("user_id"), col("value"))
      .createOrReplaceTempView(eView)
    try spark.sql(
      s"""SELECT w.window_user, w.session_seq,
         |  COUNT(*) AS n_events_in_window,
         |  COUNT(DISTINCT e.user_id) AS n_users_in_window,
         |  CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value_in_window
         |FROM $eView e JOIN $wView w
         |  ON e.ts BETWEEN w.session_start AND w.session_end
         |GROUP BY 1, 2""".stripMargin)
    finally {
      spark.catalog.dropTempView(wView)
      spark.catalog.dropTempView(eView)
    }
  }

  /** HyperLogLog++ sketch cardinality (rows-only check; EventOpsSpec
    * asserts relative error vs exact). At 100 TB this is the default:
    * fixed-size sketch state, no distinct shuffle explosion. */
  def approxDistinctUsers(events: DataFrame, rsd: Double = 0.02): DataFrame =
    events.groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id"), rsd).as("n_users_approx"))

  /** Error-envelope form of [[approxDistinctUsers]] — the ORACLE-GRADE
    * output for a sketch whose raw estimate is merge-order-dependent
    * and so can never hash-match a replay in another engine. The sketch
    * still runs (same plan, same HLL++ aggregate); what's EMITTED is
    * the deterministic contract around it: the exact cardinality and a
    * violation count against the documented error envelope
    * (|approx − exact| ≤ max(5·rsd·exact, 2) — 5 standard deviations of
    * the HLL++ rsd, with an absolute floor for tiny groups). DuckDB
    * computes the exact side and asserts zero violations, so a sketch
    * drifting out of its guarantee turns the round red — a STRONGER
    * check than the rows-only count this query used to get. */
  def approxDistinctUsersChecked(events: DataFrame, rsd: Double = 0.02): DataFrame =
    approxDistinctUsers(events, rsd)
      .join(events.groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_users_exact")), Seq("event_type"))
      .select(col("event_type"), col("n_users_exact"),
        when(abs(col("n_users_approx") - col("n_users_exact")).cast("double") >
            greatest(col("n_users_exact").cast("double") * (5 * rsd), lit(2.0)), 1L)
          .otherwise(0L).as("bound_violations"))

  /** Week-over-week drift of the event-type mix — each week's type
    * distribution PSI-scored against the PREVIOUS week's (same
    * smoothing contract as [[graft.ops.TextOps.splitDriftPsi]] and the
    * same classic bands: < 0.1 stable, > 0.25 investigate). This is the
    * batch ledger the streaming [[graft.streaming.DriftStream]] monitor
    * alarms against in real time: the monitor catches the bad batch,
    * this query shows WHEN the mix moved across history.
    *
    * Scale shape: ONE corpus scan to (week × type) counts — a
    * KB-bounded grain (weeks × |types|) collected to a literal so the
    * dense grid, totals, and the week-shifted self-join all derive from
    * it without re-scanning events (the multi-branch-reuse trap). */
  def weeklyDriftPsi(events: DataFrame, alpha: Double = 0.5): DataFrame = {
    require(alpha > 0, s"alpha=$alpha must be > 0 (unsmoothed PSI is infinite on empty bins)")
    val spark = events.sparkSession
    val cntLocal = events
      .select(date_trunc("week", col("ts")).cast("date").as("week"), col("event_type"))
      .groupBy(col("week"), col("event_type")).agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getDate(0), r.getString(1), r.getLong(2))).toSeq
    val cnt = spark.createDataFrame(cntLocal).toDF("week", "event_type", "c")
    val types = cnt.select(col("event_type")).distinct()
    val k = types.agg(count(lit(1)).as("k"))
    val weeks = cnt.groupBy(col("week")).agg(sum(col("c")).as("n"))
      .withColumn("rk", row_number().over(Window.orderBy(col("week"))))
    val grid = weeks.crossJoin(types)
      .join(cnt, Seq("week", "event_type"), "left_outer")
      .crossJoin(broadcast(k))
      .select(col("week"), col("rk"), col("n"), col("event_type"),
        ((coalesce(col("c"), lit(0L)) + lit(alpha))
          / (col("n") + lit(alpha) * col("k"))).as("p"))
    val prev = grid.select((col("rk") + 1).as("rk"), col("event_type"),
      col("p").as("p_prev"))
    grid.join(prev, Seq("rk", "event_type"))
      .select(col("week"), col("n"),
        ((col("p") - col("p_prev")) * log(col("p") / col("p_prev")))
          .cast("decimal(28,12)").as("term"))
      .groupBy(col("week"), col("n"))
      .agg(round(sum(col("term")).cast("double"), 6).as("psi"))
      .select(col("week"), col("psi"), col("n").as("n_events"))
  }
}
