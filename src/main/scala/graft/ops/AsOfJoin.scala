package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.plans.AsOfJoinNode

/** As-of join: for each left row, the single latest right row of the same
  * key with `rightTs <= leftTs` — the standard CDC/market-data lookup
  * Spark has no native operator for.
  *
  * Composed from built-ins (SURVEY.md §2 custom-operator preference (a)):
  * tag and union both sides, one per-key window sorted by (ts, side) with
  * `last(col, ignoreNulls)` carrying the most recent right-side values
  * forward, then keep left rows. ONE shuffle on the key and ONE sort —
  * same cost shape as a sort-merge join, no range explosion, no
  * correlated subquery. Right rows at exactly `leftTs` match (ties
  * between sides at equal ts resolve right-before-left via the side
  * marker's sort position).
  *
  * At scale both sides shuffle-partition by `key`; skewed keys take the
  * same mitigations as any keyed window ([[Skew]], AQE).
  */
object AsOfJoin {

  /** @param rightCols right-side value columns carried onto left rows
    *                   (null when no right row is ≤ the left timestamp)
    * @param direction `"backward"` (default): latest right row with
    *                  `rightTs <= leftTs`; `"forward"`: EARLIEST right
    *                  row with `rightTs >= leftTs` — the same one-
    *                  shuffle union plan traversed in reverse ts order,
    *                  not a second algorithm */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      rightCols: Seq[String],
      direction: String = "backward"): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    val leftTagged = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .select(Seq(col(key), col("__ts"), col("__side")) ++
        left.columns.filterNot(_ == key).map(c => col(c).as(s"l_$c")) ++
        rightCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"r_$c")): _*)
    val rightTagged = right
      .withColumn("__ts", col(rightTs))
      .withColumn("__side", lit(0))
      .select(Seq(col(key), col("__ts"), col("__side")) ++
        left.columns.filterNot(_ == key).map(c =>
          lit(null).cast(left.schema(c).dataType).as(s"l_$c")) ++
        rightCols.map(c => col(c).as(s"r_$c")): _*)

    // right (__side=0) sorts before left (__side=1) at equal __ts ⇒
    // a right row at exactly leftTs is visible to that left row; the
    // forward direction walks ts DESCENDING so "last right seen" is the
    // earliest right row at-or-after the left timestamp
    val tsOrder = if (direction == "backward") col("__ts").asc else col("__ts").desc
    val w = Window.partitionBy(col(key)).orderBy(tsOrder, col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightCols.foldLeft(leftTagged.unionByName(rightTagged)) {
      (df, c) => df.withColumn(s"r_$c", last(col(s"r_$c"), ignoreNulls = true).over(w))
    }
    carried
      .filter(col("__side") === 1)
      .select(Seq(col(key)) ++
        left.columns.filterNot(_ == key).map(c => col(s"l_$c").as(c)) ++
        rightCols.map(c => col(s"r_$c").as(s"asof_$c")): _*)
  }

  /** Nearest-neighbor as-of: for each left row, the right row of the
    * same key minimizing |rightTs − leftTs|, ties to the BACKWARD match
    * (the convention pandas `merge_asof(direction="nearest")` uses).
    * Completes the direction family: backward / forward / nearest.
    *
    * One tagged union, ONE shuffle on the key, two window sorts over
    * the same partitioning (ascending pass carries the latest at-or-
    * before right row, a current-row..following frame carries the
    * earliest at-or-after one — equal-ts rights are visible to BOTH,
    * exactly like the `<=`/`>=` pair of directional joins), then a
    * row-local distance pick. No second shuffle, no join of two as-of
    * results. */
  def asOfNearest(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      rightCols: Seq[String]): DataFrame = {
    val leftTagged = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .select(Seq(col(key), col("__ts"), col("__side")) ++
        left.columns.filterNot(_ == key).map(c => col(c).as(s"l_$c")) ++
        rightCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"r_$c")) :+
        lit(null).cast(right.schema(rightTs).dataType).as("__rts"): _*)
    val rightTagged = right
      .withColumn("__ts", col(rightTs))
      .withColumn("__side", lit(0))
      .select(Seq(col(key), col("__ts"), col("__side")) ++
        left.columns.filterNot(_ == key).map(c =>
          lit(null).cast(left.schema(c).dataType).as(s"l_$c")) ++
        rightCols.map(c => col(c).as(s"r_$c")) :+
        col(rightTs).as("__rts"): _*)
    val unioned = leftTagged.unionByName(rightTagged)
    // backward: right (__side 0) sorts before left at equal ts — an
    // equal-ts right is inside the preceding frame (<= semantics)
    val wb = Window.partitionBy(col(key)).orderBy(col("__ts").asc, col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // forward: left sorts before right at equal ts (negated marker) —
    // an equal-ts right is inside the following frame (>= semantics)
    val wf = Window.partitionBy(col(key)).orderBy(col("__ts").asc, (-col("__side")).asc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val carried = (rightCols :+ "__rts_x").foldLeft(
      unioned.withColumn("r___rts_x", col("__rts"))) { (df, c) =>
      df.withColumn(s"b_$c", last(col(s"r_$c"), ignoreNulls = true).over(wb))
        .withColumn(s"f_$c", first(col(s"r_$c"), ignoreNulls = true).over(wf))
    }
    // tie |Δback| == |Δfwd| → backward; a one-sided match wins outright
    val useBack = col("f___rts_x").isNull || (col("b___rts_x").isNotNull &&
      (unix_micros(col("__ts")) - unix_micros(col("b___rts_x"))) <=
        (unix_micros(col("f___rts_x")) - unix_micros(col("__ts"))))
    carried
      .filter(col("__side") === 1)
      .select(Seq(col(key)) ++
        left.columns.filterNot(_ == key).map(c => col(s"l_$c").as(c)) ++
        rightCols.map(c =>
          when(useBack, col(s"b_$c")).otherwise(col(s"f_$c")).as(s"asof_$c")): _*)
  }

  /** [[asOf]] planned through the custom physical operator
    * ([[graft.plans.AsOfJoinExec]] via [[graft.plans.AsOfJoinStrategy]])
    * instead of the union+window composition — same matching semantics
    * (asserted row-for-row in PhysicalAsOfJoinSpec and by sharing
    * `events_asof`'s oracle), but each side sorts in its own narrow
    * schema and a streaming merge replaces the window. Requires the
    * strategy installed ([[graft.GraftSession.install]]).
    *
    * Output column order differs from [[asOf]] (left columns first,
    * then `asof_*`); names and values agree. */
  def asOfExec(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      rightCols: Seq[String],
      direction: String = "backward"): DataFrame = {
    require(AsOfJoinNode.Directions(direction),
      s"direction must be one of ${AsOfJoinNode.Directions}, got $direction")
    graft.GraftSession.install(left.sparkSession) // idempotent
    // re-alias every right column: fresh exprIds, so a self-join (left
    // and right carved from the same source) cannot collide attributes
    val r2 = right.select(right.columns.toIndexedSeq.map(c => col(c).as(c)): _*)
    val lPlan = left.queryExecution.analyzed
    val rPlan = r2.queryExecution.analyzed
    // resolution honors spark.sql.caseSensitive like every DataFrame API
    // (the window composition resolves through the analyzer and gets
    // this for free); ambiguity is an error, not a silent first match
    val caseSensitive =
      left.sparkSession.conf.get("spark.sql.caseSensitive", "false").toBoolean
    def attr(p: LogicalPlan, n: String, side: String) =
      p.output.filter(a =>
        if (caseSensitive) a.name == n else a.name.equalsIgnoreCase(n)) match {
        case Seq(one) => one
        case Seq() => sys.error(s"asOfExec: no column '$n' on the $side side")
        case many => sys.error(
          s"asOfExec: ambiguous column '$n' on the $side side: ${many.map(_.name)}")
      }
    // float/double keys must hash and compare like SQL equality (-0.0 ==
    // 0.0, one NaN): the optimizer's NormalizeFloatingNumbers rule only
    // rewrites operators it knows, so a custom node normalizes its own
    // key expressions
    def norm(e: org.apache.spark.sql.catalyst.expressions.Expression) =
      e.dataType match {
        case org.apache.spark.sql.types.FloatType |
             org.apache.spark.sql.types.DoubleType =>
          org.apache.spark.sql.graft.GraftSqlShim.normalizeFloating(e)
        case _ => e
      }
    val node = AsOfJoinNode(
      lPlan, rPlan,
      norm(attr(lPlan, key, "left")), norm(attr(rPlan, key, "right")),
      norm(attr(lPlan, leftTs, "left")), norm(attr(rPlan, rightTs, "right")),
      rightCols.map(c => attr(rPlan, c, "right")),
      direction)
    // the asof_* renaming lives in this Project: CleanupAliases would
    // strip an Alias kept inside the node itself
    val renamed = lPlan.output ++
      rightCols.zip(node.output.drop(lPlan.output.size)).map {
        case (c, a) => Alias(a, s"asof_$c")()
      }
    org.apache.spark.sql.graft.GraftSqlShim.ofRows(left.sparkSession,
      org.apache.spark.sql.catalyst.plans.logical.Project(renamed, node))
  }
}
