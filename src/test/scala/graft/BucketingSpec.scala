package graft

import org.scalatest.funsuite.AnyFunSuite

import TestSpark._

/** Bucketed tables co-locate join keys at write time: a join between two
  * tables bucketed on the join key by the same bucket count needs NO
  * shuffle exchange — at 100 TB this converts the biggest fact-fact join
  * from a full network shuffle into local sorted-bucket merges.
  */
class BucketingSpec extends AnyFunSuite {

  test("join of co-bucketed tables plans without a shuffle exchange") {
    val s = spark
    val prevThreshold = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      Tables.orders(s, "/root/testdata/sf0.001")
        .write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("orders_bucketed")
      Tables.lineitem(s, "/root/testdata/sf0.001")
        .write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("lineitem_bucketed")

      val joined = s.table("orders_bucketed").join(
        s.table("lineitem_bucketed"),
        s.table("orders_bucketed")("o_orderkey") === s.table("lineitem_bucketed")("l_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString

      assert(plan.contains("SortMergeJoin"), s"expected sort-merge join:\n${plan.take(500)}")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n${plan.take(800)}")
      assert(joined.count() == Tables.lineitem(s, "/root/testdata/sf0.001").count())
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      s.sql("DROP TABLE IF EXISTS orders_bucketed")
      s.sql("DROP TABLE IF EXISTS lineitem_bucketed")
    }
  }

  test("as-of join over co-bucketed tables elides both exchanges") {
    // The custom AsOfJoinExec only DECLARES its distribution/ordering —
    // this pins the payoff: bucketed inputs satisfy the declaration, so
    // EnsureRequirements inserts no shuffle on either side. (Sorts may
    // remain: multiple files per bucket void the scan's sort order.)
    val s = spark
    import org.apache.spark.sql.functions.col
    val ev = Tables.events(s, "/root/testdata/sf0.001")
    val p = ev.filter(col("event_type") === "purchase")
      .select("event_id", "ts", "user_id", "value")
    val v = ev.filter(col("event_type") === "view")
      .select("event_id", "ts", "user_id")
    try {
      p.write.mode("overwrite").bucketBy(8, "user_id").sortBy("user_id", "ts")
        .saveAsTable("purchases_bucketed")
      v.write.mode("overwrite").bucketBy(8, "user_id").sortBy("user_id", "ts")
        .saveAsTable("views_bucketed")
      val joined = graft.ops.AsOfJoin.asOfExec(
        s.table("purchases_bucketed"), s.table("views_bucketed"),
        key = "user_id", leftTs = "ts", rightTs = "ts",
        rightCols = Seq("event_id", "ts"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("AsOfJoin"), s"strategy did not fire:\n${plan.take(500)}")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"co-bucketed as-of join must not shuffle:\n${plan.take(900)}")
      // same rows as the unbucketed plan-with-exchanges
      assertSameRows(joined,
        graft.ops.AsOfJoin.asOfExec(p, v, "user_id", "ts", "ts", Seq("event_id", "ts")))
    } finally {
      s.sql("DROP TABLE IF EXISTS purchases_bucketed")
      s.sql("DROP TABLE IF EXISTS views_bucketed")
    }
  }
}
