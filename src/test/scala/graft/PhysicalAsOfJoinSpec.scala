package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import TestSpark._
import graft.ops.AsOfJoin

/** The custom physical as-of join ([[graft.plans.AsOfJoinExec]]) against
  * the compositional union+window form — same rows on real data, exact
  * edge semantics on synthetic frames, and the plan shape the operator
  * promises (AsOfJoinExec node, no Window, shuffles declared not
  * hand-rolled). */
class PhysicalAsOfJoinSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"

  private def planOf(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  private def sides(s: org.apache.spark.sql.SparkSession) = {
    val e = Tables.events(s, dir)
    (e.filter(col("event_type") === "purchase")
       .select("event_id", "ts", "user_id", "value"),
     e.filter(col("event_type") === "view")
       .select("event_id", "ts", "user_id"))
  }

  test("exec == compositional on events, backward and forward") {
    val (p, v) = sides(spark)
    for (d <- Seq("backward", "forward")) {
      val a = AsOfJoin.asOf(p, v, "user_id", "ts", "ts", Seq("event_id", "ts"), d)
      val b = AsOfJoin.asOfExec(p, v, "user_id", "ts", "ts", Seq("event_id", "ts"), d)
      assertSameRows(a, b) // column-name sorted, so ordering differences don't matter
    }
  }

  test("nearest mode == compositional asOfNearest on events; O(1)-state pick is exact") {
    val (p, v) = sides(spark)
    val a = AsOfJoin.asOfNearest(p, v, "user_id", "ts", "ts", Seq("event_id", "ts"))
    val b = AsOfJoin.asOfExec(p, v, "user_id", "ts", "ts", Seq("event_id", "ts"), "nearest")
    assertSameRows(a, b)
    // the synthetic edge set: forward-wins / tie-backward / exact /
    // one-sided / no-match, all through the physical merge
    val s = spark
    import s.implicits._
    def t(sec: Int) = new Timestamp(1700000000000L + sec * 1000L)
    val trades = Seq(
      (1L, t(10), "FWD"), (1L, t(30), "TIE"), (1L, t(50), "EXACT"),
      (2L, t(10), "ONLYB"), (3L, t(10), "ONLYF"), (4L, t(10), "NONE"))
      .toDF("sym", "ts", "trade")
    val quotes = Seq(
      (1L, t(7), 7.0), (1L, t(12), 12.0), (1L, t(28), 28.0), (1L, t(32), 32.0),
      (1L, t(50), 50.0), (2L, t(2), 2.0), (3L, t(19), 19.0))
      .toDF("sym", "ts", "px")
    val out = AsOfJoin.asOfExec(trades, quotes, "sym", "ts", "ts", Seq("px"), "nearest")
      .collect().map(r => r.getString(2) -> Option(r.get(3))).toMap
    assert(out("FWD").contains(12.0) && out("TIE").contains(28.0) &&
      out("EXACT").contains(50.0) && out("ONLYB").contains(2.0) &&
      out("ONLYF").contains(19.0) && out("NONE").isEmpty, s"got $out")
  }

  test("plan: AsOfJoinExec node, no Window, both sides exchanged once") {
    val (p, v) = sides(spark)
    val plan = planOf(AsOfJoin.asOfExec(p, v, "user_id", "ts", "ts", Seq("event_id")))
    // formatted mode prints the node as "AsOfJoin (n)" (nodeName strips Exec)
    assert(plan.contains("AsOfJoin "), s"strategy did not fire:\n$plan")
    assert(!plan.contains("Window"), s"window crept back in:\n$plan")
    // EnsureRequirements inserted exactly one declared shuffle per side
    assert("ENSURE_REQUIREMENTS".r.findAllIn(plan).size == 2,
      s"expected exactly one declared shuffle per side:\n$plan")
    assert("hashpartitioning\\(user_id".r.findAllIn(plan).size == 2,
      s"shuffles must cluster on the join key:\n$plan")
  }

  private def tsOf(s: String) = Timestamp.valueOf(s)

  private def mk(rows: Seq[(Long, String, String)], valCol: Boolean): DataFrame = {
    val s = spark
    import s.implicits._
    val df = rows.map { case (k, t, v) => (k, tsOf(t), v) }.toDF("k", "t", "v")
    if (valCol) df else df.drop("v")
  }

  test("edge semantics: ties, no-match, empty right, null key/ts") {
    val s = spark
    import s.implicits._
    val left = Seq(
      (1L, "2024-01-01 10:00:00", "l1"), // exact-tie with right at 10:00
      (1L, "2024-01-01 12:00:00", "l2"),
      (2L, "2024-01-01 09:00:00", "l3"), // before every right row of key 2
      (3L, "2024-01-01 10:00:00", "l4")  // key absent on the right
    ).map { case (k, t, v) => (k, tsOf(t), v) }.toDF("k", "t", "v")
    val right = Seq(
      (1L, "2024-01-01 10:00:00", "r_tie_a"),
      (1L, "2024-01-01 10:00:00", "r_tie_b"), // tie at equal ts: LAST wins backward
      (1L, "2024-01-01 11:00:00", "r_11"),
      (2L, "2024-01-01 10:30:00", "r_230")
    ).map { case (k, t, v) => (k, tsOf(t), v) }.toDF("k", "t", "v")

    val back = AsOfJoin.asOfExec(left, right, "k", "t", "t", Seq("v"))
      .select("k", "t", "v", "asof_v").as[(Long, Timestamp, String, Option[String])]
      .collect().map(r => (r._3, r._4)).toMap
    assert(back("l1").contains("r_tie_b"), "equal-ts tie must match (last tied row)")
    assert(back("l2").contains("r_11"))
    assert(back("l3").isEmpty, "right row strictly after left ts must not match backward")
    assert(back("l4").isEmpty, "absent key must not match")

    val fwd = AsOfJoin.asOfExec(left, right, "k", "t", "t", Seq("v"), direction = "forward")
      .select("v", "asof_v").as[(String, Option[String])].collect().toMap
    assert(fwd("l1").exists(v => v == "r_tie_a" || v == "r_tie_b"),
      "equal-ts tie matches forward")
    assert(fwd("l2").isEmpty, "no right row at-or-after: forward must not match")
    assert(fwd("l3").contains("r_230"))

    // empty right: all left rows survive, all unmatched
    val er = AsOfJoin.asOfExec(left, right.filter(lit(false)), "k", "t", "t", Seq("v"))
    assert(er.count() == 4 && er.filter(col("asof_v").isNotNull).count() == 0)

    // null key / null ts on either side: never matches, left rows kept
    val ln = Seq((Option.empty[Long], Option(tsOf("2024-01-01 10:00:00")), "lnull"),
      (Option(1L), Option.empty[Timestamp], "ltsnull"))
      .toDF("k", "t", "v")
    val rn = Seq((Option.empty[Long], Option(tsOf("2024-01-01 09:00:00")), "rnull"),
      (Option(1L), Option.empty[Timestamp], "rtsnull"))
      .toDF("k", "t", "v")
    val nulls = AsOfJoin.asOfExec(ln, rn.unionByName(right), "k", "t", "t", Seq("v"))
    assert(nulls.count() == 2 &&
      nulls.filter(col("asof_v").isNotNull).count() == 0,
      "null keys/timestamps must never match")
  }

  test("randomized parity with the compositional form across shapes and layouts") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 5) {
      // dense key space + coarse timestamps force heavy key sharing,
      // duplicate timestamps per key, and some keys on only one side;
      // ~7% null keys and ~5% null timestamps exercise the skip paths.
      // Ties on (key, ts) are EXCLUDED on the right by construction
      // (distinct right (k,ts) pairs): at equal-ts ties both forms pick
      // an arbitrary tied row, which is legitimately nondeterministic.
      val nKeys = 1 + rnd.nextInt(8)
      def side(n: Int) = (0 until n).map { i =>
        val k = if (rnd.nextInt(15) == 0) null
          else Long.box(rnd.nextInt(nKeys).toLong)
        val t = if (rnd.nextInt(20) == 0) null
          else new java.sql.Timestamp(3600000L * rnd.nextInt(48))
        (k, t, s"v$i")
      }
      val left = side(30 + rnd.nextInt(40)).toDF("k", "t", "v")
      val right = side(30 + rnd.nextInt(40)).toDF("k", "t", "v")
        .dropDuplicates("k", "t")
      for (d <- Seq("backward", "forward"); parts <- Seq(1, 3)) {
        val l = left.repartition(parts)
        val r = right.repartition(math.max(1, 4 - parts))
        // the window composition groups NULL keys together (they match
        // each other); the exec uses SQL join semantics (null never
        // matches) — compare on the non-null-key slice, and separately
        // pin that the exec leaves null-key left rows unmatched
        val a = AsOfJoin.asOf(
          l.filter(col("k").isNotNull && col("t").isNotNull),
          r.filter(col("k").isNotNull && col("t").isNotNull),
          "k", "t", "t", Seq("v"), d)
        val b = AsOfJoin.asOfExec(l, r, "k", "t", "t", Seq("v"), d)
        assertSameRows(a,
          b.filter(col("k").isNotNull && col("t").isNotNull))
        val nullRows = b.filter(col("k").isNull || col("t").isNull)
        assert(nullRows.filter(col("asof_v").isNotNull).count() == 0,
          s"trial $trial $d parts=$parts: null key/ts must never match")
      }
    }
  }

  test("string keys: the canonical (symbol, ts) market-data shape merges correctly") {
    val s = spark
    import s.implicits._
    // binary UTF8String ordering differs from Long ordering — this pins
    // the interpreted key ordering + cross-key state reset on strings
    val quotes = Seq(
      ("AAPL", "2024-01-01 09:59:00", 186.0),
      ("AAPL", "2024-01-01 10:01:00", 187.0),
      ("MSFT", "2024-01-01 09:58:00", 402.0))
      .map { case (k, t, v) => (k, tsOf(t), v) }.toDF("sym", "t", "px")
    val trades = Seq(
      ("AAPL", "2024-01-01 10:00:00", 100L),
      ("MSFT", "2024-01-01 10:00:00", 50L),
      ("ZZZZ", "2024-01-01 10:00:00", 1L)) // no quotes at all
      .map { case (k, t, q) => (k, tsOf(t), q) }.toDF("sym", "t", "qty")
    val out = AsOfJoin.asOfExec(trades, quotes, "sym", "t", "t", Seq("px"))
      .select("sym", "asof_px").as[(String, Option[Double])].collect().toMap
    assert(out("AAPL").contains(186.0), "latest quote at-or-before the trade")
    assert(out("MSFT").contains(402.0))
    assert(out("ZZZZ").isEmpty, "symbol with no quotes stays null")
    val a = AsOfJoin.asOf(trades, quotes, "sym", "t", "t", Seq("px"))
    assertSameRows(a, AsOfJoin.asOfExec(trades, quotes, "sym", "t", "t", Seq("px")))
  }

  test("double keys: -0.0 matches 0.0 (SQL equality), names resolve case-insensitively") {
    val s = spark
    import s.implicits._
    val left = Seq((0.0, tsOf("2024-01-01 10:00:00"), "l"))
      .toDF("K", "T", "v") // upper-case names: resolution must not care
    val right = Seq((-0.0, tsOf("2024-01-01 09:00:00"), "r")).toDF("k", "t", "v")
    val out = AsOfJoin.asOfExec(left, right, "k", "t", "t", Seq("v"))
      .select("asof_v").collect()
    assert(out.length == 1 && out(0).getString(0) == "r",
      "-0.0 right key must match 0.0 left key after normalization")
  }

  test("match state resets across keys within a partition") {
    val s = spark
    import s.implicits._
    // force everything into ONE partition so consecutive keys share a
    // merge state; key 20 has no right rows, so a held match from key 10
    // leaking across the key boundary would surface here
    val left = Seq((10L, "2024-01-01 10:00:00", "a"), (20L, "2024-01-01 10:00:00", "b"))
      .map { case (k, t, v) => (k, tsOf(t), v) }.toDF("k", "t", "v").coalesce(1)
    val right = Seq((10L, "2024-01-01 09:00:00", "r10"))
      .map { case (k, t, v) => (k, tsOf(t), v) }.toDF("k", "t", "v").coalesce(1)
    val out = AsOfJoin.asOfExec(left, right, "k", "t", "t", Seq("v"))
      .select("v", "asof_v").as[(String, Option[String])].collect().toMap
    assert(out("a").contains("r10"))
    assert(out("b").isEmpty, "held match leaked across a key boundary")
  }
}
