package graft.queries

import java.nio.file.Files
import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** Degenerate-input semantics for the relational time-series queries —
  * edge cases the sf fixtures don't exercise but a real corpus will.
  */
class RelationalEdgeSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  test("q36: a single-timestamp type has span 0 and a NULL twa (not NaN/inf)") {
    // Spark's non-ANSI divide nulls a zero denominator where DuckDB's
    // IEEE divide NaNs — the d57 divergence class; the nullif guard
    // keeps BOTH engines at NULL for the degenerate type.
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-edge-").toString
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
    val t1 = Timestamp.valueOf("2024-01-01 01:00:00")
    Seq(
      (1L, t0, 10L, "solo", 5.0, "{}"),
      (2L, t0, 11L, "solo", 7.0, "{}"), // same instant: span 0
      (3L, t0, 12L, "pair", 1.0, "{}"),
      (4L, t1, 13L, "pair", 3.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = RelationalQueries.queries("q36_time_weighted_avg")(spark, dir)
      .orderBy("event_type").collect()
    assert(rows.length == 2)
    val pair = rows(0)
    assert(pair.getString(0) == "pair" && !pair.isNullAt(2), pair)
    assert(!pair.getDouble(2).isNaN && !pair.getDouble(2).isInfinite, pair)
    val solo = rows(1)
    assert(solo.getString(0) == "solo" && solo.getLong(1) == 2L, solo)
    assert(solo.isNullAt(2), s"span-0 twa must be NULL, got $solo")
  }

  private def eventsDir(rows: Seq[(Long, Timestamp, Long, String)]): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-edge-").toString
    rows.map { case (eid, ts, uid, tpe) => (eid, ts, uid, tpe, 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("q49: an empty funnel step yields zero counts and NULL conversions (nullif rail)") {
    val t = Timestamp.valueOf("2024-01-01 00:00:00")
    // views and purchases but NO clicks: step 2 and 3 are empty — the
    // permilles must be NULL (division guarded), never a crash or 0/0
    val dir = eventsDir(Seq(
      (1L, t, 1L, "view"),
      (2L, Timestamp.valueOf("2024-01-01 01:00:00"), 1L, "purchase")))
    val r = RelationalQueries.queries("q49_funnel_conversion")(spark, dir).head()
    assert(r.getLong(0) == 1L && r.getLong(1) == 0L && r.getLong(2) == 0L, r)
    assert(r.getLong(3) == 0L, s"0 clicks of 1 view is 0 permille: $r")
    assert(r.isNullAt(4), s"purchase conversion over an empty click step must be NULL: $r")
  }

  test("q49: a purchase BEFORE the first click does not advance the funnel") {
    def ts(h: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")
    val dir = eventsDir(Seq(
      (1L, ts(0), 1L, "view"),
      (2L, ts(1), 1L, "purchase"), // too early: precedes the click
      (3L, ts(2), 1L, "click"),
      (4L, ts(0), 2L, "view"),
      (5L, ts(1), 2L, "click"),
      (6L, ts(2), 2L, "purchase"))) // properly ordered
    val r = RelationalQueries.queries("q49_funnel_conversion")(spark, dir).head()
    assert(r.getLong(0) == 2L && r.getLong(1) == 2L, r)
    assert(r.getLong(2) == 1L,
      s"only user 2's purchase is strictly after their first click: $r")
  }

  test("q51: a single user is their own whale — threshold equals their count, share 1000") {
    val t = Timestamp.valueOf("2024-01-01 00:00:00")
    val dir = eventsDir((1 to 5).map(i => (i.toLong, t, 42L, "view")))
    val r = RelationalQueries.queries("q51_power_user_share")(spark, dir).head()
    assert(r.getLong(0) == 1L && r.getLong(1) == 5L, r)
    assert(r.getLong(2) == 5L && r.getLong(3) == 1L && r.getLong(4) == 5L, r)
    assert(r.getLong(5) == 1000L, r)
  }

  test("q51: rank threshold includes ties — everyone at the boundary count is a power user") {
    val t = Timestamp.valueOf("2024-01-01 00:00:00")
    // 10 users with 2 events each + 1 user with 3: k = ceil(11/10) = 2,
    // cum at c=3 is 1 < 2, cum at c=2 is 11 ≥ 2 → threshold 2, ALL 11
    // users qualify (ties included, the documented over-selection)
    var eid = 0L
    val rows = (1 to 10).flatMap { u =>
      (1 to 2).map { _ => eid += 1; (eid, t, u.toLong, "view") }
    } ++ (1 to 3).map { _ => eid += 1; (eid, t, 99L, "view") }
    val dir = eventsDir(rows)
    val r = RelationalQueries.queries("q51_power_user_share")(spark, dir).head()
    assert(r.getLong(2) == 2L, s"threshold must land on the tie count: $r")
    assert(r.getLong(3) == 11L, s"ties included: $r")
    assert(r.getLong(5) == 1000L, r)
  }

  test("q48/q50: a user active in exactly one week never churn-links or offsets past it") {
    val dir = eventsDir(Seq(
      (1L, Timestamp.valueOf("2024-01-01 10:00:00"), 1L, "view"),   // Mon wk1
      (2L, Timestamp.valueOf("2024-01-03 10:00:00"), 1L, "view"),   // same wk
      (3L, Timestamp.valueOf("2024-01-08 10:00:00"), 2L, "view")))  // Mon wk2
    val coh = RelationalQueries.queries("q48_retention_cohorts")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(coh == Set(("2024-01-01", 0L, 1L), ("2024-01-08", 0L, 1L)),
      s"one (cohort, offset 0) row per user: $coh")
    val churn = RelationalQueries.queries("q50_weekly_churn")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(churn == Set(
      ("2024-01-01", 1L, 1L, 0L, 1L),  // user 1: new, churned (absent wk2)
      ("2024-01-08", 1L, 1L, 0L, 1L)), // user 2: new, nothing follows
      s"$churn")
  }

  test("q52: median thresholds include ties; each dimension splits independently") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-edge-").toString
    // two customers with EQUAL frequency (tie at the median → both F1),
    // A most recent (R1) but low spend (M0), B stale (R0) high spend (M1)
    Seq(
      (1L, 100L, "O", 100.00, Timestamp.valueOf("2024-03-01 00:00:00"), "1-URGENT"),
      (2L, 100L, "O", 100.00, Timestamp.valueOf("2024-03-10 00:00:00"), "1-URGENT"),
      (3L, 200L, "O", 4000.00, Timestamp.valueOf("2024-02-01 00:00:00"), "1-URGENT"),
      (4L, 200L, "O", 4000.00, Timestamp.valueOf("2024-02-20 00:00:00"), "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val segs = RelationalQueries.queries("q52_rfm_segments")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(segs == Set(
      ("R1F1M0", 1L, 20000L),   // A: 2 × $100 = 20000 cents
      ("R0F1M1", 1L, 800000L)), // B: 2 × $4000 = 800000 cents
      s"tie-inclusive median split: $segs")
  }

  test("q53: singleton pairs are pruned; duplicate basket lines count once") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-edge-").toString
    // order 1 carries part 10 TWICE (distinct collapses it); pair
    // (10,20) co-occurs in orders 1+2 (kept), (10,30) only in 3 (pruned)
    Seq(
      (1L, 10L), (1L, 10L), (1L, 20L),
      (2L, 10L), (2L, 20L),
      (3L, 10L), (3L, 30L))
      .toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val rows = RelationalQueries.queries("q53_basket_affinity")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    // lift(10,20) = n_pair·n_orders·1000 / (n_10·n_20) = 2·3·1000/(3·2)
    assert(rows == Set((10L, 20L, 2L, 3L, 2L, 1000L)),
      s"only the supported pair survives, dupes collapsed: $rows")
  }

  test("q56: same-ts ties break by event_id; untouched and error-only users credit 'none'") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-edge-").toString
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
    val t1 = Timestamp.valueOf("2024-01-01 01:00:00")
    Seq(
      // user 1: view (id 1) shares ts with the purchase (id 2) — the
      // SMALLER id precedes it in the total order, so it counts; the
      // click (id 3) at the same ts follows the purchase and must not
      (1L, t0, 1L, "view", 0.0, "{}"),
      (2L, t0, 1L, "purchase", 10.00, "{}"),
      (3L, t0, 1L, "click", 0.0, "{}"),
      (4L, t1, 1L, "purchase", 20.00, "{}"), // first=view, last=click
      // user 2: purchase with no prior touch at all
      (5L, t0, 2L, "purchase", 5.00, "{}"),
      // user 3: an error is neither a touch nor a credit
      (6L, t0, 3L, "error", 0.0, "{}"),
      (7L, t1, 3L, "purchase", 7.00, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = RelationalQueries.queries("q56_attribution")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(rows == Set(
      ("view", "view", 1L, 1000L),
      ("view", "click", 1L, 2000L),
      ("none", "none", 2L, 1200L)),
      s"tie order + none bucket: $rows")
  }

  test("d70/d71: blocking bounds recall by design; chains merge to the min-key entity") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-edge-").toString
    Seq(
      (1L, "red gear"), (2L, "red gear"),   // dist 0, share both tokens
      (3L, "red bear"),                     // dist 1 from 1/2 via 'red'
      (4L, "cat"), (5L, "bat"),             // dist 1 but NO shared token:
                                            // blocked out — the recall
                                            // bound of token blocking
      (6L, "lone widget"))
      .toDF("p_partkey", "p_name")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    val pairs = graft.queries.TextQueries.queries("d70_fuzzy_match")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pairs == Set((1L, 2L, 0L), (1L, 3L, 1L), (2L, 3L, 1L)),
      s"blocked fuzzy pairs: $pairs")
    val ents = graft.queries.TextQueries.queries("d71_entity_groups")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ents == Set((1L, 3L)),
      s"chain 1-2-3 merges to canonical key 1 with 3 members: $ents")
  }

  test("q59: non-overlapping deterministic-extent pattern counts per user") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-edge-").toString
    def t(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    // user 1: v c c p v c p  → two direct (and two assisted) matches
    // user 2: v s p          → assisted only
    // user 3: p v            → purchase BEFORE view: no match
    // user 4: v e c p        → an error breaks the [cs]+ run: no match
    val rows = Seq(
      (1L, "view"), (1L, "click"), (1L, "click"), (1L, "purchase"),
      (1L, "view"), (1L, "click"), (1L, "purchase"),
      (2L, "view"), (2L, "signup"), (2L, "purchase"),
      (3L, "purchase"), (3L, "view"),
      (4L, "view"), (4L, "error"), (4L, "click"), (4L, "purchase"))
    rows.zipWithIndex.map { case ((u, tp), i) => (i.toLong, t(i), u, tp, 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = RelationalQueries.queries("q59_pattern_cep")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSet
    assert(got == Set((1L, 2L, 2L), (2L, 0L, 1L), (3L, 0L, 0L), (4L, 0L, 0L)),
      s"pattern counts: $got")
  }
}
