package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TemporalSpec extends SparkSpec {

  private def leftDf = {
    import spark.implicits._
    Seq(
      (1L, "a", 100L, "p1"),
      (2L, "a", 205L, "p2"),
      (3L, "a", 300L, "p3"), // ties a right row's ts exactly → inclusive
      (4L, "b", 50L, "p4"),  // before any right row → null match
      (5L, "c", 500L, "p5")  // key with no right rows at all → null match
    ).toDF("id", "k", "t", "payload")
  }

  private def rightDf = {
    import spark.implicits._
    Seq(
      (10L, "a", 90L, 1.5),
      (11L, "a", 200L, 2.5),
      (12L, "a", 300L, 3.5),
      (13L, "b", 60L, 4.5)
    ).toDF("rid", "k", "rt", "rv")
  }

  test("as-of join picks the latest right row at-or-before each left time") {
    val out = Temporal.asofJoin(leftDf, rightDf, Seq("k"), "t", "rt",
        Seq("rid", "rv"))
      .collect().map(r => (r.getLong(2), Option(r.get(4)), Option(r.get(5))))
      .sortBy(_._1).toSeq
    // columns: k, t, id, payload, asof_rid, asof_rv
    assert(out == Seq(
      (1L, Some(10L), Some(1.5)),   // t=100 → rt=90
      (2L, Some(11L), Some(2.5)),   // t=205 → rt=200
      (3L, Some(12L), Some(3.5)),   // t=300 ties rt=300 → inclusive
      (4L, None, None),             // t=50 precedes b's only row at 60
      (5L, None, None)              // key c has no right rows
    ))
  }

  test("as-of join with tolerance nulls out stale matches") {
    val out = Temporal.asofJoin(leftDf, rightDf, Seq("k"), "t", "rt",
        Seq("rid"), tolerance = Some(lit(10L)))
      .collect().map(r => (r.getLong(2), Option(r.get(4)))).sortBy(_._1).toSeq
    assert(out == Seq(
      (1L, Some(10L)), // age 10 == tolerance → kept
      (2L, Some(11L)), // age 5
      (3L, Some(12L)), // age 0
      (4L, None), (5L, None)))
  }

  test("as-of match is atomic: a NULL right field is NOT back-filled from an older row") {
    import spark.implicits._
    val l = Seq((1L, "u", 20L)).toDF("id", "k", "t")
    val r = Seq((2L, "u", 5L, Some(3.0)), (7L, "u", 10L, None))
      .toDF("rid", "k", "rt", "rv")
    val out = Temporal.asofJoin(l, r, Seq("k"), "t", "rt", Seq("rid", "rv"))
      .select("asof_rid", "asof_rv").collect().head
    assert(out.getLong(0) === 7L)   // the t=10 row is the match...
    assert(out.isNullAt(1), out)    // ...and its NULL rv stays NULL
  }

  test("as-of tolerance on timestamp columns is in microseconds") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(ms: Long) = new Timestamp(ms)
    val l = Seq((1L, "u", ts(2000L)), (2L, "u", ts(5000L)))
      .toDF("id", "k", "t")
    val r = Seq((9L, "u", ts(1000L))).toDF("rid", "k", "rt")
    // 1.5 s tolerance = 1_500_000 µs: the 1 s-stale match survives, the
    // 4 s-stale one nulls out (a seconds cast would keep both)
    val out = Temporal.asofJoin(l, r, Seq("k"), "t", "rt", Seq("rid"),
        tolerance = Some(lit(1500000L)))
      .select("id", "asof_rid").as[(Long, Option[Long])].collect().toMap
    assert(out === Map(1L -> Some(9L), 2L -> None))
  }

  test("as-of join never multiplies left rows and keeps left payloads") {
    val out = Temporal.asofJoin(leftDf, rightDf, Seq("k"), "t", "rt", Seq("rv"))
    assert(out.count() == 5)
    assert(out.columns.toSeq == Seq("k", "t", "id", "payload", "asof_rv"))
    assert(out.filter(col("payload").isNull).count() == 0)
  }

  test("trailing window frames exactly [t - N, t] at microsecond resolution") {
    import spark.implicits._
    import java.sql.Timestamp
    // micros: 0, 999_999, 1_000_000, 2_000_001 — a 1s (=1e6 µs) trailing
    // window at the 3rd event includes µs 0 (boundary inclusive); at the
    // 4th it includes nothing earlier (2_000_001 - 1e6 = 1_000_001 > 1e6)
    def ts(us: Long) = {
      val t = new Timestamp(us / 1000000 * 1000)
      t.setNanos(((us % 1000000) * 1000).toInt)
      t
    }
    val df = Seq(
      (1L, "u", ts(0L)), (2L, "u", ts(999999L)),
      (3L, "u", ts(1000000L)), (4L, "u", ts(2000001L))
    ).toDF("id", "k", "t")
    val w = Temporal.trailingWindow(Seq("k"), "t", 1000000L)
    val out = df.select(col("id"), count(lit(1)).over(w).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(out == Seq((1L, 1L), (2L, 2L), (3L, 3L), (4L, 1L)))
  }

  test("as-of plan is one exchange on the keys, no nested-loop join") {
    val out = Temporal.asofJoin(leftDf, rightDf, Seq("k"), "t", "rt", Seq("rv"))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    // the union feeds a single window sort — count the shuffles
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges <= 2, s"expected at most one exchange per side:\n$plan")
  }

  test("sessionIds: gap rule starts islands, per-key 0-based indexes") {
    import spark.implicits._
    // long ts = epoch seconds; gap 50 s
    val ev = Seq(
      (1L, "a", 0L), (2L, "a", 10L),   // gap 10 <= 50: same session
      (3L, "a", 100L), (4L, "a", 105L), // 90 > 50: new session
      (5L, "b", 7L)                     // separate key restarts at 0
    ).toDF("id", "k", "t")
    val out = Temporal.sessionIds(ev, Seq("k"), "t", gapMicros = 50L * 1000000L,
        orderCols = Seq("id"))
      .select("id", "session_idx").as[(Long, Int)].collect().toMap
    assert(out === Map(1L -> 0, 2L -> 0, 3L -> 1, 4L -> 1, 5L -> 0))
    // an exact-gap pair stays in one session (strict > rule)
    val edge = Seq((1L, "a", 0L), (2L, "a", 50L)).toDF("id", "k", "t")
    val e2 = Temporal.sessionIds(edge, Seq("k"), "t", 50L * 1000000L)
      .select("id", "session_idx").as[(Long, Int)].collect().toMap
    assert(e2 === Map(1L -> 0, 2L -> 0))
  }

  test("interval join: inclusive bounds, band straddling, exactly-once pairs") {
    import spark.implicits._
    // long times cast through timestamp = epoch SECONDS; bands are 60 s
    val ev = Seq(
      (1L, "a", 100L), (2L, "a", 130L), (3L, "a", 161L),
      (4L, "a", 99L),  (5L, "b", 100L), (6L, "a", 160L)
    ).toDF("id", "k", "t")
    val win = Seq(
      ("a", 100L, 160L, "w1"), // spans bands 1..2: inclusive [100, 160]
      ("a", 130L, 130L, "w2"), // point interval
      ("a", 200L, 150L, "w3"), // malformed (end < start): dropped
      ("b", 90L,  110L, "w4")
    ).toDF("k", "ws", "we", "wid")
    val out = Temporal.intervalJoin(ev, win, Seq("k"), "t", "ws", "we",
      Seq("wid"), bandMicros = 60L * 1000000L)
    val pairs = out.select("id", "iv_wid").as[(Long, String)].collect().toList
    // 1@100 and 6@160 hit w1's inclusive ends; 3@161 is just outside;
    // 4@99 just before; w1 spans two bands yet each pair appears ONCE
    assert(pairs.sorted === List(
      (1L, "w1"), (2L, "w1"), (2L, "w2"), (5L, "w4"), (6L, "w1")))
    assert(pairs.size === pairs.distinct.size)
    // keys separate: event 5 ("b") never matches "a" windows
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("timeWeightedAvg weighs each value by its holding interval") {
    import spark.implicits._
    // u1: 10 held 2s, 40 held 6s, last sample weightless → (20+240)/8 = 32.5
    val ev = Seq(
      ("u1", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 10.0, 1L),
      ("u1", java.sql.Timestamp.valueOf("2024-01-01 00:00:02"), 40.0, 2L),
      ("u1", java.sql.Timestamp.valueOf("2024-01-01 00:00:08"), 999.0, 3L),
      ("u2", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 7.0, 4L)
    ).toDF("user_id", "ts", "value", "event_id")
    val out = Temporal.timeWeightedAvg(ev, Seq("user_id"), "ts", "value",
        orderCols = Seq("event_id"))
      .select("user_id", "twa").collect()
      .map(r => r.getString(0) -> Option(r.get(1)).map(_.asInstanceOf[Double]))
      .toMap
    assert(out("u1") === Some(32.5))
    assert(out("u2") === None) // single sample: zero-width window
  }

  test("timeWeightedAvg excludes null-valued samples' intervals from both sums") {
    import spark.implicits._
    // (t=0, 10), (t=2, null), (t=8, 20): null's 6s segment is UNKNOWN →
    // twa = 10·2 / 2 = 10, not 20/8 = 2.5
    val ev = Seq(
      ("u", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), Some(10.0), 1L),
      ("u", java.sql.Timestamp.valueOf("2024-01-01 00:00:02"), None: Option[Double], 2L),
      ("u", java.sql.Timestamp.valueOf("2024-01-01 00:00:08"), Some(20.0), 3L)
    ).toDF("user_id", "ts", "value", "event_id")
    val out = Temporal.timeWeightedAvg(ev, Seq("user_id"), "ts", "value",
        orderCols = Seq("event_id"))
      .select("twa").as[Double].head()
    assert(out === 10.0)
  }

  test("resampleLocf: epoch-aligned grid, LOCF carry, NULL before first event") {
    import spark.implicits._
    // one key, events at :10 and 2:30 past the hour; 60s grid spans
    // floor(:10 → :00) .. 2:30 → grid points :00, 1:00, 2:00
    val ev = Seq(
      ("u", java.sql.Timestamp.valueOf("2024-01-01 00:00:10"), 1L, 5.0),
      ("u", java.sql.Timestamp.valueOf("2024-01-01 00:02:30"), 2L, 9.0)
    ).toDF("user_id", "ts", "event_id", "value")
    val out = Temporal.resampleLocf(ev, Seq("user_id"), "ts",
        Seq("event_id", "value"), stepSec = 60L)
      .select("user_id", "grid_ts", "asof_event_id", "asof_value")
      .as[(String, java.sql.Timestamp, Option[Long], Option[Double])]
      .collect().sortBy(_._2.getTime)
    assert(out.length === 3)
    // :00 precedes the first event → carries nothing
    assert(out(0)._2 === java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))
    assert(out(0)._3.isEmpty && out(0)._4.isEmpty)
    // 1:00 and 2:00 both carry event 1 forward (event 2 is later)
    assert(out(1)._3 === Some(1L) && out(1)._4 === Some(5.0))
    assert(out(2)._2 === java.sql.Timestamp.valueOf("2024-01-01 00:02:00"))
    assert(out(2)._3 === Some(1L) && out(2)._4 === Some(5.0))
  }
}
