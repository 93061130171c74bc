package graft.ops

import graft.SparkSpec
import java.sql.Timestamp

class EventAnalyticsSpec extends SparkSpec {

  test("funnel: first-touch anchors, strict order, max-gap window") {
    import spark.implicits._
    val ev = Seq(
      ("u1", "view", 10L), ("u1", "click", 20L), ("u1", "purchase", 30L),
      ("u2", "view", 10L), ("u2", "click", 5L),   // click BEFORE view: no
      ("u3", "click", 10L),                       // no view at all
      ("u4", "view", 10L), ("u4", "click", 10L),  // tie is not strictly after
      ("u5", "view", 10L), ("u5", "click", 111L)  // 101 s later: outside gap
    ).toDF("user_id", "event_type", "ts")
    val gapped = EventAnalytics.funnel(ev, Seq("view", "click", "purchase"),
        maxGapMicros = Some(100L * 1000000L)) // long ts = epoch seconds
      .as[(Int, String, Long)].collect().sortBy(_._1).toList
    assert(gapped === List((0, "view", 4L), (1, "click", 1L), (2, "purchase", 1L)))
    val open = EventAnalytics.funnel(ev, Seq("view", "click", "purchase"))
      .as[(Int, String, Long)].collect().sortBy(_._1).toList
    assert(open === List((0, "view", 4L), (1, "click", 2L), (2, "purchase", 1L)))
  }

  test("cohortRetention: Monday-week cohorts with whole-week offsets") {
    import spark.implicits._
    val ev = Seq( // 2024-01-01 and 2024-01-08 are Mondays
      ("u1", Timestamp.valueOf("2024-01-01 10:00:00")),
      ("u1", Timestamp.valueOf("2024-01-10 09:00:00")), // offset 1
      ("u1", Timestamp.valueOf("2024-01-16 23:00:00")), // offset 2
      ("u2", Timestamp.valueOf("2024-01-09 08:00:00")), // cohort week Jan 8
      ("u2", Timestamp.valueOf("2024-01-08 12:00:00")), // SAME week, offset 0
      ("u3", Timestamp.valueOf("2024-01-03 00:00:00"))  // cohort week Jan 1
    ).toDF("user_id", "ts")
    val out = EventAnalytics.cohortRetention(ev)
      .as[(Timestamp, Int, Long)].collect()
      .map { case (w, o, n) => ((w.toString.take(10), o), n) }.toMap
    assert(out === Map(
      ("2024-01-01", 0) -> 2L, // u1 + u3 active in their first week
      ("2024-01-01", 1) -> 1L, ("2024-01-01", 2) -> 1L,
      ("2024-01-08", 0) -> 1L))
  }

  test("equiDepthBuckets: SQL-standard ntile under a total order") {
    import spark.implicits._
    // 7 rows into 3 buckets: sizes 3,2,2 (first n mod k buckets larger)
    val df = (1 to 7).map(i => ("A", i.toLong, i.toDouble)).toDF("g", "id", "v")
    val out = EventAnalytics.equiDepthBuckets(df, "v", Seq("g"), 3,
        orderCols = Seq("id"))
      .select("id", "bucket").as[(Long, Int)].collect().toMap
    assert(out === Map(1L -> 1, 2L -> 1, 3L -> 1, 4L -> 2, 5L -> 2, 6L -> 3, 7L -> 3))
  }

  test("winsorize clips into the exact interpolated percentile band per group") {
    import spark.implicits._
    val df = (1 to 10).map(i => ("A", i.toLong, i.toDouble)).toDF("g", "id", "v")
    // sorted 1..10: p10 = 1 + 0.9*(2-1) = 1.9; p90 = 9 + 0.1*(10-9) = 9.1
    val out = EventAnalytics.winsorize(df, "v", Seq("g"), 0.1, 0.9)
      .select("id", "v_w").as[(Long, Double)].collect().toMap
    assert(out(1L) === 1.9 && out(10L) === 9.1)
    (2L to 9L).foreach(i => assert(out(i) === i.toDouble)) // interior untouched
  }

  test("zscoreOutliers: rounded-z threshold, zero-variance groups drop out") {
    import spark.implicits._
    val df = Seq(
      ("A", 1L, 1.0), ("A", 2L, 1.0), ("A", 3L, 1.0), ("A", 4L, 5.0),
      ("B", 5L, 7.0), ("B", 6L, 7.0) // zero variance: null z, never kept
    ).toDF("g", "id", "v")
    // group A: mean 2, sample sd 2 → z(5.0) = 1.5, z(1.0) = -0.5
    val out = EventAnalytics.zscoreOutliers(df, "v", Seq("g"), threshold = 1.4)
      .select("id", "z").as[(Long, Double)].collect().toList
    assert(out === List((4L, 1.5)))
    assert(EventAnalytics.zscoreOutliers(df, "v", Seq("g"), 0.4).count() === 4L)
  }

  test("keySkew: top keys by count with share and hotness ratio") {
    import spark.implicits._
    // key a: 6 rows, b: 2, c: 1, d: 1 → total 10, 4 keys, mean 2.5
    val df = (Seq.fill(6)("a") ++ Seq.fill(2)("b") ++ Seq("c", "d"))
      .toDF("k")
    val out = EventAnalytics.keySkew(df, "k", topN = 2)
      .as[(String, Long, Double, Double)].collect().toList
    assert(out === List(("a", 6L, 0.6, 2.4), ("b", 2L, 0.2, 0.8)))
    // top-n, broadcast totals: TakeOrdered + no shuffle join
    val plan = EventAnalytics.keySkew(df, "k", 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrdered"), plan)
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"), plan)
  }

  test("transitionMatrix: adjacent pairs under the total order, row-normalized") {
    import spark.implicits._
    val ev = Seq( // u1's ties on ts resolve by the event_id order column
      ("u1", 1L, 10L, "view"), ("u1", 2L, 10L, "click"), ("u1", 3L, 10L, "view"),
      ("u2", 4L, 10L, "view"), ("u2", 5L, 20L, "click"), ("u2", 6L, 30L, "buy"),
      ("u3", 7L, 10L, "view") // singleton user: contributes no transition
    ).toDF("user_id", "event_id", "ts", "event_type")
    val out = EventAnalytics.transitionMatrix(ev, Seq("user_id"),
        orderCols = Seq("event_id"))
      .as[(String, String, Long, Double)].collect()
      .map { case (f, t, n, p) => ((f, t), (n, p)) }.toMap
    assert(out === Map(
      ("view", "click") -> ((2L, 1.0)),   // both view exits go to click
      ("click", "view") -> ((1L, 0.5)),   // click splits 50/50
      ("click", "buy")  -> ((1L, 0.5))))
  }

  test("ewma: truncated trailing weights, hand-computed, head handled") {
    import spark.implicits._
    val ev = Seq(
      ("u1", 1L, 10.0), ("u1", 2L, 20.0), ("u1", 3L, 40.0),
      ("u2", 4L, 8.0)
    ).toDF("user_id", "event_id", "value")
    val out = EventAnalytics.ewma(ev, "value", Seq("user_id"), Seq("event_id"),
        k = 3, alpha = 0.5)
      .select("event_id", "ewma").as[(Long, Double)].collect().toMap
    assert(out(1L) === 10.0)                                  // head: only itself
    assert(out(2L) === (20.0 + 0.5 * 10.0) / 1.5)             // two terms
    assert(out(3L) === (40.0 + 0.5 * 20.0 + 0.25 * 10.0) / 1.75)
    assert(out(4L) === 8.0)
  }

  test("ewma: single window pass (one Exchange, one Window)") {
    import spark.implicits._
    val ev = Seq(("u1", 1L, 10.0)).toDF("user_id", "event_id", "value")
    val plan = EventAnalytics.ewma(ev, "value", Seq("user_id"), Seq("event_id"),
      k = 6, alpha = 0.5).queryExecution.executedPlan.toString
    assert(plan.split("Window").length - 1 === 1, plan)
  }

  test("ohlcBars: epoch-aligned buckets, first/last by (time, id) order") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      ("u", ts("2024-01-01 00:00:10"), 1L, 5.0),
      ("u", ts("2024-01-01 00:00:20"), 2L, 9.0),
      ("u", ts("2024-01-01 00:00:50"), 3L, 3.0),
      // second bar, SAME-timestamp tie: lower event_id opens
      ("u", ts("2024-01-01 00:01:30"), 5L, 7.0),
      ("u", ts("2024-01-01 00:01:30"), 4L, 2.0)
    ).toDF("user_id", "ts", "event_id", "value")
    val out = EventAnalytics.ohlcBars(ev, Seq("user_id"), "ts", "value",
        bucketSec = 60L, orderCol = "event_id")
      .as[(String, java.sql.Timestamp, Double, Double, Double, Double, Long)]
      .collect().sortBy(_._2.getTime)
    assert(out.length === 2)
    assert(out(0) === (("u", ts("2024-01-01 00:00:00"), 5.0, 9.0, 3.0, 3.0, 3L)))
    assert(out(1) === (("u", ts("2024-01-01 00:01:00"), 2.0, 7.0, 2.0, 7.0, 2L)))
  }
}
