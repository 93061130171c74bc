package graft.ops

import graft.SparkSpec

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private def items =
    (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq("c")).toDF("token")

  test("count-min: wide sketch estimates exactly, grid is bounded") {
    val sk = Sketches.countMinSketch(items, "token", depth = 4, width = 1024)
    // at most depth × distinct-items cells are populated
    assert(sk.count() <= 4L * 3)
    val est = Sketches.estimateCounts(sk, items, "token", 4, 1024)
      .as[(String, Long)].collect().toMap
    assert(est === Map("a" -> 5L, "b" -> 3L, "c" -> 1L))
  }

  test("count-min never undercounts, even with forced collisions") {
    // width 2: collisions guaranteed; the one-sided bound must survive
    val sk = Sketches.countMinSketch(items, "token", depth = 2, width = 2)
    val est = Sketches.estimateCounts(sk, items, "token", 2, 2)
      .as[(String, Long)].collect().toMap
    val truth = Map("a" -> 5L, "b" -> 3L, "c" -> 1L)
    truth.foreach { case (t, n) => assert(est(t) >= n, s"undercounted $t") }
    // a probe the sketch never saw still estimates (collision mass only)
    val unseen = Sketches.estimateCounts(sk, Seq("zz").toDF("token"), "token", 2, 2)
      .as[(String, Long)].collect().head._2
    assert(unseen >= 0L)
  }

  test("groupDistinctBound: exact per-group distinct, HLL within bound") {
    val df = (1 to 100).map(i => (if (i % 2 == 0) "a" else "b", i.toLong % 30))
      .toDF("g", "v")
    val out = Sketches.groupDistinctBound(df, "g", "v")
      .as[(String, Long, Boolean)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // g=a: v = even i % 30 → 15 distinct; g=b: odd i % 30 → 15 distinct
    assert(out("a") === ((15L, true)))
    assert(out("b") === ((15L, true)))
  }
}
