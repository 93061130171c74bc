package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ChecksSpec extends SparkSpec {
  import spark.implicits._

  private def row(df: org.apache.spark.sql.DataFrame) =
    df.as[(String, Long, Long, Boolean)].head()

  test("uniqueness counts every member of a duplicated key group") {
    val df = Seq((1L, "a"), (1L, "b"), (2L, "c"), (3L, "d")).toDF("k", "v")
    assert(row(Checks.uniqueness(df, Seq("k"))) ===
      (("unique(k)", 4L, 2L, false)))
    // compound key: (1,a)/(1,b) are DISTINCT tuples → clean
    assert(row(Checks.uniqueness(df, Seq("k", "v"))) ===
      (("unique(k,v)", 4L, 0L, true)))
  }

  test("notNull and acceptedValues count violations (null = not accepted)") {
    val df = Seq(Some("O"), Some("F"), Some("X"), None).toDF("s")
    assert(row(Checks.notNull(df, "s")) === (("not_null(s)", 4L, 1L, false)))
    assert(row(Checks.acceptedValues(df, "s", Seq("O", "F"))) ===
      (("accepted(s)", 4L, 2L, false))) // X and null
  }

  test("referential counts dangling child keys; keys-only anti-join plan") {
    val parent = Seq(1L, 2L).toDF("pk")
    val child = Seq(1L, 1L, 2L, 9L).toDF("fk")
    assert(row(Checks.referential(child, "fk", parent, "pk")) ===
      (("fk(fk->pk)", 4L, 1L, false)))
    val plan = Checks.referential(child, "fk", parent, "pk")
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"), plan)
  }

  test("histogram: fixed-width bins, max in last bin, nulls drop") {
    val df = (Seq(0.0, 0.5, 0.99, 1.0, 3.9, 4.0).map(Some(_)) :+
      (None: Option[Double])).toDF("v")
    // lo=0, hi=4, 4 bins of width 1: [0,1)→3, [1,2)→1, [3,4]→2
    val out = Checks.histogram(df, "v", nBins = 4)
      .as[(Long, Long)].collect().toMap
    assert(out === Map(0L -> 3L, 1L -> 1L, 3L -> 2L))
    // degenerate min == max: everything in bin 0
    val flat = Seq(7.0, 7.0).toDF("v")
    assert(Checks.histogram(flat, "v", 4).as[(Long, Long)].collect().toMap
      === Map(0L -> 2L))
  }

  test("profile: per-column null and exact-distinct counts") {
    val df = Seq((1L, Some("a")), (2L, Some("a")), (3L, None))
      .toDF("id", "s")
    val out = Checks.profile(df, Seq("id", "s"))
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out("id") === (("id", 3L, 0L, 3L)))
    assert(out("s") === (("s", 3L, 1L, 1L)))
  }

  test("psi: reference-anchored bins, Laplace smoothing, hand-computed terms") {
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // reference: one value per bin (0..9 over lo=0 hi=9); actual: all zero
    val e = (0 to 9).map(_.toDouble).toDF("value")
    val a = Seq.fill(10)(0.0).toDF("value")
    val out = Checks.psi(e, a, "value", nBins = 10)
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(out.size === 10)
    assert(out(0L)._2 === 1L && out(0L)._3 === 10L)
    val p = 2.0 / 20; val q0 = 11.0 / 20; val q = 1.0 / 20
    assert(out(0L)._4 === r6((q0 - p) * math.log(q0 / p)))
    (1L to 9L).foreach(b => assert(out(b)._4 === r6((q - p) * math.log(q / p))))
    // identical distributions → every term 0 exactly
    assert(Checks.psi(e, e, "value", nBins = 10)
      .as[(Long, Long, Long, Double)].collect().forall(_._4 === 0.0))
  }

  test("categoricalMi: perfect dependence = ln 2 per-cell share, independence = 0") {
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val dep = Seq(("a", "1"), ("a", "1"), ("b", "2"), ("b", "2")).toDF("x", "y")
    val dOut = Checks.categoricalMi(dep, "x", "y")
      .as[(String, String, Long, Double)].collect()
    assert(dOut.length === 2)
    dOut.foreach(r => assert(r._4 === r6(0.5 * math.log(2.0))))
    val ind = Seq(("a", "1"), ("a", "2"), ("b", "1"), ("b", "2")).toDF("x", "y")
    assert(Checks.categoricalMi(ind, "x", "y")
      .as[(String, String, Long, Double)].collect().forall(_._4 === 0.0))
  }

  test("cohenKappa: hand-computed agreement, NULL on the degenerate case") {
    // n=4, agree=3 → po=0.75; marginals a:(x3,y1) b:(x2,y2) →
    // pe = (3·2 + 1·2)/16 = 0.5 → kappa = 0.25/0.5 = 0.5
    val df = Seq(("x", "x"), ("x", "x"), ("x", "y"), ("y", "y")).toDF("a", "b")
    val out = Checks.cohenKappa(df, "a", "b")
      .as[(Long, Double, Double, Option[Double])].head()
    assert(out === ((4L, 0.75, 0.5, Some(0.5))))
    // one shared category on both sides: pe = 1 → kappa undefined (NULL)
    val deg = Seq(("x", "x"), ("x", "x")).toDF("a", "b")
    assert(Checks.cohenKappa(deg, "a", "b")
      .as[(Long, Double, Double, Option[Double])].head()._4.isEmpty)
  }

  test("kAnonymityViolations flags sub-k groups; kAnonymize suppresses them") {
    // quasi-id groups of size 1, 2, and 3 at k=3
    val df = Seq(
      ("25", "m", 1L),
      ("30", "f", 2L), ("30", "f", 3L),
      ("40", "m", 4L), ("40", "m", 5L), ("40", "m", 6L)
    ).toDF("age", "sex", "id")
    val viol = Checks.kAnonymityViolations(df, Seq("age", "sex"), k = 3)
      .as[(String, String, Long)].collect().toSet
    assert(viol === Set(("25", "m", 1L), ("30", "f", 2L)))
    val kept = Checks.kAnonymize(df, Seq("age", "sex"), k = 3)
      .as[(String, String, Long)].collect().map(_._3).toSet
    assert(kept === Set(4L, 5L, 6L))
    // an already-anonymous table passes untouched
    assert(Checks.kAnonymityViolations(df.filter($"age" === "40"),
      Seq("age", "sex"), k = 3).isEmpty)
  }
}
