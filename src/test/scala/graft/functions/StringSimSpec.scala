package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class StringSimSpec extends SparkSpec {
  import spark.implicits._

  private def jw(a: String, b: String): Double =
    JaroWinkler.similarity(UTF8String.fromString(a), UTF8String.fromString(b))

  test("JaroWinkler matches the classic published values") {
    assert(math.abs(jw("MARTHA", "MARHTA") - 0.9611111111) < 1e-9)
    assert(math.abs(jw("DWAYNE", "DUANE") - 0.84) < 1e-9)
    assert(math.abs(jw("DIXON", "DICKSONX") - 0.8133333333) < 1e-9)
    assert(math.abs(jw("JELLYFISH", "SMELLYFISH") - 0.8962962963) < 1e-9)
  }

  test("JaroWinkler matches DuckDB-probed edge semantics") {
    // empirically pinned against DuckDB jaro_winkler_similarity:
    assert(jw("", "") == 0.0)          // both empty -> 0, NOT 1
    assert(jw("abc", "") == 0.0)
    assert(jw("a", "b") == 0.0)
    assert(jw("abc", "abc") == 1.0)
    assert(jw("ab", "ba") == 0.0)      // window 0, no matches
    // boost NOT applied when jaro <= 0.7 despite a 2-char common prefix
    assert(math.abs(jw("ABCDXX", "ABYYYY") - 0.5555555556) < 1e-9)
    // prefix capped at 4: jaro 0.7333..., jw = jaro + 4*0.1*(1-jaro)
    assert(math.abs(jw("PREFIXaaaa", "PREFIXbbbb") - 0.84) < 1e-9)
    assert(math.abs(jw("AB", "ABCDEFGH") - 0.80) < 1e-9)
    // byte-level (not codepoint) matching, probed on DuckDB: 0.8666...
    val j = JaroWinkler.similarity(
      UTF8String.fromString("éabc"), UTF8String.fromString("aébc"))
    // jaro only (no common first byte after, prefix 0; jaro < ... ) — probe said 0.8666667 jaro, jw boost: first bytes differ -> prefix 0 -> jw = jaro
    assert(math.abs(j - 0.8666666667) < 1e-9)
  }

  test("codegen and interpreted paths agree, and nulls propagate") {
    val df = Seq(
      ("MARTHA", "MARHTA"), ("DWAYNE", "DUANE"), ("hello world", "hello wrold"),
      ("same", "same"), ("x", "y"), ("", ""), ("éabc", "aébc")
    ).toDF("a", "b")
    val viaSql = df.selectExpr("graft_jaro_winkler(a, b) AS jw").as[Double].collect()
    val expected = df.collect().map(r => jw(r.getString(0), r.getString(1)))
    viaSql.zip(expected).foreach { case (g, e) => assert(math.abs(g - e) < 1e-12) }

    val withNull = Seq((Some("a"), None: Option[String]), (None: Option[String], Some("b")))
      .toDF("a", "b")
      .selectExpr("graft_jaro_winkler(a, b) AS jw").collect()
    assert(withNull.forall(_.isNullAt(0)))
  }

  test("jaroScoredPairs rides the score on the Levenshtein-gated pair set") {
    val df = Seq("martha", "marhta", "dwayne", "duane", "zebra")
      .toDF("name")
    val out = graft.kg.Canonicalize.jaroScoredPairs(df, "name", maxDist = 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getDouble(3)))
    // blocked by first char: (duane, dwayne) dist 2; (marhta, martha) dist 2
    assert(out.length == 2)
    val m = out.map(t => (t._1, t._2) -> t._4).toMap
    assert(math.abs(m(("duane", "dwayne")) - jw("duane", "dwayne")) < 1e-12)
    assert(math.abs(m(("marhta", "martha")) - jw("marhta", "martha")) < 1e-12)
  }
}
