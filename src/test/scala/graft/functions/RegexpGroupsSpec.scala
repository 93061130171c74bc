package graft.functions

import graft.SparkSpec
import graft.kg.{Corpus, TranscriptGen}
import org.apache.spark.sql.functions._

/** Parity of the native one-pass group extraction with the retired
  * built-in two-pass form (regexp_extract_all + regexp_replace + split) —
  * the two must be bit-identical so the extraction stage's gate results
  * are unchanged.
  */
class RegexpGroupsSpec extends SparkSpec {
  import spark.implicits._

  private val R = Corpus.TripleRegex

  /** The retired two-pass form, kept here as the parity oracle. */
  private def twoPass(c: org.apache.spark.sql.Column) = {
    val D = ""
    transform(
      regexp_extract_all(c, lit(R), lit(0)),
      m => split(regexp_replace(m, R, s"$$1$D$$2$D$$3"), D))
  }

  test("bit-identical to the two-pass built-in form on the generated corpus") {
    val turns = TranscriptGen.turns(spark, 3000, 8).toDF()
    val native = turns.select(col("text"),
      transform(graft.functions.functions.regexpGroups(col("text"), R),
        g => array(g.getField("g1"), g.getField("g2"), g.getField("g3"))).as("gs"))
    val oracle = turns.select(col("text"), twoPass(col("text")).as("gs"))
    assert(native.exceptAll(oracle).isEmpty && oracle.exceptAll(native).isEmpty)
  }

  test("no-match, empty and null inputs") {
    val df = Seq(Some("nothing to see here"), Some(""), None).toDF("text")
    val out = df.select(
      graft.functions.functions.regexpGroups(col("text"), R).as("gs"))
      .collect()
    assert(out(0).getSeq[Any](0).isEmpty)
    assert(out(1).getSeq[Any](0).isEmpty)
    assert(out(2).isNullAt(0))
  }

  test("non-participating optional group yields empty string (regexp_replace parity)") {
    val df = Seq("xa xb x").toDF("text")
    val row = df.select(
      graft.functions.functions.regexpGroups(col("text"), "x(a)?(b)?").as("gs"))
      .selectExpr("inline(gs)").collect()
    assert(row.map(r => (r.getString(0), r.getString(1))).toSeq ===
      Seq(("a", ""), ("", "b"), ("", "")))
  }

  test("non-ASCII text takes the decoded-String fallback and still extracts correctly") {
    // multi-byte chars BEFORE the match shift byte offsets vs char offsets —
    // the zero-copy ASCII fast path would mis-slice here, so the fallback
    // must kick in (ASCII check is per-row)
    val df = Seq("préambule — Alice works at Acme.", "Alice works at Acme.").toDF("text")
    val rows = df.select(explode(
        graft.functions.functions.regexpGroups(col("text"), R)).as("g"))
      .select("g.g1", "g.g2", "g.g3").as[(String, String, String)].collect()
    assert(rows.toSeq === Seq(
      ("Alice", "works at", "Acme"), ("Alice", "works at", "Acme")))
  }

  test("adjacent matches are non-overlapping left-to-right (Matcher.find semantics)") {
    val df = Seq("Alice works at Acme. Bob uses spark.").toDF("text")
    val rows = df.select(explode(
        graft.functions.functions.regexpGroups(col("text"), R)).as("g"))
      .select("g.g1", "g.g2", "g.g3").as[(String, String, String)].collect()
    assert(rows.toSeq === Seq(("Alice", "works at", "Acme"), ("Bob", "uses", "spark")))
  }
}
