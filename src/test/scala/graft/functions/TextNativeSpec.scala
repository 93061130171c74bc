package graft.functions

import graft.SparkSpec
import graft.ops.TextOps
import org.apache.spark.sql.functions._

/** Value parity of the r6 native text expressions against the expression
  * chains they replace: graft_regexp_count vs size(regexp_extract_all) and
  * graft_text_stats-composed qualityScore vs the original four-expression
  * formula.
  */
class TextNativeSpec extends SparkSpec {
  import spark.implicits._

  private val texts = Seq(
    (1L, "The quick brown fox, 42 jumps! over the lazy dog."),
    (2L, ""),
    (3L, "   "),
    (4L, "ALLCAPS AND numbers 123 456 mixed-case Stuff?!"),
    (5L, "a a a a a repeated tokens a a"),
    (6L, "unicode Ünïcödé ß straße 東京 emoji 🎉 end"),
    (7L, "tabs\tand\nnewlines\r\nmixed   spacing"),
    (8L, "x"),
    (9L, "!!! ??? ... ,,, symbols only"),
    (10L, "Sentences. With punctuation; and: colons (parens) [and] {braces}.")
  ).toDF("id", "text")

  test("tokenCountBpe counts exactly what size(regexp_extract_all(..)) counted") {
    val rows = texts.select(
      TextOps.tokenCountBpe(col("text")).as("nat"),
      size(regexp_extract_all(lower(col("text")),
        lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))).as("ref")).collect()
    assert(rows.nonEmpty && rows.forall(r => r.getInt(0) == r.getInt(1)),
      rows.mkString("\n"))
  }

  test("qualityScore is bit-identical to the original four-expression formula") {
    def referenceQuality(text: org.apache.spark.sql.Column) = {
      val toks = split(lower(trim(text)), "\\s+")
      val n = greatest(size(toks), lit(1))
      val lenScore = least(n.cast("double") / lit(64.0), lit(1.0))
      val alphaRatio =
        (length(regexp_replace(lower(text), "[^a-z]", "")).cast("double") /
          greatest(length(text), lit(1)))
      val distinctRatio = size(array_distinct(toks)).cast("double") / n
      round((lenScore * 0.3 + alphaRatio * 0.35 + distinctRatio * 0.35), 6)
    }
    val rows = texts.select(
      TextOps.qualityScore(col("text")).as("nat"),
      referenceQuality(col("text")).as("ref")).collect()
    for (r <- rows)
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)), r.toString)
  }

  test("parity on the documents fixture") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val q = docs.select(
      TextOps.tokenCountBpe(col("text")).as("bn"),
      size(regexp_extract_all(lower(col("text")),
        lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))).as("br")).collect()
    assert(q.nonEmpty && q.forall(r => r.getInt(0) == r.getInt(1)))
  }

  test("null text stays null through both natives") {
    val df = Seq((1L, Option.empty[String])).toDF("id", "text")
    val out = df.select(TextOps.tokenCountBpe(col("text")).as("a"),
      TextOps.qualityScore(col("text")).as("b")).collect()
    assert(out(0).isNullAt(0) && out(0).isNullAt(1))
  }
}
