package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("token counts: whitespace and BPE-ish") {
    val df = Seq((1L, "Hello world, 42 foo-bar")).toDF("id", "text")
      .select(TextOps.tokenCountWs(col("text")).as("ws"),
        TextOps.tokenCountBpe(col("text")).as("bpe"))
    val r = df.head()
    assert(r.getInt(0) == 4)
    // lower: "hello world, 42 foo-bar" → [hello][world][,][42][foo][-][bar] = 7
    assert(r.getInt(1) == 7)
  }

  test("language id picks the language with most marker hits") {
    val df = Seq(
      (1L, "the cat and the dog of the house is that"),
      (2L, "el perro y la casa de los gatos del barrio que"),
      (3L, "le chat et les maisons des chiens est un"),
      (4L, "der hund und die katze ist von den haus ein")
    ).toDF("id", "text")
    val out = df.select(col("id"), TextOps.langId(col("text")).as("lang"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "en", 2L -> "es", 3L -> "fr", 4L -> "de"))
  }

  test("quality score: clean prose beats repetitive junk") {
    val df = Seq(
      (1L, "a sensible sentence with varied vocabulary and reasonable structure for scoring"),
      (2L, "spam spam spam spam spam spam spam spam spam spam spam spam")
    ).toDF("id", "text")
    val q = df.select(col("id"), TextOps.qualityScore(col("text")).as("q"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(q(1L) > q(2L))
  }

  test("fingerprint is order-sensitive and deterministic") {
    val df = Seq(
      (1L, "alpha beta gamma"), (2L, "alpha beta gamma"), (3L, "gamma beta alpha")
    ).toDF("id", "text")
    val fp = df.select(col("id"), TextOps.fingerprint(col("text")).as("f"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) == fp(2L))
    assert(fp(1L) != fp(3L))
  }

  test("annotate adds all metric columns") {
    val out = TextOps.annotate(Seq((1L, "some text here")).toDF("doc_id", "text"))
    assert(Set("n_tokens_ws", "n_tokens_bpe", "lang_pred", "quality", "fingerprint")
      .subsetOf(out.columns.toSet))
  }
}
