package graft.functions

import graft.SparkSpec
import graft.ops.Dedup
import org.apache.spark.sql.functions._

/** Value parity of the native one-pass shingle hasher against the retired
  * higher-order-function formulation (r6 optimization): same trim/lower,
  * same \s+ tokenization, same space-joined n-grams, same xxhash64 seed-42
  * values, first-occurrence-order distinct.
  */
class WordShingleHashesSpec extends SparkSpec {
  import spark.implicits._

  // the retired HOF form (array_distinct on gram STRINGS, then hash) —
  // hash-distinct afterwards so both forms agree even on the dedupe step
  private def hofForm(text: org.apache.spark.sql.Column, n: Int) =
    array_distinct(transform(Dedup.wordShingles(text, n), s => xxhash64(s)))

  private val nasty = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "tiny"),
    (3L, ""),
    (4L, "   "),
    (5L, "a"),
    (6L, "a b"),
    (7L, "a b c"),
    (8L, "  leading and trailing  "),
    (9L, "tab\tseparated\ttokens\there"),
    (10L, "newline\nbroken\nlines\nhere"),
    (11L, "MiXeD CaSe TOKENS Everywhere Here"),
    (12L, "Ünïcödé tökens ÄÖÜ ß straße FÉE"),
    (13L, "a b a b a b a b repeated bigrams forever and ever"),
    (14L, "double  space   runs\t\n mixed   whitespace here now"),
    (15L, "punct, marks! and? (parens) [brackets] {braces} end."),
    (16L, "числа и кириллица тоже работают здесь нормально"),
    (17L, "🎉 emoji 🚀 tokens 🌟 too 🎯 yes")
  ).toDF("doc_id", "text")

  test("native form matches the HOF form on every value, for n=3 and n=1") {
    for (n <- Seq(1, 3)) {
      val both = nasty.select(col("doc_id"),
        Dedup.wordShingleHashes(col("text"), n).as("nat"),
        hofForm(col("text"), n).as("hof"))
      val rows = both.collect()
      for (r <- rows) {
        assert(r.getSeq[Long](1) == r.getSeq[Long](2),
          s"mismatch for doc ${r.getLong(0)} n=$n:\n nat=${r.getSeq[Long](1)}\n hof=${r.getSeq[Long](2)}")
      }
    }
  }

  test("null text yields null, not a crash") {
    val df = Seq((1L, Option.empty[String]), (2L, Some("a b c d"))).toDF("id", "text")
    val out = df.select(Dedup.wordShingleHashes(col("text")).as("sh")).collect()
    assert(out(0).isNullAt(0) && !out(1).isNullAt(0))
  }

  test("runs inside whole-stage codegen (static-call fusion)") {
    val df = spark.range(50).select(
      Dedup.wordShingleHashes(concat_ws(" ", col("id").cast("string"),
        lit("alpha beta gamma delta epsilon"))).as("sh"))
    val plan = df.queryExecution.executedPlan.toString
    val cgLine = plan.linesIterator.find(_.contains("graft_word_shingle_hashes"))
    assert(cgLine.exists(_.trim.startsWith("*(")), plan)
  }

  test("hash-distinct output licenses the union-size identity") {
    // |A∪B| must equal |A|+|B|-|A∩B| for every pair of outputs
    val sh = nasty.select(col("doc_id"), Dedup.wordShingleHashes(col("text")).as("sh"))
    val l = sh.alias("l"); val r = sh.alias("r")
    val pairs = l.join(r, col("l.doc_id") < col("r.doc_id"))
      .select(
        size(array_union(col("l.sh"), col("r.sh"))).as("u"),
        (size(col("l.sh")) + size(col("r.sh")) -
          size(array_intersect(col("l.sh"), col("r.sh")))).as("u2"))
      .collect()
    assert(pairs.nonEmpty && pairs.forall(p => p.getInt(0) == p.getInt(1)))
  }
}
