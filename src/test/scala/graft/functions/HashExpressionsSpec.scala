package graft.functions

import graft.SparkSpec
import graft.ops.Dedup
import org.apache.spark.sql.functions._

class HashExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"),
    (3L, "completely different words in this one entirely"),
    (4L, "tiny"),
    (5L, "a b a b a b a b repeated bigrams forever and ever")
  ).toDF("doc_id", "text")

  test("MinHashSig is bit-identical to the higher-order-function formulation") {
    val sh = docs.select(col("doc_id"), Dedup.wordShingleHashes(col("text")).as("_sh"))
    val native = sh.select(col("doc_id"),
      functions.minhashSig(col("_sh"), 32).as("sig"))
    val hof = sh.select(col("doc_id"), expr(
      """transform(sequence(0, 31),
        |  j -> array_min(transform(_sh, s -> xxhash64(s, j))))""".stripMargin).as("sig"))
    val n = native.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val h = hof.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(n == h)
  }

  test("SimHash64 is bit-identical to the explode + 64-column aggregation formulation") {
    val native = Dedup.simhash(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the retired aggregation form, reproduced inline as the reference
    val sh = docs.select(col("doc_id").as("id"),
      explode(Dedup.wordShingleHashes(col("text"))).as("h"))
    val bitCols = (0 until 64).map { j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$j")
    }
    val agg = sh.groupBy("id").agg(bitCols.head, bitCols.tail: _*)
    val sig = (0 until 64).map(j =>
      when(col(s"b$j") > 0, shiftleft(lit(1L), j)).otherwise(lit(0L)))
      .reduce((a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) => a.bitwiseOR(b))
    val reference = agg.select(col("id"), sig.as("simhash")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(native == reference)
  }

  test("simhash is now a zero-shuffle projection (no Exchange, no Aggregate)") {
    val plan = Dedup.simhash(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("Aggregate"), plan)
  }

  test("native expressions run inside whole-stage codegen") {
    // spark.range (not a LocalRelation) so the optimizer can't constant-fold
    // the whole query away into a LocalTableScan
    val sh = spark.range(100).select(
      Dedup.wordShingleHashes(concat_ws(" ", col("id").cast("string"),
        lit("alpha beta gamma delta"))).as("_sh"))
    val plan = sh.select(functions.minhashSig(col("_sh"), 32),
      functions.simhash64(col("_sh"))).queryExecution.executedPlan.toString
    // the `*(n)` prefix is the WholeStageCodegen marker in the simple form;
    // the projection carrying both native expressions must be inside one
    val cgLine = plan.linesIterator.find(_.contains("graft_minhash_sig"))
    assert(cgLine.exists(_.trim.startsWith("*(")), plan)
  }

  test("SQL face: functions resolve via the session extension") {
    docs.createOrReplaceTempView("hx_docs")
    val out = spark.sql(
      """SELECT doc_id, graft_simhash64(transform(split(lower(text), ' '), w -> xxhash64(w))) AS s
        |FROM hx_docs""".stripMargin).collect()
    assert(out.length == 5 && out.forall(!_.isNullAt(1)))
  }

  test("type errors are analysis-time, not runtime") {
    val e = intercept[Exception] {
      docs.select(functions.simhash64(col("text"))).collect()
    }
    assert(e.getMessage.contains("graft_simhash64") || e.getMessage.toLowerCase.contains("type"))
  }
}
