package graft.ops

import graft.SparkSpec

class SearchSpec extends SparkSpec {

  private def docs = {
    import spark.implicits._
    Seq(
      (1L, "x x y"),
      (2L, "x z"),
      (3L, "z z z")
    ).toDF("doc_id", "text")
  }

  test("postings: one row per (doc, term) with its tf") {
    import spark.implicits._
    val p = Search.postings(docs).as[(Long, String, Long)].collect().toSet
    assert(p === Set((1L, "x", 2L), (1L, "y", 1L),
                     (2L, "x", 1L), (2L, "z", 1L), (3L, "z", 3L)))
  }

  test("bm25TopK matches the closed-form Okapi score, ranked and cut at k") {
    import spark.implicits._
    // N=3, dl = (3, 2, 3), avgdl = 8/3; query {x}: df = 2
    val idf = math.log(1.0 + (3.0 - 2.0 + 0.5) / (2.0 + 0.5))
    def s(tf: Double, dl: Double): Double =
      idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / (8.0 / 3.0)))
    def r6(x: Double): Double = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val out = Search.bm25TopK(docs, Seq("x"), k = 10)
      .as[(Long, Double)].collect().toList
    assert(out === List(1L -> r6(s(2, 3)), 2L -> r6(s(1, 2)))) // d3 has no x
    // cut at k respects the (score DESC, doc_id) order
    val top1 = Search.bm25TopK(docs, Seq("x"), k = 1).as[(Long, Double)].collect().toList
    assert(top1 === List(1L -> r6(s(2, 3))))
    // multi-term query sums per-term scores; case-folded, duplicate terms collapse
    val multi = Search.bm25TopK(docs, Seq("X", "y", "y"), k = 10)
      .as[(Long, Double)].collect().toMap
    val idfY = math.log(1.0 + (3.0 - 1.0 + 0.5) / (1.0 + 0.5))
    assert(multi(1L) === r6(s(2, 3) + idfY * 1 * 2.2 / (1 + 1.2 * (0.25 + 0.75 * 3 / (8.0 / 3)))))
    assert(multi(2L) === r6(s(1, 2)))
  }

  test("tfidfTopTerms ranks by rounded tf*ln(N/df), term tiebreak, cut at k") {
    import spark.implicits._
    // df: x=2, y=1, z=2; N=3
    val out = Search.tfidfTopTerms(docs, k = 2)
      .as[(Long, Int, String, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(r => (r._3, r._4)).toList).toMap
    def r6(x: Double): Double = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val ln15 = math.log(3.0 / 2.0); val ln3 = math.log(3.0)
    assert(out(1L) === List("y" -> r6(ln3), "x" -> r6(2 * ln15))) // 1.0986 > 0.8109
    assert(out(2L) === List("x" -> r6(ln15), "z" -> r6(ln15)))    // tie → term order
    assert(out(3L) === List("z" -> r6(3 * ln15)))                 // only one term
  }

  test("rrfFuse: 1/(rrfK+rank) sums across runs, overlap wins") {
    import spark.implicits._
    val a = Seq((1L, 1), (2L, 2)).toDF("doc_id", "rank")
    val b = Seq((2L, 1), (3L, 2)).toDF("doc_id", "rank")
    val out = Search.rrfFuse(Seq(a, b), k = 3)
      .as[(Long, Double, Long)].collect().toList
    def r6(x: Double): Double = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out === List(
      (2L, r6(1.0 / 61 + 1.0 / 62), 2L), // in both runs → top
      (1L, r6(1.0 / 61), 1L),
      (3L, r6(1.0 / 62), 1L)))
  }

  test("sparseCosinePairs: identical docs hit 1.0; df cut removes terms") {
    import spark.implicits._
    val d = Seq((1L, "x y"), (2L, "x y"), (3L, "z"), (4L, "x q"))
      .toDF("doc_id", "text")
    // df: x=3, y=2, z=1, q=1 (N=4). maxDf=3 keeps all.
    val out = Search.sparseCosinePairs(d, threshold = 0.5, maxDf = 3)
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(out((1L, 2L)) === 1.0) // identical vectors
    // (1,4) share only x: cos = wx² / (|1|·|4|) — below 0.5 since y and q
    // carry higher idf than the common x
    assert(!out.contains((1L, 4L)) && !out.contains((1L, 3L)))
    // df <= 1 drops x and y entirely: docs 1/2 have empty vectors → no pairs
    assert(Search.sparseCosinePairs(d, threshold = 0.1, maxDf = 1).isEmpty)
  }

  test("rankingMetrics: recall@k, MRR, binary nDCG, zero-hit query") {
    import spark.implicits._
    def r6(x: Double): Double = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def lg2(x: Double): Double = math.log(x) / math.log(2.0)
    val ranked = Seq(
      (1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3), // q1: hits at ranks 2 and 3
      (2L, 20L, 1), (2L, 21L, 2)                // q2: no hits in top k
    ).toDF("query_id", "item_id", "rank")
    val rel = Seq(
      (1L, 11L), (1L, 12L), (1L, 99L),          // n_rel = 3
      (2L, 98L), (2L, 99L)                      // n_rel = 2, none ranked
    ).toDF("query_id", "item_id")
    val out = Search.rankingMetrics(ranked, rel, k = 3)
      .as[(Long, Long, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    // q1: recall 2/3, MRR 1/2, DCG = 1/log2(3) + 1/log2(4),
    //     IDCG (3 relevant, k=3) = 1 + 1/log2(3) + 1/log2(4)
    val dcg = 1 / lg2(3) + 1 / lg2(4)
    val idcg = 1.0 + 1 / lg2(3) + 1 / lg2(4)
    assert(out(1L) === ((1L, 3L, 2L, r6(2.0 / 3), 0.5, r6(dcg / idcg))))
    // q2: ground truth exists but nothing ranked hit → all-zero metrics
    assert(out(2L) === ((2L, 2L, 0L, 0.0, 0.0, 0.0)))
  }
}
