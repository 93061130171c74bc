package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Full-text relevance search over a document corpus, expressed as
  * dataflow: the inverted index IS the postings table ((term, doc, tf)
  * rows — a groupBy away from the raw text), and a query is a probe of
  * that table restricted to the query's terms. No serving data structure
  * is materialized; at 100 TB the postings table is the thing you would
  * persist bucketed by term, at which point a query touches only the
  * buckets its terms hash to.
  *
  * The reference has no search surface (graphio builds graphs, not
  * indexes); this module is part of the training-data toolbox built
  * alongside it — corpus-scale relevance scoring for filtering and
  * curriculum selection.
  */
object Search {

  /** Whitespace-token postings: one row per (doc, term) with its term
    * frequency. One explode + one (doc_id, term)-keyed aggregation with
    * map-side partials; text leaves the scan as tokens and never
    * shuffles whole.
    */
  def postings(docs: DataFrame, idCol: String = "doc_id",
               textCol: String = "text"): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(split(lower(trim(col(textCol))), "\\s+")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))

  /** TF-IDF keyword extraction: the k most distinctive terms per
    * document, scored tf · ln(N/df) and ranked per doc by the
    * 6-dp-ROUNDED score (ties → lexicographic term — a total order, so
    * the per-doc cut is cross-engine-deterministic). Terms appearing in
    * every document score exactly 0 and still rank behind rarer ones.
    *
    * Shape: one term-keyed df aggregation joined back onto the postings
    * (both sides shuffle on term — at corpus scale the df table is the
    * vocabulary, broadcast only if trimmed), the 1-row N via broadcast
    * cross join, then one doc-keyed window for the per-doc rank.
    */
  def tfidfTopTerms(docs: DataFrame, k: Int, idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val post = postings(docs, idCol, textCol)
    val dft = post.groupBy("term").agg(count(lit(1)).cast("double").as("_df"))
    val n = docs.agg(count(lit(1)).cast("double").as("_n"))
    val scored = post.join(dft, Seq("term"))
      .crossJoin(broadcast(n))
      .withColumn("score",
        round(col("tf").cast("double") * log(col("_n") / col("_df")), 6))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("term"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("term"), col("score"))
  }

  /** BM25 top-k: score every document containing at least one query term
    * with Okapi BM25 (`idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))`,
    * idf = ln(1 + (N−df+0.5)/(df+0.5))) and return the k best as
    * (doc_id, score) with score rounded to 6 dp, ordered by
    * (rounded score DESC, doc_id) — a total order, so the cut at k is
    * deterministic.
    *
    * Shape: the postings probe filters to the query's terms FIRST (at
    * corpus scale, a term-bucketed postings table prunes to the terms'
    * buckets), so everything downstream — the per-term df aggregate
    * (≤ |query| rows, broadcast), the doc-length join, the per-doc score
    * sum — runs on matching postings only, never the corpus. The global
    * (N, avgdl) pair rides a broadcast one-row cross join, not a driver
    * `.head()`. Scoring is one shuffle keyed on doc_id; the final top-k
    * is a TakeOrdered (per-partition heads + one driver merge of k·p
    * rows), never a full sort.
    */
  def bm25TopK(docs: DataFrame, query: Seq[String], k: Int,
               k1: Double = 1.2, b: Double = 0.75,
               idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(query.nonEmpty, "bm25TopK needs at least one query term")
    require(k > 0, s"k must be positive, got $k")
    val terms = query.map(_.toLowerCase.trim).filter(_.nonEmpty).distinct
    val post = postings(docs, idCol, textCol)
      .filter(col("term").isInCollection(terms))
    val dl = docs.select(col(idCol).as("doc_id"),
      size(split(lower(trim(col(textCol))), "\\s+")).cast("double").as("dl"))
    val stats = dl.agg(count(lit(1)).cast("double").as("n_docs"),
      avg(col("dl")).as("avgdl"))
    val dft = post.groupBy("term").agg(count(lit(1)).cast("double").as("df"))
    val idf = log(lit(1.0) +
      (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val tfNorm = col("tf").cast("double") * lit(k1 + 1.0) /
      (col("tf").cast("double") +
        lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl")))
    post
      .join(broadcast(dft), Seq("term"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .groupBy("doc_id").agg(sum(idf * tfNorm).as("_s"))
      .select(col("doc_id"), round(col("_s"), 6).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  /** Reciprocal-rank fusion — the hybrid-retrieval combiner (lexical BM25
    * run + embedding-ANN run, or any N ranked lists): each run contributes
    * 1/(rrfK + rank) per item, the fused score is the sum, and the output
    * is the top-k under the (rounded score DESC, id) total order. RRF
    * needs no score calibration between runs — only ranks — which is why
    * it is the default fusion in production hybrid search. Every input
    * run must carry a `rank` column (1-based, ties already broken).
    *
    * Shape: a union of the (id, rank) run lists — run lists are top-k-
    * sized, NOT corpus-sized — one hash aggregation on id, and a
    * TakeOrdered cut. n_runs says how many lists each winner appeared in.
    */
  def rrfFuse(runs: Seq[DataFrame], k: Int, rrfK: Int = 60,
              idCol: String = "doc_id"): DataFrame = {
    require(runs.nonEmpty, "rrfFuse needs at least one run")
    require(k > 0, s"k must be positive, got $k")
    runs.map(_.select(col(idCol), col("rank")))
      .reduce(_ unionByName _)
      .groupBy(idCol)
      .agg(round(sum(lit(1.0) / (lit(rrfK) + col("rank"))), 6).as("rrf"),
        count(lit(1)).as("n_runs"))
      .orderBy(col("rrf").desc, col(idCol))
      .limit(k)
  }

  /** Sparse ALL-PAIRS cosine similarity over tf-idf vectors — the
    * document-similarity join (related-article linking, weighted near-dup
    * beyond set Jaccard): pairs of documents whose tf-idf cosine meets the
    * threshold, candidates generated through the INVERTED INDEX (a
    * postings self-join on the term — only documents sharing a term ever
    * meet). Terms with df > `maxDf` are excluded from the vocabulary
    * itself (the standard stopword cut) — that is part of the operator's
    * DEFINITION, so the cut is exactness-preserving by construction AND
    * the skew gate: posting lists are ≤ maxDf long, so the self-join is
    * Σ df² over retained terms, never |corpus|².
    *
    * Shape: postings → df filter → weights (idf = ln(N/df), the
    * [[tfidfTopTerms]] formula; N rides a 1-row broadcast) → term-keyed
    * self-join accumulating dot products (map-side partial sums; weights
    * are slim (doc, term, w) rows, documents never shuffle) → norm join +
    * ROUNDED-6dp threshold (the cross-engine boundary rule).
    */
  def sparseCosinePairs(docs: DataFrame, threshold: Double, maxDf: Long,
                        idCol: String = "doc_id",
                        textCol: String = "text"): DataFrame = {
    require(threshold > 0, s"threshold must be positive, got $threshold")
    require(maxDf >= 1, s"maxDf must be >= 1, got $maxDf")
    val post = postings(docs, idCol, textCol)
    val dft = post.groupBy("term").agg(count(lit(1)).as("_df"))
      .filter(col("_df") <= maxDf)
    val n = docs.agg(count(lit(1)).cast("double").as("_n"))
    val w = post.join(dft, Seq("term"))
      .crossJoin(broadcast(n))
      .select(col("doc_id"), col("term"),
        (col("tf").cast("double") * log(col("_n") / col("_df"))).as("w"))
    val norms = w.groupBy("doc_id").agg(sqrt(sum(col("w") * col("w"))).as("_nrm"))
    val l = w.select(col("doc_id").as("a"), col("term"), col("w").as("_wa"))
    val r = w.select(col("doc_id").as("b"), col("term"), col("w").as("_wb"))
    val dots = l.join(r, Seq("term")).filter(col("a") < col("b"))
      .groupBy("a", "b").agg(sum(col("_wa") * col("_wb")).as("_dp"))
    dots
      .join(norms.select(col("doc_id").as("a"), col("_nrm").as("_na")), Seq("a"))
      .join(norms.select(col("doc_id").as("b"), col("_nrm").as("_nb")), Seq("b"))
      .withColumn("cos", round(col("_dp") / (col("_na") * col("_nb")), 6))
      .filter(col("cos") >= threshold)
      .select("a", "b", "cos")
  }

  /** Retrieval-quality metrics per query — the eval side of any retrieval
    * / RAG / dedup-candidate pipeline: recall@k, MRR@k (reciprocal rank of
    * the first relevant hit, 0 when none lands in the top k), and nDCG@k
    * (binary gains, DCG = Σ 1/log2(rank+1) over relevant hits, ideal DCG
    * from min(k, n_rel) perfect placements). `ranked` carries (query, item,
    * 1-based rank); `relevant` is the (query, item) ground-truth set.
    * Queries with no relevant items are dropped (their metrics are
    * undefined); queries with no RANKED rows still appear via the
    * ground-truth side with zero metrics. All ratios ROUND to 6 dp (the
    * cross-engine float contract), so the driver gate replays every
    * formula in SQL.
    *
    * Shape: both inputs are top-k-/truth-sized, not corpus-sized; one
    * equi-join on (query, item), one aggregation per side keyed on query,
    * and a broadcast-sized join back — no corpus scan, no window.
    */
  def rankingMetrics(ranked: DataFrame, relevant: DataFrame, k: Int,
                     queryCol: String = "query_id", itemCol: String = "item_id",
                     rankCol: String = "rank"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val rel = relevant.select(col(queryCol).as("query_id"),
      col(itemCol).as("item_id")).distinct()
    val nRel = rel.groupBy("query_id").agg(count(lit(1)).as("n_rel"))
    val topk = ranked.filter(col(rankCol) <= k).select(
      col(queryCol).as("query_id"), col(itemCol).as("item_id"),
      col(rankCol).cast("int").as("rank"))
    val perQ = topk.join(rel, Seq("query_id", "item_id"))
      .groupBy("query_id")
      .agg(count(lit(1)).as("hits"), min(col("rank")).as("_fr"),
        sum(lit(1.0) / log2(col("rank") + 1)).as("_dcg"))
    val idcg = aggregate(
      sequence(lit(1), least(lit(k), col("n_rel")).cast("int")),
      lit(0.0d), (acc, i) => acc + lit(1.0) / log2(i + 1))
    nRel.join(perQ, Seq("query_id"), "left_outer")
      .select(col("query_id"), col("n_rel"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        round(coalesce(col("hits"), lit(0L)) / col("n_rel").cast("double"), 6)
          .as("recall"),
        round(coalesce(lit(1.0) / col("_fr"), lit(0.0)), 6).as("mrr"),
        round(coalesce(col("_dcg"), lit(0.0)) / idcg, 6).as("ndcg"))
  }
}
