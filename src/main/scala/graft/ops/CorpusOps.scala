package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-level operators for training-data pipelines: vocabulary
  * statistics, benchmark decontamination, and sequence packing.
  */
object CorpusOps {

  /** Top-k corpus vocabulary by token frequency (ties → lexicographic).
    * One explode + one hash aggregation with map-side partial counts —
    * the shuffle carries (token, partial count) per map partition, not the
    * token stream — then a parallel TakeOrdered for the top-k.
    */
  def topTokens(docs: DataFrame, k: Int, textCol: String = "text"): DataFrame =
    docs.select(explode(split(lower(trim(col(textCol))), "\\s+")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(k)

  /** Word n-grams of a text column, hashed to longs (multiplicity kept —
    * overlap only needs membership, and fixed-width longs shrink the
    * explode ~3×). Engine-portability does not matter here: both sides of
    * the overlap hash the same way inside the same engine.
    */
  private def gramHashes(text: Column, n: Int): Column =
    transform(TextOps.wordNgramsAll(text, n), g => xxhash64(g))

  /** Benchmark decontamination — drop every document sharing at least one
    * word n-gram with a benchmark/eval set (the standard pre-training
    * hygiene step; n=8 is the common contamination window, lower for short
    * documents).
    *
    * Scale shape: the benchmark side (small by construction) explodes to a
    * distinct hashed-gram table that broadcast-joins against the exploded
    * corpus grams; the only shuffle is the distinct over HIT doc ids
    * (bounded by the contaminated subset), and the final keep-filter is a
    * left-anti join of ids. Corpus text never shuffles, and the corpus-side
    * explode never materializes — it streams through the broadcast probe
    * inside one codegen stage.
    */
  def decontaminate(docs: DataFrame, benchmark: DataFrame, n: Int = 8,
                    idCol: String = "doc_id", textCol: String = "text",
                    benchTextCol: String = "text"): DataFrame = {
    require(n > 0, s"n-gram size must be positive, got $n")
    val benchGrams = benchmark
      .select(explode(gramHashes(col(benchTextCol), n)).as("g"))
      .distinct()
    val contaminated = docs
      .select(col(idCol).as("_cid"), explode(gramHashes(col(textCol), n)).as("g"))
      .join(broadcast(benchGrams), "g")
      .select("_cid").distinct()
    docs.join(contaminated, docs(idCol) === contaminated("_cid"), "left_anti")
  }

  /** [[decontaminate]] with a Bloom-sketch prefilter — the 100 TB shape:
    * the benchmark grams fold into ONE bloom filter (bytes, not a table),
    * and the corpus-side gram stream drops non-members BEFORE the exact
    * probe. Bloom filters have false POSITIVES only, and every survivor
    * still passes through the exact distinct-gram semi-join, so the result
    * is IDENTICAL to [[decontaminate]] (the driver gate checks both
    * against the same oracle) — the sketch only shrinks the probe input
    * (by ~the contamination rate). False negatives are impossible, so no
    * contaminated document can slip through.
    *
    * `expectedGrams`/`numBits` size the sketch (defaults: 4M grams in
    * 32Mbit ≈ 4 MB, ~1% FP); at real eval-set scale both knobs come from
    * the benchmark's measured gram count.
    */
  def decontaminateBloom(docs: DataFrame, benchmark: DataFrame, n: Int = 8,
                         idCol: String = "doc_id", textCol: String = "text",
                         benchTextCol: String = "text",
                         expectedGrams: Long = 1L << 22,
                         numBits: Long = 1L << 25): DataFrame = {
    require(n > 0, s"n-gram size must be positive, got $n")
    val benchGrams = benchmark
      .select(explode(gramHashes(col(benchTextCol), n)).as("g"))
      .distinct()
    // The sketch is built in ONE aggregation job and inlined as a binary
    // literal: might_contain requires a constant bloom (it caches the
    // deserialized filter per task), and a numBits/8-byte literal is the
    // same driver payload as any broadcast build side.
    val bloomBytes = benchGrams
      .agg(graft.functions.functions.bloomAgg(col("g"), expectedGrams, numBits).as("bf"))
      .head().getAs[Array[Byte]]("bf")
    val contaminated = docs
      .select(col(idCol).as("_cid"), explode(gramHashes(col(textCol), n)).as("g"))
      .filter(graft.functions.functions.mightContain(lit(bloomBytes), col("g")))
      .join(broadcast(benchGrams), "g") // exact verify kills false positives
      .select("_cid").distinct()
    docs.join(contaminated, docs(idCol) === contaminated("_cid"), "left_anti")
  }

  /** Corpus vocabulary size: the exact distinct-token count next to the
    * mergeable HyperLogLog++ estimate (`approx_count_distinct`, the
    * sketch that replaces the exact count at 10^12 tokens) and a bound on
    * their relative error — the gate that keeps the sketch path honest.
    */
  def vocabSize(docs: DataFrame, maxRelErr: Double = 0.05,
                textCol: String = "text"): DataFrame = {
    val toks = docs.select(explode(split(lower(trim(col(textCol))), "\\s+")).as("token"))
    toks.agg(
        countDistinct(col("token")).as("n_exact"),
        // sketch rsd = bound/3 — a bound equal to the sketch's own sigma
        // would breach ~1/3 of the time once past HLL's exact range
        approx_count_distinct(col("token"), maxRelErr / 3).as("_n_approx"))
      .select(col("n_exact"),
        (abs(col("_n_approx") - col("n_exact")).cast("double") / col("n_exact")
          <= maxRelErr).as("approx_ok"))
  }

  /** Per-language token-length percentiles: the exact interpolated
    * `percentile` (which buffers per-group values) next to the mergeable
    * t-digest `approx_percentile` that replaces it at corpus scale, with a
    * relative-error bound per group — the q_corpus_stats footnote made a
    * kept-honest contract. `accuracy` is Spark's t-digest knob (10000 ≈
    * default).
    */
  def tokenPercentiles(docs: DataFrame, maxRelErr: Double = 0.1,
                       groupCol: String = "lang", textCol: String = "text",
                       accuracy: Int = 10000): DataFrame = {
    val toks = size(split(trim(col(textCol)), "\\s+"))
    docs.groupBy(groupCol).agg(
        expr(s"percentile(size(split(trim($textCol), '\\\\s+')), 0.5)").as("p50_exact"),
        expr(s"percentile(size(split(trim($textCol), '\\\\s+')), 0.9)").as("p90_exact"),
        percentile_approx(toks, lit(0.5), lit(accuracy)).as("_p50_a"),
        percentile_approx(toks, lit(0.9), lit(accuracy)).as("_p90_a"))
      .select(col(groupCol),
        round(col("p50_exact"), 6).as("p50_exact"),
        round(col("p90_exact"), 6).as("p90_exact"),
        (abs(col("_p50_a") - col("p50_exact")) / col("p50_exact") <= maxRelErr &&
          abs(col("_p90_a") - col("p90_exact")) / col("p90_exact") <= maxRelErr)
          .as("approx_ok"))
  }

  /** Sequence packing — assign documents to fixed-token-budget packs, the
    * metadata pass of "concatenate and split at budget boundaries": a doc
    * belongs to the pack where its first token lands, i.e.
    * floor(running-offset / budget) over a deterministic order.
    *
    * Scale shape: a single global order would funnel the corpus through one
    * window partition, so packing is SHARDED — pack ids are (shard, index
    * within shard) flattened as shard * 2^32 + index, shard = a portable
    * hash of the id. Each shard packs independently in parallel; shard
    * count bounds per-task state. Deterministic and engine-portable (the
    * gate value-checks pack assignments against DuckDB).
    */
  def packBySize(docs: DataFrame, budgetTokens: Long, nShards: Int,
                 idCol: String = "doc_id", textCol: String = "text",
                 packCol: String = "pack_id"): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens must be positive, got $budgetTokens")
    require(nShards > 0, s"nShards must be positive, got $nShards")
    import org.apache.spark.sql.expressions.Window
    val shard = Sampling.bucket(col(idCol), salt = 11L) % nShards
    val toks = TextOps.tokenCountWs(col(textCol)).cast("long")
    val w = Window.partitionBy(col("_shard")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .withColumn("_shard", shard)
      .withColumn("_toks", toks)
      .withColumn("_offset", sum(col("_toks")).over(w) - col("_toks"))
      .withColumn(packCol,
        col("_shard") * lit(4294967296L) + floor(col("_offset") / budgetTokens))
      .drop("_shard", "_toks", "_offset")
  }

  /** Length-bucketed training batches — the padding-efficiency packer: rank
    * the corpus under the TOTAL order (token length, id), cut into
    * consecutive `batchSize` groups, so each batch holds near-equal-length
    * documents and pad-to-batch-max waste is (empirically near-) minimal —
    * the standard dynamic-batching move that recovers 20–40% of padded
    * FLOPs on mixed-length corpora. Returns (id, len, pos, batch_idx);
    * per-batch waste = Σ(batch_max − len), which the gate aggregates.
    *
    * Scale shape: the global rank is the two-pass SHARDED index
    * ([[Sampling.shufflePositions]]'s shape) with shards = CONTIGUOUS
    * LENGTH ranges, so concatenating shards reproduces the global
    * (len, id) order while no task ever windows more than ~1/nShards of
    * the corpus; the only unpartitioned window runs over the nShards-row
    * offset table.
    */
  def lengthBucketedBatches(docs: DataFrame, batchSize: Int, nShards: Int = 64,
                            idCol: String = "doc_id",
                            textCol: String = "text"): DataFrame = {
    require(batchSize > 0, s"batchSize must be positive, got $batchSize")
    require(nShards > 0, s"nShards must be positive, got $nShards")
    import org.apache.spark.sql.expressions.Window
    val lens = docs.select(col(idCol).as("id"),
      TextOps.tokenCountWs(col(textCol)).cast("long").as("len"))
    val maxRow = lens.agg(max(col("len"))).head()
    require(!maxRow.isNullAt(0),
      "lengthBucketedBatches requires a non-empty docs input (ADVICE r5: " +
        "the max-length aggregate is null on empty input)")
    val maxLen = maxRow.getLong(0)
    val width = math.max(1L, maxLen / nShards + 1L)
    val sharded = lens.withColumn("_shard", floor(col("len") / width))
    val offs = sharded.groupBy("_shard").agg(count(lit(1)).as("_n"))
      .withColumn("_off", coalesce(sum(col("_n")).over(
        Window.orderBy("_shard").rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select("_shard", "_off")
    val w = Window.partitionBy(col("_shard")).orderBy(col("len"), col("id"))
    sharded.withColumn("_rk", row_number().over(w).cast("long"))
      .join(broadcast(offs), "_shard")
      .withColumn("pos", col("_off") + col("_rk") - 1)
      .withColumn("batch_idx", floor(col("pos") / batchSize))
      .select(col("id").as(idCol), col("len"), col("pos"), col("batch_idx"))
  }

  /** Water-filling DATA-MIX solver: given integer target weights per
    * source and a total token budget, compute the per-source take that is
    * proportional to the weights EXCEPT where a source's availability
    * caps it — capped sources contribute everything they have and their
    * unused share re-levels across the rest (the water-filling fixpoint;
    * DoReMi-style mixes reduce to exactly this once weights are chosen).
    *
    * Determinism contract: weights are INTEGERS and the cap test is the
    * cross-multiplied `a·Σw ≤ remaining·w` — exact 64-bit arithmetic, no
    * float boundary — walked in (a/w, source) order; only the final take
    * of an uncapped source divides (rounded to 6 dp), so an independent
    * SQL engine replays the whole solve from the same aggregate.
    *
    * Shape: ONE corpus aggregation (per-source token sums — map-side
    * partials); the solve itself runs driver-side over the human-scale
    * source list (the literal-rate-map trade [[Sampling
    * .sampleStratified]] documents). Returns (source, avail_tokens,
    * take_tokens, rate).
    */
  def mixRates(docs: DataFrame, weights: Map[String, Long], totalTokens: Long,
               groupCol: String = "source", textCol: String = "text"): DataFrame = {
    require(totalTokens > 0, s"totalTokens must be positive, got $totalTokens")
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "weights must be non-empty and positive")
    val spark = docs.sparkSession
    import spark.implicits._
    val avail = docs.groupBy(col(groupCol).as("s"))
      .agg(sum(TextOps.tokenCountWs(col(textCol)).cast("long")).as("a"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    avail.foreach { case (s, _) =>
      require(weights.contains(s), s"no weight for source '$s'") }
    // ascending a/w: the capped sources form a prefix (single crossing)
    val items = avail.map { case (s, a) => (s, a, weights(s)) }
      .sortBy { case (s, a, wt) => (a.toDouble / wt, s) }
    var remaining = totalTokens
    var wSum = items.map(_._3).sum
    val out = items.map { case (s, a, wt) =>
      if (wSum > 0 && a * wSum <= remaining * wt) {
        // capped: take everything, re-level the rest
        remaining -= a; wSum -= wt
        (s, a, a.toDouble, 1.0)
      } else {
        val take = round6(remaining.toDouble * wt / wSum)
        (s, a, take, round6(take / a))
      }
    }
    out.toSeq.toDF(groupCol, "avail_tokens", "take_tokens", "rate")
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Tokenizer-vocabulary coverage audit per group (language/source):
    * what fraction of the token stream a top-k vocabulary covers, and the
    * OOV rate left over — the health check run before committing to a
    * vocab size. One explode + a broadcast semi-mark join against the
    * (k-row) vocabulary + one group aggregation; the token stream
    * shuffles only as (group, partial counts).
    */
  def vocabCoverage(docs: DataFrame, k: Int, groupCol: String = "lang",
                    textCol: String = "text"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val top = topTokens(docs, k, textCol)
      .select(col("token").as("tok"), lit(1L).as("_in"))
    docs.select(col(groupCol).as("grp"),
        explode(split(lower(trim(col(textCol))), "\\s+")).as("tok"))
      .join(broadcast(top), Seq("tok"), "left_outer")
      .groupBy("grp")
      .agg(count(lit(1)).as("total_tokens"),
        sum(coalesce(col("_in"), lit(0L))).as("covered_tokens"))
      .select(col("grp").as(groupCol), col("total_tokens"), col("covered_tokens"),
        round(lit(1.0) - col("covered_tokens") / col("total_tokens").cast("double"), 6)
          .as("oov_rate"))
  }

  /** Pointwise mutual information over document-level token co-occurrence:
    * for every token pair appearing together in at least one document,
    * pmi = ln(N · n_ab / (n_a · n_b)) on document frequencies — the
    * collocation / phrase-mining score. Positive ⇒ the pair co-occurs
    * more than independent-token chance.
    *
    * Shape: distinct (doc, token) membership → within-document self-join
    * via [[graft.kg.GraphAlgos.coMentionEdges]] (pairs form inside a
    * document's token set only; the degenerate-doc gate bounds the
    * per-doc quadratic) → two broadcast-friendly doc-frequency joins +
    * a 1-row N broadcast. Nothing corpus-wide ever cross-joins.
    */
  def pmiPairs(docs: DataFrame, idCol: String = "doc_id",
               textCol: String = "text", maxDocTokens: Int = 10000): DataFrame = {
    val memb = docs.select(col(idCol).as("g"),
      explode(array_distinct(split(lower(trim(col(textCol))), "\\s+"))).as("e"))
    val pairs = graft.kg.GraphAlgos.coMentionEdges(memb, groupCol = "g",
      entityCol = "e", maxGroupSize = maxDocTokens)
      .withColumnRenamed("n_groups", "n_ab")
    val freq = memb.distinct().groupBy("e").agg(count(lit(1)).as("_n"))
    val n = docs.agg(count(lit(1)).cast("double").as("_nd"))
    pairs
      .join(freq.select(col("e").as("a"), col("_n").as("_na")), Seq("a"))
      .join(freq.select(col("e").as("b"), col("_n").as("_nb")), Seq("b"))
      .crossJoin(broadcast(n))
      .select(col("a"), col("b"), col("n_ab"),
        round(log(col("_nd") * col("n_ab") / (col("_na") * col("_nb"))), 6)
          .as("pmi"))
  }

  /** Per-document contamination score against a benchmark — the graded
    * companion to [[decontaminate]]'s boolean drop (the GPT-3-style n-gram
    * overlap audit): for every document with at least one n-gram, the
    * fraction of its DISTINCT n-grams that appear anywhere in the
    * benchmark. Thresholding `overlap` reproduces common policies (drop
    * at any hit = decontaminate; flag at ≥ x% for review); the score is
    * also the audit artifact eval reports want.
    *
    * Shape: benchmark grams dedup into a broadcast membership list (add
    * the [[decontaminateBloom]] sketch in front at real scale); the corpus
    * side explodes per-doc DISTINCT gram hashes (array_distinct before the
    * explode — the doc's text never shuffles), left-joins membership, and
    * one doc-keyed aggregation emits hit counts and the ratio.
    */
  def contaminationScore(docs: DataFrame, benchmark: DataFrame, n: Int = 8,
                         idCol: String = "doc_id", textCol: String = "text",
                         benchTextCol: String = "text"): DataFrame = {
    require(n > 0, s"n-gram size must be positive, got $n")
    val benchGrams = benchmark
      .select(explode(gramHashes(col(benchTextCol), n)).as("g"))
      .distinct()
      .withColumn("_hit", lit(1))
    docs
      .select(col(idCol),
        explode(array_distinct(gramHashes(col(textCol), n))).as("g"))
      .join(broadcast(benchGrams), Seq("g"), "left")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("_hit"), lit(0))).as("n_hit"))
      .withColumn("overlap", round(col("n_hit") / col("n_grams"), 6))
  }

  /** Corpus-self-trained bigram language-model score — the CCNet-style
    * statistical quality filter: train add-one-smoothed bigram
    * probabilities p(w₂|w₁) = (c(w₁,w₂)+1)/(c(w₁)+V) on the corpus itself
    * (c(w₁) = bigrams starting with w₁, so Σ_w₂ p = 1; V = corpus distinct
    * tokens), then score each document by its mean negative log-likelihood
    * in nats. Low nll ≈ typical phrasing; high nll flags gibberish,
    * boilerplate-free noise, and language outliers — cut on a percentile.
    * Docs with < 2 tokens carry no bigram and drop out.
    *
    * Scale shape: bigrams come from one `zip_with` over the token array
    * (no positional self-join, the array is sliced once); the model is two
    * hash aggregations with map-side partials (vocab- and vocab²-bounded —
    * at web scale add a min-count floor and the counts table stays
    * broadcastable); scoring is one join on (w₁,w₂) + one per-doc
    * aggregation; V arrives as a broadcast 1-row cross join, never a
    * driver action.
    */
  def lmScore(docs: DataFrame, idCol: String = "doc_id",
              textCol: String = "text"): DataFrame = {
    val toks = docs
      .filter(length(trim(col(textCol))) > 0)
      .select(col(idCol), split(lower(trim(col(textCol))), "\\s+").as("t"))
    val bi = toks
      .filter(size(col("t")) >= 2)
      .select(col(idCol), explode(expr(
        """zip_with(slice(t, 1, size(t) - 1), slice(t, 2, size(t) - 1),
          |         (a, b) -> named_struct('w1', a, 'w2', b))""".stripMargin))
        .as("bg"))
      .select(col(idCol), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val bc = bi.groupBy("w1", "w2").agg(count(lit(1)).as("_c2"))
    val uc = bi.groupBy("w1").agg(count(lit(1)).as("_c1"))
    val v = toks.select(explode(col("t")).as("w"))
      .agg(countDistinct(col("w")).as("_v"))
    bi.join(bc, Seq("w1", "w2"))
      .join(uc, Seq("w1"))
      .crossJoin(broadcast(v))
      .withColumn("_nll", -log((col("_c2") + 1) / (col("_c1") + col("_v"))))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_bigrams"), round(avg(col("_nll")), 6).as("nll"))
  }

  /** 2-D Pareto frontier (skyline): rows not dominated on
    * (maximize `maxCol`, minimize `minCol`). Row r is dominated iff some
    * s has maxCol ≥ r's AND minCol ≤ r's with at least one strict — the
    * curation read: "no other document gives at least as much of the good
    * dimension for no more of the cost dimension". Ties on BOTH
    * dimensions are mutually non-dominating and all kept.
    *
    * Dataflow — NOT the quadratic NOT-EXISTS self-join: collapse to the
    * per-maxCol-value minimum cost (one hash aggregation), take the
    * running exclusive minimum down the maxCol order (one window over
    * DISTINCT maxCol values — orders of magnitude smaller than the
    * corpus), and keep rows matching their value's min cost where that
    * min strictly beats every higher value's. Dimensions should be exact
    * (integer or already-rounded) so cross-engine grouping is stable.
    */
  def paretoFrontier(df: DataFrame, maxCol: String, minCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col(maxCol).desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val perValue = df.groupBy(col(maxCol))
      .agg(min(col(minCol)).as("_vmin"))
      .withColumn("_better", min(col("_vmin")).over(w))
      .filter(col("_better").isNull || col("_vmin") < col("_better"))
      .select(col(maxCol), col("_vmin"))
    df.join(perValue,
      df(maxCol) === perValue(maxCol) && df(minCol) === perValue("_vmin"),
      "left_semi")
  }
}
