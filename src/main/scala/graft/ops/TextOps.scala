package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines, all
  * built from codegen'd native functions (no UDFs): token counting,
  * language-ID heuristics, quality scoring, document fingerprinting.
  * Every op is a narrow projection — at 100 TB the scan reads only `text`
  * (column pruning) and the ops run inside one WholeStageCodegen span with
  * zero shuffles.
  */
object TextOps {

  /** Whitespace token count. */
  def tokenCountWs(text: Column): Column =
    size(split(trim(text), "\\s+"))

  /** BPE-ish subword count: runs of letters, runs of digits, or single
    * non-space symbols — the standard pre-tokenizer shape.
    */
  def tokenCountBpe(text: Column): Column =
    // r6: count-only native regex — the regexp_extract_all form allocated
    // a string per matched token just to take size(); same engine, same
    // non-overlapping find() semantics, identical counts (TextNativeSpec)
    graft.functions.functions.regexpCount(lower(text), "[a-z]+|[0-9]+|[^a-z0-9\\s]")

  /** Stopword-hit ratio for a given stopword list: fraction of whitespace
    * tokens that are in the list.
    */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val toks = split(lower(trim(text)), "\\s+")
    val hits = size(filter(toks, t => t.isin(stopwords.map(lit): _*)))
    hits.cast("double") / greatest(size(toks), lit(1))
  }

  /** n-gram-heuristic language ID: scores each candidate language by its
    * marker-token hit ratio and returns the argmax (ties → first). The
    * marker lists are tiny and inlined into the plan as literals, so the
    * whole classifier is a single codegen'd projection.
    */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "that"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "los", "del"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "un", "est"),
    "de" -> Seq("der", "die", "und", "das", "ist", "von", "den", "ein")
  )

  def langIdScore(text: Column, lang: String): Column =
    stopwordRatio(text, langMarkers(lang))

  def langId(text: Column): Column = {
    // build struct array (score, lang), take max — array_max on structs
    // compares lexicographically (score first)
    val scored = array(langMarkers.keys.toSeq.sorted.map(l =>
      struct(langIdScore(text, l).as("score"), lit(l).as("lang"))): _*)
    array_max(scored).getField("lang")
  }

  /** Composite quality score in [0,1]: length sweet-spot, alpha ratio,
    * repetition penalty (distinct-token ratio), mean word length sanity.
    */
  def qualityScore(text: Column): Column = {
    // r6: the four integer inputs (token count, string-distinct token
    // count, a-z codepoint count of the lowered text, codepoint length)
    // come from ONE native pass (graft_text_stats) instead of a split +
    // array_distinct + regexp_replace string rebuild per row; the formula
    // below is the same Spark arithmetic over the same integers, so the
    // rounded score is bit-identical (TextNativeSpec + the q_quality gate)
    val st = graft.functions.functions.textStats(text)
    val n = greatest(st.getField("n_toks"), lit(1))
    val lenScore = least(n.cast("double") / lit(64.0), lit(1.0))
    val alphaRatio =
      st.getField("alpha_len").cast("double") / greatest(st.getField("text_len"), lit(1))
    val distinctRatio = st.getField("n_distinct").cast("double") / n
    round((lenScore * 0.3 + alphaRatio * 0.35 + distinctRatio * 0.35), 6)
  }

  /** Word n-grams WITH multiplicity (no dedup) — repetition analysis needs
    * to see every occurrence. Documents with < n tokens yield an empty list.
    */
  def wordNgramsAll(text: Column, n: Int): Column = {
    val toks = split(lower(trim(text)), "\\s+")
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(0), size(toks) - n),
        i => array_join(slice(toks, i + 1, lit(n)), " ")))
  }

  /** Fraction of word n-grams that are repeats of an earlier occurrence:
    * 1 - distinct/total (0.0 for docs shorter than n tokens). The
    * Gopher-style "duplicate n-gram fraction" boilerplate signal, as a
    * single codegen'd projection — no explode, no shuffle.
    */
  def dupNgramFraction(text: Column, n: Int = 2): Column = {
    val grams = wordNgramsAll(text, n)
    when(size(grams) <= 0, lit(0.0d))
      .otherwise(lit(1.0d) -
        size(array_distinct(grams)).cast("double") / size(grams))
  }

  /** Fraction of tokens taken by the single most frequent token — the
    * "top word" repetition signal. O(tokens × distinct) per document via
    * nested higher-order functions: fine at document granularity (hundreds
    * of tokens) and it keeps the op shuffle-free; a corpus-level explode +
    * groupBy would shuffle every token to answer a per-document question.
    */
  def topTokenFraction(text: Column): Column = {
    val toks = split(lower(trim(text)), "\\s+")
    val maxCount = array_max(transform(array_distinct(toks),
      d => size(filter(toks, t => t === d))))
    maxCount.cast("double") / greatest(size(toks), lit(1))
  }

  /** Repetition-based quality gate: true for documents under both the
    * duplicate-bigram and top-token thresholds (Gopher-style defaults).
    */
  def repetitionOk(text: Column, maxDupBigram: Double = 0.2,
                   maxTopToken: Double = 0.3): Column =
    (dupNgramFraction(text, 2) <= maxDupBigram) &&
      (topTokenFraction(text) <= maxTopToken)

  // ---------- PII / boilerplate scrubbing ----------

  /** Scrub patterns, applied IN THIS ORDER (URL first so addresses inside
    * URLs are consumed by the URL rule, exactly once). The regexes stay in
    * the common Java-regex ∩ RE2 dialect (character classes, `\b`, `\d`,
    * `\S`, bounded repeats — no lookahead/backrefs), so any engine applying
    * the same ordered rewrites produces the same text; that portability is
    * what the driver gate value-checks.
    */
  val ScrubRules: Seq[(String, String)] = Seq(
    "https?://\\S+" -> "<URL>",
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b" -> "<IP>",
    "\\b\\d{7,}\\b" -> "<NUM>"
  )

  /** Replace URLs, emails, IPv4 addresses, and long digit runs with typed
    * placeholder tokens — the standard pre-training PII/noise scrub. Chained
    * native `regexp_replace` (global by construction): one codegen'd
    * projection, zero shuffles, scan reads only the text column.
    */
  def scrubPii(text: Column): Column =
    ScrubRules.foldLeft(text) { case (c, (re, token)) =>
      regexp_replace(c, re, token)
    }

  private val FpMod = 1000000007L

  /** Portable per-token hash: polynomial over the token's code points
    * (init 7, base 131, mod 1e9+7). Pure arithmetic on code points — any
    * engine folding the same characters left-to-right gets the same value,
    * which is what lets the driver gate value-check fingerprints against a
    * different engine (an xxhash-based variant is engine-specific).
    */
  private def tokenHash(t: Column): Column =
    aggregate(split(t, ""), lit(7L),
      // acc < 1e9+7, codepoint < 2^21 ⇒ acc*131 + c < 2^38: ANSI-safe
      (acc, c) => pmod(acc * lit(131L) + ascii(c), lit(FpMod)))

  /** Deterministic document fingerprint: polynomial rolling hash over the
    * whitespace tokens' code-point hashes (base 31, mod 1e9+7), computed
    * with the `aggregate` higher-order function — order-sensitive,
    * shuffle-free, and engine-portable (value-checked vs DuckDB).
    */
  def fingerprint(text: Column): Column =
    aggregate(
      split(trim(text), "\\s+"),
      lit(0L),
      (acc, t) => pmod(acc * lit(31L) + tokenHash(t), lit(FpMod))
    )

  /** Sliding-window document chunking — the context-length splitter: each
    * document's whitespace tokens become windows of `maxTokens` starting
    * every `maxTokens - overlap` tokens, so consecutive chunks share
    * `overlap` tokens and no token is dropped. Emits (doc_id, chunk_idx,
    * chunk_text, n_tok); documents with no tokens emit nothing. Windows
    * stop advancing once one reaches the final token, so the last window
    * may be short but is never redundant (a document at most `maxTokens`
    * long is exactly one chunk).
    *
    * Shape: a zero-shuffle codegen'd projection — split, a `sequence` of
    * window starts, `posexplode`, `slice`, `concat_ws`. At 10^12 documents
    * this is scan → flatMap, embarrassingly parallel; output size is
    * input·(1 + overlap/stride) and nothing ever leaves its partition.
    */
  def chunkDocuments(docs: DataFrame, maxTokens: Int, overlap: Int,
                     idCol: String = "doc_id",
                     textCol: String = "text"): DataFrame = {
    require(maxTokens > 0, "maxTokens must be positive")
    require(overlap >= 0 && overlap < maxTokens,
      s"overlap must be in [0, maxTokens), got $overlap")
    val stride = maxTokens - overlap
    docs
      .filter(length(trim(col(textCol))) > 0)
      .select(col(idCol), split(trim(col(textCol)), "\\s+").as("_toks"))
      .select(col(idCol), col("_toks"),
        // last window index = ceil((n - maxTokens) / stride), floored at 0
        explode(sequence(lit(0),
          greatest(lit(0L), floor((size(col("_toks")) - maxTokens + stride - 1)
            / lit(stride))).cast("int"))).as("chunk_idx"))
      .select(col(idCol), col("chunk_idx"),
        concat_ws(" ",
          slice(col("_toks"), col("chunk_idx") * stride + 1, lit(maxTokens)))
          .as("chunk_text"),
        size(slice(col("_toks"), col("chunk_idx") * stride + 1, lit(maxTokens)))
          .as("n_tok"))
  }

  /** Convenience: annotate a documents frame with all text metrics. */
  def annotate(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .withColumn("n_tokens_ws", tokenCountWs(col(textCol)))
      .withColumn("n_tokens_bpe", tokenCountBpe(col(textCol)))
      .withColumn("lang_pred", langId(col(textCol)))
      .withColumn("quality", qualityScore(col(textCol)))
      .withColumn("fingerprint", fingerprint(col(textCol)))

  /** Dialogue-integrity stats per conversation: turn count, distinct
    * roles, and the number of ADJACENT same-role turn pairs under the
    * stable (conv, turn_idx) order — a well-formed two-party dialogue has
    * zero; spikes flag merged/duplicated turns before they poison a
    * training mix. One conversation-keyed window (lag) + one aggregation
    * on the same key — a single exchange.
    */
  def dialogueStats(turns: DataFrame, convCol: String = "conv_id",
                    idxCol: String = "turn_idx",
                    roleCol: String = "role"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(convCol).orderBy(col(idxCol))
    turns
      .withColumn("_prev", lag(col(roleCol), 1).over(w))
      .groupBy(col(convCol))
      .agg(count(lit(1)).as("n_turns"),
        countDistinct(col(roleCol)).as("n_roles"),
        sum(when(col("_prev") === col(roleCol), 1).otherwise(0))
          .as("same_role_adjacent"))
  }

  /** Hashing-trick bag-of-words — fixed-dimension sparse term-count
    * features per document: every whitespace token lands in bucket
    * `tokenHash(token) mod dim` and the features are the per-(doc,
    * bucket) counts. The vocabulary-free featurizer: no dictionary to
    * build, broadcast, or keep consistent across a 10^12-token corpus,
    * and the output width is capped at `dim` regardless of vocabulary
    * growth. Uses the engine-portable polynomial [[tokenHash]] (NOT
    * xxhash) so a different engine folding the same code points gets
    * the same buckets — the property the driver gate value-checks.
    *
    * Shape: explode + one (doc, bucket)-keyed count with map-side
    * partials; text never shuffles.
    */
  def hashFeatures(docs: DataFrame, dim: Int, idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame = {
    require(dim >= 2, s"dim must be >= 2, got $dim")
    docs.select(col(idCol).as("doc_id"),
        explode(split(lower(trim(col(textCol))), "\\s+")).as("_t"))
      .select(col("doc_id"),
        pmod(tokenHash(col("_t")), lit(dim.toLong)).cast("int").as("bucket"))
      .groupBy("doc_id", "bucket").agg(count(lit(1)).as("n"))
  }

  /** Rolling dialogue-context assembly over ordered conversation turns:
    * every turn gains a `context` column holding its previous `k` turns
    * rendered `role: text` and newline-joined — the prompt-context
    * builder for transcript training data (first turns get the shorter
    * prefix; turn 0 gets ""). `idxCol` must totally order turns within a
    * conversation (the per-row invariant the north rule pins: per-turn
    * text equality under stable (conv_id, turn_idx) ordering).
    *
    * Shape: ONE shuffle on the conversation key + a per-partition sort;
    * the ROWS frame bounds window state to k rows per turn, and the
    * frame order makes the concatenated bytes deterministic.
    */
  def assembleContext(turns: DataFrame, k: Int, convCol: String = "conv_id",
                      idxCol: String = "turn_idx", roleCol: String = "role",
                      textCol: String = "text"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(convCol).orderBy(col(idxCol))
      .rowsBetween(-k, -1)
    turns.withColumn("context", concat_ws("\n",
      collect_list(concat(col(roleCol), lit(": "), col(textCol))).over(w)))
  }

  /** BPE-merge SEGMENTATION (the encoder half of byte-pair encoding):
    * lower-cased whitespace words are exploded to space-joined character
    * sequences and the merge list is applied IN ORDER, each merge being
    * one leftmost-non-overlapping `replace(" a b ", " ab ")` pass over
    * the sentinel-padded sequence. That single-pass replace is the
    * PORTABLE CONTRACT: Spark's `replace` and DuckDB's `replace` share
    * leftmost-non-overlapping semantics byte-for-byte, so a SQL oracle
    * reproduces every segmentation exactly. (Canonical BPE re-scans after
    * each merged occurrence, which only differs on self-overlapping
    * repeats like "a a a" — a deviation this engine accepts for
    * cross-engine determinism, same spirit as the rounded-Lloyd k-means
    * contract.)
    *
    * Returns one string per document: words joined by NEWLINES, tokens
    * within a word by single spaces — both the token stream and the
    * word boundaries are visible to a value-exact gate, and the newline
    * separator can never collide with a token (words were split on
    * whitespace, so no token contains any). Pure codegen'd projection
    * (regexp char-split + a fixed replace chain inside one `transform`),
    * zero shuffles.
    */
  def bpeSegment(text: Column, merges: Seq[(String, String)]): Column = {
    require(merges.nonEmpty, "bpeSegment needs at least one merge")
    merges.foreach { case (a, b) =>
      require(a.nonEmpty && b.nonEmpty && !a.contains(" ") && !b.contains(" "),
        s"merge tokens must be non-empty and space-free, got ($a, $b)")
    }
    val words = split(lower(trim(text)), "\\s+")
    val segWord = (w: Column) => {
      val chars = concat(lit(" "), trim(regexp_replace(w, "(.)", "$1 ")), lit(" "))
      val merged = merges.foldLeft(chars) { case (s, (a, b)) =>
        call_function("replace", s, lit(s" $a $b "), lit(s" $a$b "))
      }
      trim(merged)
    }
    concat_ws("\n", transform(words, segWord))
  }

  /** Total BPE token count per document under the same merge list —
    * tokens are separated by spaces within a word and newlines between
    * words, neither of which can occur inside a token.
    */
  def bpeTokenCount(text: Column, merges: Seq[(String, String)]): Column =
    size(split(bpeSegment(text, merges), "[\n ]"))

  /** Winnowing fingerprints (Schleimer/Wilkerson/Aiken, the MOSS
    * algorithm): position-aware LOCAL fingerprints with a guarantee the
    * global sketches (minhash/simhash) cannot give — any shared token run
    * of length ≥ w+k−1 between two documents shares at least one selected
    * fingerprint. Per document: token k-gram rolling hashes by position,
    * then from every window of `w` consecutive grams keep the minimum
    * (ties → RIGHTMOST position, the standard robust-winnowing rule),
    * deduplicated.
    *
    * Everything is exact integer arithmetic on the PORTABLE polynomial
    * hash (mod 1e9+7), and the rightmost-tie window minimum is computed
    * over a single encoded long `gram·2²⁰ + (2²⁰−1 − pos)` (min ⇒
    * smallest gram hash, then largest position) — one ROWS-frame window
    * min, no per-window explode, value-exact on any engine. Documents
    * beyond 2²⁰ tokens would overflow the position field — split such
    * documents upstream (chunking) before fingerprinting.
    *
    * Shape: one codegen'd projection builds the gram array (token hashes
    * folded once per gram), one doc-keyed window pass selects; the
    * output is (doc_id, print, pos) — join prints across documents for
    * plagiarism/copy-span detection.
    */
  def winnow(docs: DataFrame, k: Int, w: Int, idCol: String = "doc_id",
             textCol: String = "text"): DataFrame = {
    require(k >= 1 && k <= 64, s"k must be in [1,64], got $k")
    require(w >= 1 && w <= 1024, s"w must be in [1,1024], got $w")
    val th = transform(split(lower(trim(col(textCol))), "\\s+"), t => tokenHash(t))
    val grams = when(size(col("_th")) >= k,
      transform(sequence(lit(0), size(col("_th")) - k),
        i => aggregate(slice(col("_th"), i + 1, lit(k)), lit(7L),
          (acc, x) => pmod(acc * lit(131L) + x, lit(FpMod)))))
      .otherwise(array().cast("array<bigint>"))
    val coded = docs.select(col(idCol).as("doc_id"), th.as("_th"))
      .select(col("doc_id"), grams.as("_g"))
      .select(col("doc_id"), size(col("_g")).as("_ng"),
        posexplode(col("_g")).as(Seq("gpos", "g")))
      .withColumn("_code",
        col("g") * lit(1048576L) + (lit(1048575L) - col("gpos")))
    val fw = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("gpos")
      .rowsBetween(org.apache.spark.sql.expressions.Window.currentRow, w - 1)
    coded
      .withColumn("_mc", min(col("_code")).over(fw))
      // windows START at positions 0..ng-w (one clamped window when ng<w)
      .filter(col("gpos") <= greatest(col("_ng") - w, lit(0)))
      .select(col("doc_id"),
        expr("_mc div 1048576L").as("print"),
        (lit(1048575L) - pmod(col("_mc"), lit(1048576L))).cast("int").as("pos"))
      .distinct()
  }

  /** Document pairs sharing winnowed fingerprints: the copy-span detector
    * over [[winnow]] output — n_shared distinct prints per pair, kept at
    * ≥ `minShared` (1 shared print ⇐ a common run of w+k−1 tokens). The
    * join is keyed on the PRINT value: cost is Σ per-print doc-count², so
    * `maxPrintDocs` drops degenerate boilerplate prints (the co-mention
    * group-size gate, same spirit) before they go quadratic.
    */
  def winnowPairs(prints: DataFrame, minShared: Long = 1,
                  maxPrintDocs: Int = 10000): DataFrame = {
    require(minShared >= 1, s"minShared must be >= 1, got $minShared")
    require(maxPrintDocs > 1, s"maxPrintDocs must be > 1, got $maxPrintDocs")
    val p = prints.select(col("doc_id"), col("print")).distinct()
      .withColumn("_n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("print")))
      .filter(col("_n") <= maxPrintDocs)
      .drop("_n")
    val l = p.alias("l"); val r = p.alias("r")
    l.join(r, col("l.print") === col("r.print") && col("l.doc_id") < col("r.doc_id"))
      .groupBy(col("l.doc_id").as("a"), col("r.doc_id").as("b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** BPE-merge TRAINER: learns `numMerges` merges from the corpus by the
    * classic greedy loop — count adjacent token pairs over the current
    * segmentation of every word occurrence, take the most frequent pair
    * (ties → lexicographically smallest by UTF-8 bytes, a total order so
    * the result is a pure function of the corpus), merge it everywhere,
    * repeat. Pair counts weigh by word frequency over the DISTINCT-word
    * table, so the corpus text is segmented once, never per round.
    *
    * Size-adaptive execution (the ConnectedComponents/Tarjan cutover
    * rule): the distinct-word frequency table is vocabulary-sized — tiny
    * relative to any corpus — so when it has <= `localThreshold` rows it
    * is collected ONCE and the greedy loop runs driver-side in memory
    * (one Spark job total instead of ~2 per merge round; at 1k+ merges
    * that is thousands of driver-paced jobs saved). Above the threshold
    * each round is ONE distributed pair-count aggregation plus a 1-row
    * collect of the winning pair — the bounded driver loop of the
    * MLlib/k-means pattern (numMerges is a training hyperparameter, never
    * data-sized). Both paths implement the identical greedy rule
    * (BpeSpec asserts merge-for-merge equality across the cutover), and
    * merge application matches the encoder's left-to-right
    * non-overlapping replace pass, so train → apply → re-count is
    * self-consistent.
    */
  def bpeTrain(docs: DataFrame, numMerges: Int,
               textCol: String = "text",
               localThreshold: Long = 100000L): Seq[(String, String)] = {
    require(numMerges >= 1 && numMerges <= 4096,
      s"numMerges must be in [1,4096], got $numMerges")
    // distinct words with occurrence counts: pair counting then weighs by
    // freq instead of re-walking every occurrence
    val words = docs.select(explode(split(lower(trim(col(textCol))), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("freq"))
    if (words.count() <= localThreshold) bpeTrainLocal(words, numMerges)
    else bpeTrainDistributed(words, numMerges)
  }

  /** Driver-side greedy loop over the collected (word, freq) vocabulary —
    * exact same rule as [[bpeTrainDistributed]]: max pair count, ties to
    * the UTF-8-byte-smallest (a, b) (Spark's string sort order), merges
    * applied left-to-right non-overlapping.
    */
  private def bpeTrainLocal(words: DataFrame,
                            numMerges: Int): Seq[(String, String)] = {
    // code-point segmentation — the twin of regexp_replace("(.)", "$1 ")
    var segs: Array[(Array[String], Long)] = words.collect().map { r =>
      val toks = r.getString(0).codePoints().toArray
        .map(cp => new String(Character.toChars(cp)))
      (toks, r.getLong(1))
    }
    def byteCmp(x: String, y: String): Int =
      java.util.Arrays.compareUnsigned(
        x.getBytes(java.nio.charset.StandardCharsets.UTF_8),
        y.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var round = 0
    var exhausted = false
    while (round < numMerges && !exhausted) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      segs.foreach { case (toks, freq) =>
        var i = 0
        while (i + 1 < toks.length) {
          val k = (toks(i), toks(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + freq)
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        // max count first, then byte-smallest (a, b): one linear scan
        var best: ((String, String), Long) = null
        counts.foreach { kv =>
          if (best == null || kv._2 > best._2 ||
            (kv._2 == best._2 && {
              val ca = byteCmp(kv._1._1, best._1._1)
              ca < 0 || (ca == 0 && byteCmp(kv._1._2, best._1._2) < 0)
            })) best = kv
        }
        val (a, b) = best._1
        out += ((a, b))
        segs = segs.map { case (toks, freq) =>
          if (toks.length < 2) (toks, freq)
          else {
            val merged = scala.collection.mutable.ArrayBuffer.empty[String]
            var i = 0
            while (i < toks.length) {
              if (i + 1 < toks.length && toks(i) == a && toks(i + 1) == b) {
                merged += a + b
                // the string replace consumes the TRAILING space, so the
                // next token can never start a match ("aaaa" → aa a a —
                // the documented portable contract; see TextOpsSpec)
                if (i + 2 < toks.length) merged += toks(i + 2)
                i += 3
              } else { merged += toks(i); i += 1 }
            }
            (merged.toArray, freq)
          }
        }
        round += 1
      }
    }
    out.toSeq
  }

  /** Distributed greedy loop: per round one pair-count aggregation over
    * the segmented vocabulary plus a 1-row collect of the winner.
    */
  private def bpeTrainDistributed(words: DataFrame,
                                  numMerges: Int): Seq[(String, String)] = {
    var seg = words
      .select(concat(lit(" "), trim(regexp_replace(col("w"), "(.)", "$1 ")),
        lit(" ")).as("s"), col("freq"))
      .localCheckpoint()
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var round = 0
    var exhausted = false
    while (round < numMerges && !exhausted) {
      val pairs = seg.select(col("freq"), explode(expr(
          """zip_with(slice(split(trim(s), ' '), 1, size(split(trim(s), ' ')) - 1),
            |         slice(split(trim(s), ' '), 2, size(split(trim(s), ' ')) - 1),
            |         (a, b) -> named_struct('a', a, 'b', b))""".stripMargin)).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("freq")).as("n"))
      val top = pairs.orderBy(col("n").desc, col("a"), col("b")).limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (a, b) = (top(0).getString(0), top(0).getString(1))
        out += ((a, b))
        val next = seg.select(
            call_function("replace", col("s"), lit(s" $a $b "), lit(s" $a$b ")).as("s"),
            col("freq"))
          .localCheckpoint()
        seg = next
        round += 1
      }
    }
    out.toSeq
  }
}
