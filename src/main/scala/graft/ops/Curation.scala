package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The end-to-end corpus-curation chain — the individually-gated training
  * -data operators composed in their canonical order (the shape of a real
  * pretraining data pipeline over a 100 TB crawl):
  *
  *   quality floor → exact dedup (keep-first) → benchmark
  *   decontamination → deterministic split → the train cut
  *
  * Composition is where stage-level guarantees usually die (a filter
  * reordered past a dedup changes keep-first winners), so the driver gate
  * replays the WHOLE chain in SQL and value-checks the surviving rows —
  * the stage order is part of the contract, not an implementation detail.
  *
  * Scale shape is inherited from the stages: the quality floor and split
  * are zero-shuffle codegen'd filters fused into the scan, dedup shuffles
  * 32-byte content hashes (never bodies), decontamination probes a
  * broadcast gram set (bloom-prefilter it via
  * [[CorpusOps.decontaminateBloom]] at real scale) — so the composed job
  * is ONE pass over the corpus plus the hash dedup exchange.
  */
object Curation {

  def curate(docs: DataFrame, benchmark: DataFrame,
             minQuality: Double = 0.5, gramN: Int = 5,
             splitSalt: Long = 3L, trainFrac: Double = 0.8,
             idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(minQuality >= 0 && minQuality <= 1, "minQuality must be in [0,1]")
    require(trainFrac > 0 && trainFrac <= 1, "trainFrac must be in (0,1]")
    val scored = docs
      .withColumn("quality", TextOps.qualityScore(col(textCol)))
      .filter(col("quality") >= minQuality)
    val deduped = Dedup.exact(scored, idCol, textCol)
    val clean = CorpusOps.decontaminate(deduped, benchmark, gramN,
      idCol, textCol)
    clean.filter(
      Sampling.bucket(col(idCol), splitSalt) <
        lit((trainFrac * Sampling.Buckets).toLong))
  }

  /** Per-stage row-count evidence for one [[curate]] run — the audit
    * artifact that tells an operator WHERE the corpus shrank. EAGER by
    * design: each stage is pinned before its count so the five counts
    * cost one pass over the chain, not five chain recomputations (a lazy
    * five-branch union re-derived the full upstream per branch); the
    * returned frame is a small local relation of the finished counts.
    */
  def curationAudit(docs: DataFrame, benchmark: DataFrame,
                    minQuality: Double = 0.5, gramN: Int = 5,
                    splitSalt: Long = 3L, trainFrac: Double = 0.8,
                    idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val session = docs.sparkSession
    import session.implicits._
    val scored = docs
      .withColumn("quality", TextOps.qualityScore(col(textCol)))
      .filter(col("quality") >= minQuality)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val deduped = Dedup.exact(scored, idCol, textCol)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val clean = CorpusOps.decontaminate(deduped, benchmark, gramN,
        idCol, textCol)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val train = clean.filter(
      Sampling.bucket(col(idCol), splitSalt) <
        lit((trainFrac * Sampling.Buckets).toLong))
    val counts = Seq(
      "input" -> docs.count(), "quality" -> scored.count(),
      "dedup" -> deduped.count(), "decontam" -> clean.count(),
      "train" -> train.count())
    Seq(scored, deduped, clean).foreach(_.unpersist())
    counts.toDF("stage", "n_rows")
  }

  /** Cross-split leakage audit: for each non-train split, how many of its
    * documents share exact content with ANY train document — the eval-set
    * contamination a per-doc dedup pass upstream of the split prevents,
    * and the number a training run must report before results are
    * credible. Splits come from [[Sampling.splitAssign]] (the persisted-
    * membership contract); comparison is by sha256(text) so the semi-join
    * shuffles 64-hex keys, never bodies.
    *
    * Returns (split, n_docs, n_leaked) for every split including train
    * (train's n_leaked is 0 by definition — kept as the audit's sanity
    * row).
    */
  def splitLeakage(docs: DataFrame, names: Seq[String], weights: Seq[Double],
                   salt: Long, idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame = {
    val assigned = Sampling.splitAssign(docs, names, weights, idCol, salt)
      .select(col(idCol), col("split"), sha2(col(textCol), 256).as("_h"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val trainHashes = assigned.filter(col("split") === names.head)
      .select(col("_h")).distinct()
    val leaked = assigned.filter(col("split") =!= names.head)
      .join(trainHashes, Seq("_h"), "left_semi")
      .groupBy("split").agg(count(lit(1)).as("n_leaked"))
    val out = assigned.groupBy("split").agg(count(lit(1)).as("n_docs"))
      .join(leaked, Seq("split"), "left_outer")
      .select(col("split"), col("n_docs"),
        coalesce(col("n_leaked"), lit(0L)).as("n_leaked"))
      .localCheckpoint()
    assigned.unpersist()
    out
  }
}
