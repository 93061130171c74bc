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
}
