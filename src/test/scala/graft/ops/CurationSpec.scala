package graft.ops

import graft.SparkSpec

class CurationSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bank today"), // dup of 1
    (3L, "a a a a a a a a"), // low quality: 1 distinct token, short
    (10L, "completely different words appear within this rather ordinary looking sentence here")
  ).toDF("doc_id", "text")
  private val bench =
    Seq((99L, "different words appear within this rather ordinary"))
      .toDF("doc_id", "text")

  test("curate applies quality, keep-first dedup, decontam, split in order") {
    val out = Curation.curate(docs, bench, minQuality = 0.3, trainFrac = 1.0)
      .select("doc_id").as[Long].collect().toSet
    // 2 deduped (1 kept first), 3 quality-dropped, 10 shares a benchmark
    // 5-gram; trainFrac=1 keeps every survivor
    assert(out === Set(1L))
  }

  test("curationAudit reports monotone per-stage counts") {
    val audit = Curation.curationAudit(docs, bench, minQuality = 0.3,
        trainFrac = 1.0)
      .as[(String, Long)].collect().toMap
    assert(audit === Map("input" -> 4L, "quality" -> 3L, "dedup" -> 2L,
      "decontam" -> 1L, "train" -> 1L))
  }

  test("splitLeakage counts eval docs sharing exact content with train") {
    import spark.implicits._
    val docs = (0L until 8L).map(i => (i, if (i % 2 == 0) "SHARED" else s"uniq$i"))
      .toDF("doc_id", "text")
    val out = Curation.splitLeakage(docs, Seq("train", "heldout"),
        Seq(0.5, 0.5), salt = 1L)
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // derive the expectation from the same split op the impl composes
    val assign = graft.ops.Sampling.splitAssign(docs, Seq("train", "heldout"),
        Seq(0.5, 0.5), "doc_id", 1L)
      .select("doc_id", "text", "split")
      .as[(Long, String, String)].collect()
    val trainTexts = assign.filter(_._3 == "train").map(_._2).toSet
    val held = assign.filter(_._3 == "heldout")
    val expLeak = held.count(h => trainTexts.contains(h._2)).toLong
    assert(out("train")._2 === 0L)
    assert(out("heldout") === ((held.length.toLong, expLeak)))
    assert(out("train")._1 + out("heldout")._1 === 8L)
  }
}
