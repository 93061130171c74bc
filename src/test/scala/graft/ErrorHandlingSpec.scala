package graft

import graft.bulk.{NodeSetOps, RelSetOps}
import graft.kg.{Canonicalize, ConnectedComponents, Pipeline, TranscriptGen}
import graft.schema._
import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions._

/** Error-handling + empty-input contracts (the analogue of the reference's
  * test/test_error_handling.py): invalid specs fail fast with clear
  * messages; empty inputs flow through every operator without crashing.
  */
class ErrorHandlingSpec extends SparkSpec {
  import spark.implicits._

  test("NodeSpec without merge keys fails at construction (nodeset.py:180-184)") {
    val e = intercept[IllegalArgumentException](NodeSpec(Seq("X"), Nil))
    assert(e.getMessage.contains("mergeKeys"))
  }

  test("RelSpec without endpoint properties fails at construction") {
    intercept[IllegalArgumentException](
      RelSpec("T", Seq("A"), Seq("B"), Nil, Seq(EqKey("k"))))
  }

  test("merge on a missing key column surfaces Spark's analysis error") {
    val spec = NodeSpec(Seq("T"), Seq("nope"))
    val rows = Seq((1L, "x")).toDF("uuid", "key")
    intercept[AnalysisException](NodeSetOps.merge(None, rows, spec).collect())
  }

  test("empty batch: create/merge/dedup all yield empty, correctly-shaped output") {
    val spec = NodeSpec(Seq("T"), Seq("uuid"))
    val empty = Seq.empty[(Long, String)].toDF("uuid", "key")
    assert(NodeSetOps.create(None, empty, spec).count() == 0)
    val m = NodeSetOps.merge(None, empty, spec)
    assert(m.count() == 0)
    assert(m.columns.contains("labels"))
    assert(NodeSetOps.dedupFirstWins(empty, Seq("uuid")).count() == 0)
    // merging an empty batch into a non-empty target is a no-op
    val t = NodeSetOps.merge(None, Seq((1L, "v")).toDF("uuid", "key"), spec)
    assert(NodeSetOps.merge(Some(t), empty, spec).count() == 1)
  }

  test("empty edge batch and empty node table resolve to empty") {
    val spec = RelSpec("T", Seq("A"), Seq("A"), Seq(EqKey("k")), Seq(EqKey("k")))
    val nodes = Seq((1L, Seq("A"))).toDF("k", "labels")
    val emptyEdges = Seq.empty[(Long, Long)].toDF("start_k", "end_k")
    assert(RelSetOps.create(None, emptyEdges, nodes, spec).count() == 0)
    val edges = Seq((1L, 1L)).toDF("start_k", "end_k")
    val emptyNodes = Seq.empty[(Long, Seq[String])].toDF("k", "labels")
    assert(RelSetOps.create(None, edges, emptyNodes, spec).count() == 0)
  }

  test("connected components on an empty edge set returns empty") {
    val empty = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(ConnectedComponents.run(empty).count() == 0)
  }

  test("canonicalization of zero and one surface") {
    val zero = Seq.empty[String].toDF("norm")
    assert(Canonicalize.canonicalMap(zero, 0.5).count() == 0)
    val one = Seq("acme").toDF("norm")
    val got = Canonicalize.canonicalMap(one, 0.5).collect()(0)
    assert(got.getString(0) == "acme" && got.getString(1) == "acme" && got.getDouble(2) == 1.0)
  }

  test("pipeline over a corpus with zero extractable facts") {
    // fillers only: role/text cycle exists but strip fact sentences by
    // taking turns whose text happens to carry no triple — simplest: empty df
    val turns = TranscriptGen.turns(spark, 0L, 2).toDF()
    val out = Pipeline.triplesInMemory(turns)
    assert(out.count() == 0)
  }

  test("invalid SQL syntax in rawQuery surfaces the parse error (test_error_handling.py:195-209)") {
    val g = graft.ogm.Graph(
      Seq((1L, "x")).toDF("key", "v").withColumn("labels", array(lit("N"))),
      spark.emptyDataFrame)
    val e = intercept[Exception] {
      g.rawQuery("SELEKT key FROM nodes", Seq("key")).collect()
    }
    assert(e.getClass.getName.toLowerCase.contains("parse") ||
      e.getMessage.toLowerCase.contains("syntax"), e.toString)
  }

  test("malformed raw-query result is rejected with the missing columns named") {
    val g = graft.ogm.Graph(
      Seq((1L, Seq("A"))).toDF("k", "labels"),
      spark.emptyDataFrame)
    val e = intercept[IllegalArgumentException](
      g.rawQuery("SELECT labels FROM nodes", Seq("k")))
    assert(e.getMessage.contains("k"))
  }

  test("training-data ops reject nonsensical arguments at construction") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](graft.ops.Sampling.sampleByRate(docs, 1.5))
    intercept[IllegalArgumentException](graft.ops.Sampling.sampleStratified(
      docs, "text", Map("x" -> -0.1)))
    intercept[IllegalArgumentException](graft.ops.Sampling.splitAssign(
      docs, Seq("a", "b"), Seq(0.9, 0.3))) // sums over 1
    intercept[IllegalArgumentException](graft.ops.Sampling.splitAssign(
      docs, Seq("a"), Seq(0.5, 0.5))) // names/weights mismatch
    intercept[IllegalArgumentException](graft.ops.Sampling.quotaPerGroup(
      docs, "text", 0, Seq(col("doc_id"))))
    intercept[IllegalArgumentException](graft.ops.CorpusOps.packBySize(docs, 0L, 4))
    intercept[IllegalArgumentException](graft.ops.CorpusOps.packBySize(docs, 100L, 0))
    intercept[IllegalArgumentException](graft.ops.CorpusOps.decontaminate(docs, docs, 0))
  }

  test("round-3 APIs reject nonsensical arguments at construction") {
    val edges = Seq(("a", "b")).toDF("a", "b")
    intercept[IllegalArgumentException](graft.kg.GraphAlgos.kCore(edges, 0))
    intercept[IllegalArgumentException](
      graft.kg.GraphAlgos.pageRankPersonalized(
        edges.toDF("src", "dst"), Seq.empty[String].toDF("node"), 1))
    intercept[IllegalArgumentException](
      graft.kg.GraphAlgos.pageRankWeighted(
        Seq(("a", "b", 1.0)).toDF("src", "dst", "weight"), -1))
    val embs = Seq((0L, Seq(1.0, 0.0, 0.0))).toDF("vec_id", "embedding")
    // dim 3 not divisible by m=2
    intercept[IllegalArgumentException](graft.ops.Pq.train(embs, 2, 1, 1))
    val wd = tmpDir("graft-err-merge")
    val r = new graft.io.StageRunner(spark, wd)
    try intercept[IllegalArgumentException](
      r.mergeStage("s", "")(_ => Seq(1).toDF("x")))
    finally r.close()
    intercept[IllegalArgumentException](
      graft.ops.Dedup.ngramJaccardPairs(
        Seq((1L, "x", "en")).toDF("doc_id", "text", "lang"), "lang", 0.5,
        maxBlockSize = 1))
  }

  test("empty inputs flow through the round-3 graph operators") {
    val empty = Seq.empty[(String, String)].toDF("src", "dst")
    assert(graft.kg.GraphAlgos.kCore(empty.toDF("a", "b"), 2).count() == 0)
    assert(graft.kg.GraphAlgos.pageRankWeighted(
      Seq.empty[(String, String, Double)].toDF("src", "dst", "weight"), 2).count() == 0)
  }

  test("empty corpus: sampling, packing, corpus stats all yield empty, shaped output") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(graft.ops.Sampling.sampleByRate(empty, 0.5).count() == 0)
    assert(graft.ops.Sampling.splitAssign(empty, Seq("a"), Seq(1.0))
      .columns.contains("split"))
    assert(graft.ops.CorpusOps.packBySize(empty, 100L, 4).count() == 0)
    assert(graft.ops.CorpusOps.topTokens(empty, 5).count() == 0)
    assert(graft.ops.CorpusOps.decontaminate(empty, empty).count() == 0)
    assert(graft.ops.TextOps.annotate(empty).count() == 0)
  }
}
