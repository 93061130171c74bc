package graft.streaming

import graft.SparkSpec
import graft.kg.{Corpus, TranscriptGen}
import org.apache.spark.sql.functions._

class IncrementalPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("incremental stream converges to the batch graph (idempotent merges)") {
    val n = 600L
    val inDir = tmpDir("graft-stream-in")
    val ckDir = tmpDir("graft-stream-ck")

    // batch truth: all turns at once
    val all = TranscriptGen.turns(spark, n, 4).toDF()
    val batchTriples = IncrementalPipeline.extractBatch(all)
    val batchState = new IncrementalPipeline.GraphState(spark)
    batchState.mergeBatch(batchTriples)

    // stream: same turns arriving as 3 files (overlapping replay of file 2
    // is covered by merge idempotence at the (src,dst,type) level)
    val parts = Seq((0L, 200L), (200L, 400L), (400L, 600L))
    parts.foreach { case (lo, hi) =>
      val slice = spark.range(lo, hi).map(id => Corpus.turnAt(id, n)).toDF()
      slice.coalesce(1).write.mode("append").parquet(inDir)
    }

    val state = new IncrementalPipeline.GraphState(spark)
    val q = IncrementalPipeline.start(spark, inDir, ckDir, state)
    q.awaitTermination(120000)

    val gotNodes = state.nodes.get.select("name").as[String].collect().toSet
    val wantNodes = batchState.nodes.get.select("name").as[String].collect().toSet
    assert(gotNodes == wantNodes)

    val gotEdges = state.edges.get.select("src_id", "dst_id", "rel_type")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val wantEdges = batchState.edges.get.select("src_id", "dst_id", "rel_type")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(gotEdges == wantEdges)

    // support aggregates correctly across batches: total support equals
    // total triple mentions
    val totalSupport = state.edges.get.agg(sum("support")).head().getLong(0)
    assert(totalSupport == batchTriples.count())
  }

  test("windowed turn-rate aggregation (watermark + tumbling window)") {
    val turns = TranscriptGen.turns(spark, 300L, 4).toDF()
    val rates = IncrementalPipeline.turnRates(turns) // batch-mode window agg
    val total = rates.agg(sum("n_turns")).head().getLong(0)
    assert(total == 300L)
    assert(rates.columns.contains("window"))
  }
}
