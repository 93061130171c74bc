package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.kg._

/** End-to-end driver: generate transcripts → run the KG pipeline → report
  * triple P/R vs the sequential oracle. `sbt "runMain graft.Demo [nTurns]"`.
  */
object Demo {
  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("--streaming")) { streamingDemo(); return }
    val n = if (args.nonEmpty) args(0).toLong else 5000L
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-demo")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      // see Bench.session: keep AQE from byte-coalescing CPU-dense stages
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val workDir =
      if (args.length > 1) args(1)
      else java.nio.file.Files.createTempDirectory("graft-demo").toString
    println(s"[demo] corpus: $n turns; workDir: $workDir")

    val t0 = System.nanoTime()
    val result = Pipeline.run(TranscriptGen.turns(spark, n, 16).toDF(), workDir)
    val nTriples = result.triples.count()
    val secs = (System.nanoTime() - t0) / 1e9

    println(s"[demo] pipeline: ${nTriples} triple mentions in ${f"$secs%.1f"}s " +
      s"(${f"${n / secs}%.0f"} turns/sec)")
    println("[demo] sample canonical triples:")
    result.triples.orderBy("subj", "pred", "obj").show(10, truncate = false)
    println("[demo] node table:")
    result.nodes.orderBy(desc("mention_count")).show(5, truncate = false)
    println("[demo] edge table:")
    result.edges.orderBy(desc("support")).show(5, truncate = false)
    println("[demo] hottest conversations:")
    result.convStats.orderBy(desc("n_turns")).show(3, truncate = false)

    val got = result.triples.select("subj", "pred", "obj").distinct()
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    val truth = SequentialOracle.triplesForCorpus(n)
    val pr = SequentialOracle.prScore(got, truth)
    println(f"[demo] P/R vs sequential oracle: precision=${pr.precision}%.4f recall=${pr.recall}%.4f " +
      s"(tp=${pr.truePos} fp=${pr.falsePos} fn=${pr.falseNeg})")
    println(s"[demo] committed stages: ${new graft.io.SnapshotLog(workDir).committedStages().toSeq.sorted.mkString(", ")}")
    spark.stop()
    if (pr.precision < 0.95 || pr.recall < 0.95) sys.exit(1)
  }

  /** Incremental (Structured Streaming) construction demo: transcripts
    * arrive as three parquet files; per-micro-batch merges must converge to
    * the same graph a single batch run produces.
    */
  def streamingDemo(): Unit = {
    import graft.kg.Corpus
    import graft.streaming.IncrementalPipeline
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-streaming-demo")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val n = 1200L
    val inDir = java.nio.file.Files.createTempDirectory("graft-stream-in").toString
    val ckDir = java.nio.file.Files.createTempDirectory("graft-stream-ck").toString
    Seq((0L, 400L), (400L, 800L), (800L, 1200L)).foreach { case (lo, hi) =>
      spark.range(lo, hi).map(id => Corpus.turnAt(id, n)).toDF()
        .coalesce(1).write.mode("append").parquet(inDir)
    }
    val state = new IncrementalPipeline.GraphState(spark)
    val q = IncrementalPipeline.start(spark, inDir, ckDir, state)
    q.awaitTermination(180000)
    val batchState = new IncrementalPipeline.GraphState(spark)
    batchState.mergeBatch(IncrementalPipeline.extractBatch(
      kg.TranscriptGen.turns(spark, n, 8).toDF()))
    val sN = state.nodes.get.count(); val sE = state.edges.get.count()
    val bN = batchState.nodes.get.count(); val bE = batchState.edges.get.count()
    println(s"[demo-stream] streamed: $sN nodes, $sE edges; batch: $bN nodes, $bE edges")
    println(s"[demo-stream] converged=${sN == bN && sE == bE}")
    spark.stop()
    if (sN != bN || sE != bE) sys.exit(1)
  }
}
