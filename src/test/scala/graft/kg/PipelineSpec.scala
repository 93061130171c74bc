package graft.kg

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** End-to-end: distributed pipeline vs sequential oracle (the P/R >= 0.95
  * gate from BASELINE.json) plus the per-turn text-equality invariant and
  * snapshot resume.
  */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  val N = 2000L

  lazy val result: Pipeline.Result = {
    val dir = tmpDir("graft-pipe")
    Pipeline.run(TranscriptGen.turns(spark, N, 8).toDF(), dir)
  }

  test("per-turn text equality under stable (conv_id, turn_idx) ordering") {
    val got = result.turns.orderBy("conv_id", "turn_idx")
      .select("conv_id", "turn_idx", "text").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2)))
    val want = (0L until N).map(id => Corpus.turnAt(id, N))
      .map(t => (t.conv_id, t.turn_idx, t.text))
      .sortBy(t => (t._1, t._2))
    assert(got.toSeq == want)
  }

  test("triple P/R >= 0.95 vs sequential oracle") {
    val got = result.triples.select("subj", "pred", "obj").distinct()
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    val truth = SequentialOracle.triplesForCorpus(N)
    val pr = SequentialOracle.prScore(got, truth)
    info(s"precision=${pr.precision} recall=${pr.recall} tp=${pr.truePos} fp=${pr.falsePos} fn=${pr.falseNeg}")
    assert(pr.precision >= 0.95, s"precision ${pr.precision}")
    assert(pr.recall >= 0.95, s"recall ${pr.recall}")
  }

  test("triples also match the generator's spec-level truth") {
    val got = result.triples.select("subj", "pred", "obj").distinct()
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    val truth = Corpus.expectedTriples(N)
    val pr = SequentialOracle.prScore(got, truth)
    info(s"spec-level precision=${pr.precision} recall=${pr.recall}")
    assert(pr.precision >= 0.95 && pr.recall >= 0.95)
  }

  test("distributed (LSH+CC) and driver-local canonicalization agree, both at P/R 1.0") {
    val turns = TranscriptGen.turns(spark, 1500L, 8).toDF()
    def tripleSet(smallThreshold: Long) =
      Pipeline.triplesInMemory(turns, smallThreshold = smallThreshold)
        .select("subj", "pred", "obj").distinct()
        .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    val local = tripleSet(Long.MaxValue) // force driver-local path
    val dist = tripleSet(0L)             // force LSH + connected components
    assert(local == dist)
    val truth = SequentialOracle.triplesForCorpus(1500L)
    val prL = SequentialOracle.prScore(local, truth)
    assert(prL.precision >= 0.95 && prL.recall >= 0.95)
  }

  test("all three raw-pinning strategies produce the identical triple multiset") {
    val turns = TranscriptGen.turns(spark, 1200L, 8).toDF()
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("subj", "pred", "obj", "conv_id", "turn_idx")
      .collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
    val mem = rows(Pipeline.triplesInMemory(turns))
    val recompute = rows(Pipeline.triplesInMemory(turns, persistRaw = false))
    val pqDir = tmpDir("graft-pin-parity")
    val parquet = rows(Pipeline.triplesInMemory(turns, persistRaw = false,
      parquetPin = Some(pqDir)))
    assert(mem == recompute)
    assert(mem == parquet)
  }

  test("entity-link scores match the oracle formula (trigram jaccard product)") {
    val n = 800L
    val got = Pipeline.triplesInMemory(TranscriptGen.turns(spark, n, 4).toDF())
      .select("subj", "pred", "obj", "score").distinct()
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        math.rint(r.getDouble(3) * 1e9) / 1e9)).toSet
    val turns = (0L until n).map { id =>
      val t = Corpus.turnAt(id, n); (t.conv_id, t.turn_idx, t.text)
    }
    val want = SequentialOracle.scoredTriples(turns)
      .map(t => (t._1, t._2, t._3, math.rint(t._4 * 1e9) / 1e9))
    assert(got == want)
    // variant-linked triples must carry confidence < 1
    assert(got.exists(_._4 < 1.0))
    assert(got.forall(t => t._4 > 0.0 && t._4 <= 1.0))
  }

  test("node table: one row per canonical entity, labels stamped") {
    val names = result.nodes.select("name").collect().map(_.getString(0))
    assert(names.distinct.length == names.length)
    val labels = result.nodes.select("labels").collect()(0).getAs[scala.collection.Seq[String]](0)
    assert(labels == Seq("Entity"))
  }

  test("node/edge first_seen-last_seen intervals equal the corpus min/max per key") {
    // oracle: every triple mention's turn ts, grouped per canonical entity
    val mentionTs = result.triples.select(col("subj").as("name"), col("ts"))
      .unionAll(result.triples.select(col("obj").as("name"), col("ts")))
      .groupBy("name")
      .agg(min("ts").as("lo"), max("ts").as("hi"))
      .collect().map(r => r.getString(0) -> (r.getTimestamp(1), r.getTimestamp(2))).toMap
    val got = result.nodes.select("name", "first_seen", "last_seen")
      .collect().map(r => r.getString(0) -> (r.getTimestamp(1), r.getTimestamp(2))).toMap
    assert(got === mentionTs)
    // edges: interval bounds must bracket every supporting mention
    val e = result.edges.select("first_seen", "last_seen").collect()
    assert(e.nonEmpty && e.forall(r => !r.getTimestamp(0).after(r.getTimestamp(1))))
  }

  test("edge table: identity is (src,dst,rel_type); all endpoints resolve") {
    val e = result.edges
    assert(e.count() == e.select("src_id", "dst_id", "rel_type").distinct().count())
    val nodeIds = graft.bulk.RelSetOps.withNodeId(result.nodes, Seq("name"))
      .select(col("_node_id")).as[Long].collect().toSet
    val endpoints = e.select("src_id").as[Long].collect() ++ e.select("dst_id").as[Long].collect()
    assert(endpoints.forall(nodeIds.contains))
  }

  test("resume: a second run over the same workDir recomputes nothing and matches") {
    val dir = tmpDir("graft-resume")
    val turns = TranscriptGen.turns(spark, 500L, 4).toDF()
    val r1 = Pipeline.run(turns, dir)
    val c1 = r1.triples.count()
    // second run: all stages committed → read-only resume
    val log = new graft.io.SnapshotLog(dir)
    val committedBefore = log.committedStages()
    val r2 = Pipeline.run(turns, dir)
    assert(log.committedStages() == committedBefore)
    assert(r2.triples.count() == c1)
  }

  test("lineage/metrics rows written per stage") {
    val dir = tmpDir("graft-lineage")
    Pipeline.run(TranscriptGen.turns(spark, 300L, 4).toDF(), dir)
    val lineage = spark.read.parquet(s"$dir/_graft_lineage")
    val stages = lineage.select("stage").distinct().as[String].collect().toSet
    assert(stages.contains("turns"))
    assert(lineage.filter(col("records_written") > 0).count() > 0)
  }

  test("conv_stats: salted two-phase agg matches direct aggregation") {
    val turns = TranscriptGen.turns(spark, 1000L, 8).toDF()
    val salted = Pipeline.convStatsSalted(turns)
    val direct = turns.groupBy("conv_id")
      .agg(count(lit(1)).as("n_turns"),
        array_sort(array_distinct(collect_list(col("tool")))).as("tools"),
        min(col("ts")).as("first_ts"), max(col("ts")).as("last_ts"))
    assert(salted.exceptAll(direct).count() == 0)
    assert(direct.exceptAll(salted).count() == 0)
    // skew fixture really is skewed: hot conv carries ~30% of turns
    val hot = salted.filter(col("conv_id") === "conv-hot").select("n_turns").as[Long].head()
    assert(hot == 300L)
  }
}
