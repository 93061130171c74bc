package graft.kg

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.bulk.{NodeSetOps, RelSetOps}
import graft.io.StageRunner
import graft.schema.{EqKey, NodeSpec, RelSpec}

/** The end-to-end KG-construction pipeline (BASELINE.json north_star):
  *
  *   turns → triples_raw → surfaces → candidate pairs (MinHash-LSH) →
  *   connected components → canonical map → canonical triples →
  *   node/edge tables via NodeSetOps/RelSetOps merge semantics.
  *
  * Every stage runs under a StageRunner: parquet snapshot + per-partition
  * lineage/metrics rows + commit record, so a restarted run resumes from the
  * last committed stage. Stage boundaries are exactly the shuffle boundaries,
  * so resume never re-pays a completed shuffle.
  *
  * Skew: conv_id is heavily skewed (one hot conversation ~30% of turns).
  * Extraction is per-row (no shuffle → skew-immune). The per-conversation
  * stats stage demonstrates the two-phase salted aggregation pattern used
  * wherever a per-conv grouping is needed at 10^12-turn scale.
  */
object Pipeline {
  val JaccardThreshold = 0.5

  final case class Result(
      turns: DataFrame,
      triplesRaw: DataFrame,
      triples: DataFrame,
      nodes: DataFrame,
      edges: DataFrame,
      convStats: DataFrame)

  def run(turns: DataFrame, workDir: String): Result = {
    val spark = turns.sparkSession
    val stages = new StageRunner(spark, workDir)
    try runStages(turns, stages)
    finally stages.close() // detach the metrics listener from the session
  }

  private def runStages(turns: DataFrame, stages: StageRunner): Result = {
    val turnsDf = stages.stage("turns")(turns)

    val triplesRaw = stages.stage("triples_raw")(Extract.triplesRaw(turnsDf))

    val surfaces = stages.stage("surfaces")(Extract.surfaces(triplesRaw))

    val canonicalMap = stages.stage("canonical_map") {
      // size-adaptive: driver-local exact solve for small surface sets,
      // LSH blocking + connected components above the gate; surfaces with
      // no similar partner canonicalize to themselves
      val clustered = Canonicalize.canonicalMap(
        surfaces.select("norm").distinct(), JaccardThreshold)
        .withColumnRenamed("norm", "cnorm")
      surfaces.join(clustered, surfaces("norm") === clustered("cnorm"), "left_outer")
        .select(col("surface"),
          coalesce(col("canonical"), col("norm")).as("canonical"),
          coalesce(col("link_score"), lit(1.0)).as("link_score"))
    }

    val triples = stages.stage("triples") {
      joinCanonical(triplesRaw, broadcast(canonicalMap))
    }

    // Materialization through the graphio-semantics bulk operators:
    // entities as a merged NodeSet (dedup on merge key `name`), relations as
    // a merged RelationshipSet (edge identity = (src,dst,type), mention
    // provenance accumulated via append_props).
    // first_seen/last_seen validity intervals (minProps/maxProps merge
    // rules): the interval a node/edge was observed over — accumulated
    // correctly under incremental re-merges
    val entitySpec = NodeSpec(labels = Seq("Entity"), mergeKeys = Seq("name"),
      minProps = Seq("first_seen"), maxProps = Seq("last_seen"))
    val nodes = stages.stage(graft.schema.GraphSchema.nodeTableName(entitySpec)) {
      val entityRows = triples.select(col("subj").as("name"), col("ts"))
        .unionAll(triples.select(col("obj").as("name"), col("ts")))
        .groupBy("name").agg(count(lit(1)).as("mention_count"),
          min(col("ts")).as("first_seen"), max(col("ts")).as("last_seen"))
      NodeSetOps.merge(None, entityRows, entitySpec)
    }

    val relSpec = RelSpec("REL", Seq("Entity"), Seq("Entity"),
      Seq(EqKey("name")), Seq(EqKey("name")),
      minProps = Seq("first_seen"), maxProps = Seq("last_seen"))
    val edges = stages.stage(graft.schema.GraphSchema.relTableName(relSpec)) {
      val triplesAgg = triples
        .groupBy("subj", "pred", "obj")
        .agg(count(lit(1)).as("support"),
          max(col("score")).as("score"),
          min(col("ts")).as("first_seen"), max(col("ts")).as("last_seen"))
      val relRows = triplesAgg.select(
        col("subj").as("start_name"), col("obj").as("end_name"),
        col("pred"), col("support"), col("score"),
        col("first_seen"), col("last_seen"))
      // One logical RelationshipSet per predicate type would mirror the
      // reference 1:1; at scale we keep one edge table with rel_type as a
      // per-row column and resolve endpoints once.
      RelSetOps.merge(None, relRows, nodes, relSpec, relTypeCol = Some("pred"))
    }

    val convStats = stages.stage("conv_stats")(convStatsSalted(turnsDf))

    Result(turnsDf, triplesRaw, triples, nodes, edges, convStats)
  }

  /** The same dataflow without stage materialization — for smoke tests and
    * benchmarks where snapshot/resume isn't the point.
    */
  def triplesInMemory(turns: DataFrame, persistRaw: Boolean = true,
                      smallThreshold: Long = Canonicalize.DefaultSmallThreshold,
                      parquetPin: Option[String] = None): DataFrame = {
    // triplesRaw fans out to two scans (surface mining, final join) — pin it
    // or the full extraction runs per consumer. Three pinning strategies:
    //   - parquetPin=Some(dir): write one parquet snapshot and read both
    //     consumers from it (the staged-pipeline layout) — dictionary-encoded
    //     strings, and the surface-mining scan COLUMN-PRUNES to the two
    //     surface columns instead of decompressing all five;
    //   - persistRaw=true: columnar memory cache (no disk write, but the
    //     mining scan decompresses every cached column);
    //   - persistRaw=false: recompute extraction per consumer — 2× compute,
    //     zero pinned state; the compute scales at the CPU ceiling, so this
    //     trades absolute speed for scaling headroom.
    val raw0 = Extract.triplesRaw(turns)
    val triplesRaw = parquetPin match {
      case Some(dir) =>
        val spark = turns.sparkSession
        raw0.write.mode("overwrite").parquet(dir)
        spark.read.parquet(dir)
      case None if persistRaw =>
        raw0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      case None => raw0
    }
    // surfaces is tiny (distinct mention strings); pinning it means the two
    // downstream consumers (LSH blocking, canonical-map build) do NOT each
    // re-scan the full triple set
    val surfaces = Extract.surfaces(triplesRaw)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val clustered = Canonicalize.canonicalMap(
      surfaces.select("norm").distinct(), JaccardThreshold, smallThreshold)
      .withColumnRenamed("norm", "cnorm")
    val canonicalMap = surfaces
      .join(clustered, surfaces("norm") === clustered("cnorm"), "left_outer")
      .select(col("surface"),
        coalesce(col("canonical"), col("norm")).as("canonical"),
        coalesce(col("link_score"), lit(1.0)).as("link_score"))
    val cm = broadcast(canonicalMap)
    joinCanonical(triplesRaw, cm)
  }

  /** Resolve both triple endpoints against the canonical map; the triple's
    * score is the product of its two entity-link confidences.
    */
  private[graft] def joinCanonical(triplesRaw: DataFrame, cm: DataFrame): DataFrame =
    triplesRaw
      .join(cm.withColumnRenamed("surface", "subj_surface")
              .withColumnRenamed("canonical", "subj")
              .withColumnRenamed("link_score", "_subj_score"), Seq("subj_surface"))
      .join(cm.withColumnRenamed("surface", "obj_surface")
              .withColumnRenamed("canonical", "obj")
              .withColumnRenamed("link_score", "_obj_score"), Seq("obj_surface"))
      .select(col("subj"), col("pred"), col("obj"), col("conv_id"), col("turn_idx"),
        col("ts"), (col("_subj_score") * col("_obj_score")).as("score"))

  /** Per-conversation stats via two-phase salted aggregation: partial
    * aggregate on (conv_id, salt) — spreads the hot conversation over 16
    * reducers — then final combine on conv_id. collect_set-style state is
    * what makes the salt worthwhile (plain sums already combine map-side).
    */
  def convStatsSalted(turns: DataFrame, salt: Int = 16): DataFrame = {
    val partial = turns
      .groupBy(col("conv_id"), pmod(col("turn_idx"), lit(salt)).as("_salt"))
      .agg(count(lit(1)).as("n_turns"),
        collect_set(col("tool")).as("tools"),
        min(col("ts")).as("first_ts"),
        max(col("ts")).as("last_ts"))
    partial
      .groupBy("conv_id")
      .agg(sum(col("n_turns")).as("n_turns"),
        array_sort(array_distinct(flatten(collect_list(col("tools"))))).as("tools"),
        min(col("first_ts")).as("first_ts"),
        max(col("last_ts")).as("last_ts"))
  }
}
