package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-6 measurement harness (guide §1): NOT part of the frozen bench.
  *
  *   sbt "runMain graft.BenchExtra before"   — dump plans + phase timings
  *   sbt "runMain graft.BenchExtra after"
  *
  * Writes `plans/r06/<query>_<suffix>.txt` (`.explain("formatted")` for every
  * bench headline query + the KG pipeline) and prints noop-sink-isolated
  * sub-phase timings for the expensive queries so optimization targets the
  * right stage (guide §1.4: noop computes every column, §1.5: jobs labeled).
  */
object BenchExtra {

  def timed(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val suffix = if (args.nonEmpty) args(0) else "before"
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Bench.session(cpus)
    val sc = spark.sparkContext
    val planDir = new java.io.File("plans/r06")
    planDir.mkdirs()

    def dump(name: String, df: DataFrame): Unit = {
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      val w = new java.io.PrintWriter(new java.io.File(planDir, s"${name}_$suffix.txt"))
      try w.write(plan) finally w.close()
    }

    // ---- plans for every bench entry (guide §1: capture the plan shape) ----
    for (name <- Bench.headline) {
      dump(name, SparkEntry.queries(name)(spark, sfDir))
      spark.sharedState.cacheManager.clearCache()
    }
    dump("kg_pipeline",
      kg.Pipeline.triplesInMemory(
        spark.read.parquet(Bench.kgInput(spark)), persistRaw = false))
    spark.sharedState.cacheManager.clearCache()

    // ---- sub-phase timings, min of 2 after one warm-up ----
    val phases = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    def phase(label: String)(f: => Unit): Unit = {
      sc.setJobDescription(label)
      f // warm-up
      spark.sharedState.cacheManager.clearCache()
      val a = timed(f)
      spark.sharedState.cacheManager.clearCache()
      val b = timed(f)
      spark.sharedState.cacheManager.clearCache()
      phases(label) = math.min(a, b)
      sc.setJobDescription(null)
    }
    // for phases that read a deliberately pre-pinned input (no cache clear)
    def phaseKeepCache(label: String)(f: => Unit): Unit = {
      sc.setJobDescription(label)
      f // warm-up
      val a = timed(f)
      val b = timed(f)
      phases(label) = math.min(a, b)
      sc.setJobDescription(null)
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    // minhash: signature+banding cost vs full pipeline
    phase("mh_sig_banded") {
      val shingled = docs.select(col("doc_id").as("id"),
        ops.Dedup.wordShingleHashes(col("text")).as("_sh"))
      val banded = shingled
        .withColumn("_sig", functions.functions.minhashSig(col("_sh"), kg.Lsh.NumHashes))
        .select(col("id"), posexplode(expr(
          s"transform(sequence(0, ${kg.Lsh.NumBands - 1}), b -> hash(slice(_sig, b * ${kg.Lsh.RowsPerBand} + 1, ${kg.Lsh.RowsPerBand})))"))
          .as(Seq("band_idx", "band_key")))
      noop(banded)
    }
    phase("mh_shingles_only") {
      noop(docs.select(col("doc_id").as("id"),
        ops.Dedup.wordShingleHashes(col("text")).as("_sh")))
    }
    phase("mh_full") { noop(ops.Dedup.minhashLshPairs(docs, 0.9)) }

    // simhash: signature cost vs full
    phase("sh_sigs") { noop(ops.Dedup.simhash(docs)) }
    phase("sh_full") { noop(ops.Dedup.simhashPairs(docs, 3)) }

    // ngram jaccard
    phase("nj_shingles") {
      noop(docs.filter(col("lang") === "de").select(col("doc_id").as("id"),
        array_distinct(transform(split(lower(trim(col("text"))), "\\s+"),
          tok => xxhash64(tok))).as("sh")))
    }
    phase("nj_full") { noop(Queries.ngramJaccard(spark, sfDir)) }

    // traverse1hop: graph load vs traverse (load replicated from
    // Queries.custOrderGraph — measurement copy only)
    def loadCustOrderGraph(): ogm.Graph = {
      import graft.bulk.GraphLoader.{EdgeBatch, NodeBatch}
      import graft.schema.{EqKey, NodeSpec, RelSpec}
      def t(n: String) = spark.read.parquet(s"$sfDir/$n.parquet")
      val cust = t("customer").select(
        col("c_custkey").as("key"), col("c_mktsegment").as("seg"))
      val ords = t("orders").select(
        (col("o_orderkey") + lit(10000000L)).as("key"),
        col("o_totalprice").as("price"), col("o_orderstatus").as("status"))
      val nats = t("nation").select(
        (col("n_nationkey") + lit(20000000L)).as("key"), col("n_name").as("seg"))
      val placed = t("orders").select(
        col("o_custkey").as("start_key"), (col("o_orderkey") + lit(10000000L)).as("end_key"))
      val located = t("customer").select(
        col("c_custkey").as("start_key"), (col("c_nationkey") + lit(20000000L)).as("end_key"))
      graft.bulk.GraphLoader.merge(
        nodes = Seq(
          NodeBatch(NodeSpec(Seq("Customer"), Seq("key")), cust),
          NodeBatch(NodeSpec(Seq("Order"), Seq("key")), ords),
          NodeBatch(NodeSpec(Seq("Nation"), Seq("key")), nats)),
        edges = Seq(
          EdgeBatch(RelSpec("PLACED", Seq("Customer"), Seq("Order"),
            Seq(EqKey("key")), Seq(EqKey("key"))), placed),
          EdgeBatch(RelSpec("LOCATED", Seq("Customer"), Seq("Nation"),
            Seq(EqKey("key")), Seq(EqKey("key"))), located)))
    }
    phase("tr_load_only") { loadCustOrderGraph() }
    // node-batch chain alone (no pin): where inside the load does time go?
    phase("tr_nodes_unpinned") {
      import graft.bulk.{NodeSetOps, GraphLoader}
      import graft.schema.NodeSpec
      def t(n: String) = spark.read.parquet(s"$sfDir/$n.parquet")
      val cust = t("customer").select(
        col("c_custkey").as("key"), col("c_mktsegment").as("seg"))
      val ords = t("orders").select(
        (col("o_orderkey") + lit(10000000L)).as("key"),
        col("o_totalprice").as("price"), col("o_orderstatus").as("status"))
      val nats = t("nation").select(
        (col("n_nationkey") + lit(20000000L)).as("key"), col("n_name").as("seg"))
      val chains = Seq(
        NodeSetOps.merge(None, cust, NodeSpec(Seq("Customer"), Seq("key"))),
        NodeSetOps.merge(None, ords, NodeSpec(Seq("Order"), Seq("key"))),
        NodeSetOps.merge(None, nats, NodeSpec(Seq("Nation"), Seq("key"))))
      noop(chains.reduce(_.unionByName(_, allowMissingColumns = true)))
    }
    // traverse over an ALREADY-LOADED graph (the query minus the load)
    locally {
      val g = loadCustOrderGraph()
      phaseKeepCache("tr_traverse_only") {
        import graft.schema.{FieldFilter, FilterOp}
        noop(g.traverse(
            srcLabels = Seq("Customer"), srcKeys = Seq("key"),
            relType = "PLACED",
            dstLabels = Seq("Order"), dstKeys = Seq("key"),
            srcFilters = Seq(FieldFilter("seg", FilterOp.Eq, "BUILDING")),
            relFilters = Nil,
            dstFilters = Seq(FieldFilter("price", FilterOp.Gt, 100000.0)))
          .select((col("key") - lit(10000000L)).as("o_orderkey"), col("status")))
      }
      g.release()
    }
    // plan + timing of ONE edge-batch resolve+merge against the pinned
    // node table (the expensive half of the load)
    locally {
      import graft.bulk.RelSetOps
      import graft.schema.{EqKey, RelSpec}
      val g = loadCustOrderGraph()
      val placed = spark.read.parquet(s"$sfDir/orders.parquet").select(
        col("o_custkey").as("start_key"), (col("o_orderkey") + lit(10000000L)).as("end_key"))
      val spec = RelSpec("PLACED", Seq("Customer"), Seq("Order"),
        Seq(EqKey("key")), Seq(EqKey("key")))
      val resolved = RelSetOps.merge(None, placed, g.nodes, spec)
      dump("tr_edge_resolve", resolved)
      phaseKeepCache("tr_edge_resolve") { noop(resolved) }
      g.release()
    }
    phase("tr_full") { noop(Queries.traverse1hop(spark, sfDir)) }

    // cc_events: distinct edge derivation vs full CC
    phase("cc_edges_distinct") {
      noop(spark.read.parquet(s"$sfDir/events.parquet").select(
        concat(lit("u:"), col("user_id")).as("a"),
        concat(lit("e:"), col("event_type")).as("b")).distinct())
    }
    phase("cc_full") { noop(Queries.ccEvents(spark, sfDir)) }

    // cheap queries, for completeness
    phase("nodeset_dedup") { noop(Queries.nodesetDedup(spark, sfDir)) }
    phase("conv_stats") { noop(Queries.convStats(spark, sfDir)) }
    phase("nodeset_merge") { noop(Queries.nodesetMerge(spark, sfDir)) }
    phase("relset_resolve") { noop(Queries.relsetResolve(spark, sfDir)) }
    phase("ann_topk") { noop(Queries.annBruteForce(spark, sfDir)) }

    // kg pipeline
    val kgIn = Bench.kgInput(spark)
    phase("kg_pipeline") {
      noop(kg.Pipeline.triplesInMemory(spark.read.parquet(kgIn), persistRaw = false))
    }

    println("PHASES_JSON " + phases.map { case (k, v) =>
      "\"" + k + "\":" + f"$v%.3f" }.mkString("{", ",", "}"))
    spark.stop()
  }
}
