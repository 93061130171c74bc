package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.bulk.{NodeSetOps, RelSetOps}
import graft.ogm.Graph
import graft.ops.{Dedup, Similarity, TextOps}
import graft.schema._

/** Driver-gate query implementations. Each query exercises one operator
  * family from SURVEY.md §2 (or a training-data op) over the driver's
  * parquet tables, shaped so an equivalent ANSI SQL oracle (DuckDB) produces
  * identical values — column names aligned on both sides.
  */
object Queries {
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  // ---------- graphio bulk semantics over TPC-H ----------

  /** B1 — blind append: create() twice doubles rows. */
  def nodesetCreate(s: SparkSession, dir: String): DataFrame = {
    val spec = NodeSpec(Seq("Customer"), Seq("uuid"))
    val rows = t(s, dir, "customer")
      .select(col("c_custkey").as("uuid"), col("c_name").as("key"))
    val once = NodeSetOps.create(None, rows, spec)
    NodeSetOps.create(Some(once), rows, spec).drop("labels")
  }

  /** A2 — first-wins dedup by merge key with explicit ingest order. */
  def nodesetDedup(s: SparkSession, dir: String): DataFrame = {
    // (l_orderkey, l_linenumber) is non-unique in this synthetic data, so
    // the ingest order must be a total order for determinism
    val rows = t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"), col("l_linenumber"))
      .withColumn(NodeSetOps.OrdCol,
        col("l_linenumber").cast("long") * lit(10000000L) + col("l_partkey"))
    NodeSetOps.dedupFirstWins(rows, Seq("l_orderkey"))
      .select("l_orderkey", "l_partkey", "l_linenumber")
  }

  /** B2 — keyed merge of two batches: scalar update wins, unmatched insert. */
  def nodesetMerge(s: SparkSession, dir: String): DataFrame = {
    val spec = NodeSpec(Seq("Cust"), Seq("uuid"))
    val orders = t(s, dir, "orders")
    def batch(status: String) = orders.filter(col("o_orderstatus") === status)
      .groupBy(col("o_custkey").as("uuid"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("last_status", lit(status))
    val m1 = NodeSetOps.merge(None, batch("O"), spec)
    NodeSetOps.merge(Some(m1), batch("F"), spec)
      .select("uuid", "cnt", "last_status")
  }

  /** B2-append — append_props accumulates across merges (array output). */
  def nodesetMergeAppend(s: SparkSession, dir: String): DataFrame = {
    val spec = NodeSpec(Seq("Cust"), Seq("uuid"), appendProps = Seq("cnt"))
    val orders = t(s, dir, "orders")
    def batch(status: String) = orders.filter(col("o_orderstatus") === status)
      .groupBy(col("o_custkey").as("uuid"))
      .agg(count(lit(1)).as("cnt"))
    val m1 = NodeSetOps.merge(None, batch("O"), spec)
    NodeSetOps.merge(Some(m1), batch("F"), spec)
      .select(col("uuid"),
        array_join(transform(col("cnt"), x => x.cast("string")), ",").as("cnt_list"))
  }

  /** B2-labels — additional labels accumulate across merges of different
    * specs onto the same keys (SET n:Extra → array_union).
    */
  def labelsAccum(s: SparkSession, dir: String): DataFrame = {
    val specA = NodeSpec(Seq("Customer"), Seq("uuid"), additionalLabels = Seq("Gold"))
    val specB = NodeSpec(Seq("Customer"), Seq("uuid"), additionalLabels = Seq("Active"))
    val rows = t(s, dir, "customer").select(col("c_custkey").as("uuid"))
    val m = NodeSetOps.merge(Some(NodeSetOps.merge(None, rows, specA)), rows, specB)
    m.select(col("uuid"), array_join(array_sort(col("labels")), ",").as("labels_str"))
  }

  /** B2-compound — merge on a compound key: only full-key matches update. */
  def multikeyMerge(s: SparkSession, dir: String): DataFrame = {
    val spec = NodeSpec(Seq("Line"), Seq("l_orderkey", "l_linenumber"))
    val li = t(s, dir, "lineitem")
    val b1 = li.groupBy("l_orderkey", "l_linenumber")
      .agg(sum(col("l_quantity")).as("qty"), lit("b1").as("src"))
    val b2 = li.filter(col("l_returnflag") === "R")
      .groupBy("l_orderkey", "l_linenumber")
      .agg(sum(col("l_quantity") * 2).as("qty"), lit("b2").as("src"))
    NodeSetOps.merge(Some(NodeSetOps.merge(None, b1, spec)), b2, spec)
      .select(col("l_orderkey"), col("l_linenumber"),
        round(col("qty"), 2).as("qty"), col("src"))
  }

  /** B3 — endpoint resolution joins; dangling refs silently dropped. */
  def relsetResolve(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer")
    val nodes = cust.select(col("c_custkey").as("key"))
      .withColumn("labels", array(lit("Customer")))
    val spec = RelSpec("SAME_SEG", Seq("Customer"), Seq("Customer"),
      Seq(EqKey("key")), Seq(EqKey("key")))
    // valid edges from orders + a dangling batch (shifted keys match nothing)
    val valid = t(s, dir, "orders").select(
      col("o_custkey").as("start_key"), col("o_custkey").as("end_key"),
      col("o_orderstatus").as("status"))
    val dangling = valid
      .withColumn("start_key", col("start_key") + lit(100000000L))
    val resolved = RelSetOps.create(None, valid.unionAll(dangling), nodes, spec)
    resolved.groupBy("status").agg(count(lit(1)).as("n")).orderBy("status")
  }

  /** B4 — merge idempotence: edge identity (src,dst,type); re-merge stable. */
  def relsetMergeIdem(s: SparkSession, dir: String): DataFrame = {
    val nodes = t(s, dir, "customer").select(col("c_custkey").as("key"))
      .withColumn("labels", array(lit("Customer")))
    val spec = RelSpec("PLACED", Seq("Customer"), Seq("Customer"),
      Seq(EqKey("key")), Seq(EqKey("key")))
    val edges = t(s, dir, "orders").select(
      col("o_custkey").as("start_key"), col("o_custkey").as("end_key"),
      col("o_totalprice").as("price"))
    val m1 = RelSetOps.merge(None, edges, nodes, spec)
    val m2 = RelSetOps.merge(Some(m1), edges, nodes, spec)
    m2.groupBy("rel_type").agg(count(lit(1)).as("n"))
  }

  /** ArrayProperty — containment endpoint match (keyword ∈ doc words). */
  def relsetArrayContains(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("words"))
      .withColumn("labels", array(lit("Doc")))
    val kws = strDf(s, "kw", Seq("spark", "join", "vector"))
      .withColumn("labels", array(lit("Keyword")))
    // uber node table with aligned schema
    val nodes = docs.withColumn("kw", lit(null).cast("string"))
      .unionByName(kws.withColumn("doc_id", lit(null).cast("long"))
        .withColumn("words", lit(null).cast("array<string>")), allowMissingColumns = true)
    val spec = RelSpec("MENTIONS", Seq("Keyword"), Seq("Doc"),
      Seq(EqKey("kw")), Seq(ArrayKey("words")))
    val staged = strDf(s, "kw", Seq("spark", "join", "vector"))
      .select(col("kw").as("start_kw"), col("kw").as("end_words"), col("kw"))
    RelSetOps.create(None, staged, nodes, spec)
      .groupBy("kw").agg(count(lit(1)).as("n_docs")).orderBy("kw")
  }

  private def strDf(s: SparkSession, name: String, xs: Seq[String]): DataFrame = {
    import s.implicits._
    s.createDataset(xs).toDF(name)
  }

  /** A1 — ingest with default-prop overlay: row value wins, null filled. */
  def ingestDefaults(s: SparkSession, dir: String): DataFrame = {
    val spec = NodeSpec(Seq("Event"), Seq("event_id"),
      defaultProps = Map("et" -> "unknown"))
    val rows = t(s, dir, "events").select(col("event_id"),
      nullif(col("event_type"), lit("error")).as("et"))
    NodeSetOps.ingest(rows, spec)
      .select("event_id", "et")
  }

  /** A4 — staged-edge uniqueness filter: duplicates collapse pre-resolution. */
  def uniqueEdges(s: SparkSession, dir: String): DataFrame = {
    val spec = RelSpec("DUP", Seq("Customer"), Seq("Customer"),
      Seq(EqKey("key")), Seq(EqKey("key")), unique = true)
    val staged = t(s, dir, "orders").select(
      col("o_custkey").as("start_key"), col("o_custkey").as("end_key"),
      col("o_orderstatus").as("status"))
    val doubled = staged.unionAll(staged)
    RelSetOps.uniqueEdges(doubled, spec)
      .groupBy("status").agg(count(lit(1)).as("n")).orderBy("status")
  }

  /** A6 — property-key union across heterogeneous rows (nodeset.py:220-233).
    * Two batches with DISJOINT property columns merge into one node table;
    * the key union is {o_cnt, f_price} and the per-key non-null counts prove
    * the rows really are heterogeneous (each key present on only its
    * batch's rows).
    */
  def propKeyUnion(s: SparkSession, dir: String): DataFrame = {
    val spec = NodeSpec(Seq("Cust"), Seq("uuid"))
    val orders = t(s, dir, "orders")
    val b1 = orders.filter(col("o_orderstatus") === "O")
      .groupBy(col("o_custkey").as("uuid")).agg(count(lit(1)).as("o_cnt"))
    val b2 = orders.filter(col("o_orderstatus") === "F")
      .groupBy(col("o_custkey").as("uuid")).agg(count(lit(1)).as("f_price"))
    val m = NodeSetOps.merge(Some(NodeSetOps.merge(None, b1, spec)), b2, spec)
    val keys = NodeSetOps.allPropertyKeys(m, spec).sorted
    require(keys == Seq("f_price", "o_cnt"), s"key union mismatch: $keys")
    m.agg(count(col("f_price")).as("f"), count(col("o_cnt")).as("o"))
      .select(explode(map(
        lit("f_price"), col("f"), lit("o_cnt"), col("o"))).as(Seq("key", "n_nonnull")))
      .orderBy("key")
  }

  /** A10 — cluster-by-merge-keys (the columnar stand-in for per-label
    * merge-key indexes, utils.py:35-63): after clustering, every key lives
    * in EXACTLY one partition (n_pairs == n_keys) and partitions are sorted
    * by key (zero adjacent inversions). Both invariants are what make
    * downstream merges co-partitioned and scans prunable.
    */
  def clusterBy(s: SparkSession, dir: String): DataFrame = {
    val spec = NodeSpec(Seq("Customer"), Seq("uuid"))
    val rows = t(s, dir, "customer").select(col("c_custkey").as("uuid"),
        col("c_mktsegment").as("seg"))
      .withColumn("labels", array(lit("Customer")))
    val cl = NodeSetOps.clusterByMergeKeys(rows, spec, 8)
      .select(spark_partition_id().as("p"), col("uuid"),
        monotonically_increasing_id().as("ord"))
    val inversions = cl
      .withColumn("prev", lag(col("uuid"), 1).over(
        Window.partitionBy("p").orderBy("ord")))
      .filter(col("prev").isNotNull && col("prev") > col("uuid"))
      .count()
    cl.agg(
        countDistinct(col("uuid")).as("n_keys"),
        countDistinct(col("p"), col("uuid")).as("n_pairs"))
      .withColumn("n_unsorted", lit(inversions))
  }

  /** B2-override — per-call `preserve` kwarg beats the spec for one merge
    * call only (nodeset.py:186-196): cnt updates, first_status is kept.
    */
  def mergeOverride(s: SparkSession, dir: String): DataFrame = {
    val spec = NodeSpec(Seq("Cust"), Seq("uuid")) // NO preserve in the spec
    val orders = t(s, dir, "orders")
    def batch(status: String) = orders.filter(col("o_orderstatus") === status)
      .groupBy(col("o_custkey").as("uuid"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("first_status", lit(status))
    val m1 = NodeSetOps.merge(None, batch("O"), spec)
    NodeSetOps.merge(Some(m1), batch("F"), spec,
        preserve = Some(Seq("first_status")))
      .select("uuid", "cnt", "first_status")
  }

  // ---------- OGM read path over a customer/orders graph ----------

  /** The OGM fixture graph, loaded through the B12 cascade API: three node
    * sets then two relationship sets, one call (GraphLoader orders the
    * stages). Key offsets keep the oracle arithmetic stable; label-scoped
    * merge would disambiguate shared key values anyway.
    */
  private def custOrderGraph(s: SparkSession, dir: String): Graph = {
    import graft.bulk.GraphLoader.{EdgeBatch, NodeBatch}
    val cust = t(s, dir, "customer").select(
      col("c_custkey").as("key"), col("c_mktsegment").as("seg"))
    val ords = t(s, dir, "orders").select(
      (col("o_orderkey") + lit(10000000L)).as("key"),
      col("o_totalprice").as("price"), col("o_orderstatus").as("status"))
    val nats = t(s, dir, "nation").select(
      (col("n_nationkey") + lit(20000000L)).as("key"), col("n_name").as("seg"))
    val placed = t(s, dir, "orders").select(
      col("o_custkey").as("start_key"), (col("o_orderkey") + lit(10000000L)).as("end_key"))
    val located = t(s, dir, "customer").select(
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

  /** Multi-hop traversal (extension): nation ←LOCATED– customers –PLACED→
    * orders — all orders placed by customers of one nation, in one chain of
    * hash joins.
    */
  def traverse2hop(s: SparkSession, dir: String): DataFrame = {
    val g = custOrderGraph(s, dir)
    val nation0 = t(s, dir, "nation").select(col("n_name")).orderBy("n_name").limit(1)
      .collect()(0).getString(0)
    g.traverseChain(
        Seq("Nation"), Seq("key"),
        hops = Seq(("LOCATED", true, Nil), ("PLACED", false, Nil)),
        anchorFilters = Seq(FieldFilter("seg", FilterOp.Eq, nation0)))
      .select((col("key") - lit(10000000L)).as("o_orderkey"), col("status"))
  }

  /** B5/B6 — node scan with the full predicate matrix. */
  def filterOps(s: SparkSession, dir: String): DataFrame = {
    val parts = t(s, dir, "part")
      .select(col("p_partkey"), col("p_name"), col("p_size"), col("p_type"))
      .withColumn("labels", array(lit("Part")))
    val g = Graph(parts, s.emptyDataFrame)
    g.matchNodes(Seq("Part"),
        FieldFilter("p_size", FilterOp.Ge, 10),
        FieldFilter("p_size", FilterOp.Lt, 40),
        FieldFilter("p_name", FilterOp.Contains, "e"),
        FieldFilter("p_name", FilterOp.StartsWith, "r"),
        FieldFilter("p_name", FilterOp.EndsWith, "t"),
        FieldFilter("p_type", FilterOp.Ne, "PROMO"))
      .select("p_partkey", "p_name", "p_size", "p_type")
  }

  /** B7 — 1-hop traversal: DISTINCT orders placed by BUILDING customers. */
  def traverse1hop(s: SparkSession, dir: String): DataFrame = {
    val g = custOrderGraph(s, dir)
    g.traverse(
        srcLabels = Seq("Customer"), srcKeys = Seq("key"),
        relType = "PLACED",
        dstLabels = Seq("Order"), dstKeys = Seq("key"),
        srcFilters = Seq(FieldFilter("seg", FilterOp.Eq, "BUILDING")),
        relFilters = Nil,
        dstFilters = Seq(FieldFilter("price", FilterOp.Gt, 100000.0)))
      .select((col("key") - lit(10000000L)).as("o_orderkey"), col("status"))
  }

  /** B8 — reverse traversal: DISTINCT customers (the edge SOURCE side)
    * anchored by a filter on the target side (orders with status F).
    */
  def traverseReverse(s: SparkSession, dir: String): DataFrame = {
    val g = custOrderGraph(s, dir)
    g.traverse(
        srcLabels = Seq("Customer"), srcKeys = Seq("key"),
        relType = "PLACED",
        dstLabels = Seq("Order"), dstKeys = Seq("key"),
        dstFilters = Seq(FieldFilter("status", FilterOp.Eq, "F")),
        reverse = true)
      .select(col("key").as("c_custkey"), col("seg"))
  }

  /** B10 — DETACH DELETE: drop BUILDING customers; count survivors. */
  def detachDelete(s: SparkSession, dir: String): DataFrame = {
    val g = custOrderGraph(s, dir)
    val g2 = g.detachDeleteNodes(Seq("Customer"), Seq("key"),
      FieldFilter("seg", FilterOp.Eq, "BUILDING"))
    val n = g2.nodes.filter(array_contains(col("labels"), "Customer")).count()
    val e = g2.edges.count()
    import s.implicits._
    Seq((n, e)).toDF("n_customers", "n_edges")
  }

  /** A5 — exact sequential batch boundaries (utils.py:20-32, BATCHSIZE
    * chunking; exactness tests test_nodeset.py:394-483). Batch ids assigned
    * by a TOTAL ingest order (the 6-column composite is unique in this
    * data); per-batch count + orderkey range checks the boundary placement,
    * not just the row count.
    */
  def batching(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val ord = struct(col("l_orderkey"), col("l_partkey"), col("l_linenumber"),
      col("l_suppkey"), col("l_quantity"), col("l_extendedprice"))
    graft.io.Batching.withBatchId(li, ord, 1000)
      .groupBy(col("_graft_batch").as("batch"))
      .agg(count(lit(1)).as("n"),
        min(col("l_orderkey")).as("min_ok"), max(col("l_orderkey")).as("max_ok"))
      .orderBy("batch")
  }

  /** B9 — parameterized raw SQL over the graph's views: named args bind as
    * literals (spark.sql(sql, args)), never spliced.
    */
  def rawQueryGate(s: SparkSession, dir: String): DataFrame = {
    val g = custOrderGraph(s, dir)
    g.rawQuery(
      """SELECT seg, count(*) AS n FROM nodes
        |WHERE array_contains(labels, 'Customer') AND seg <> :seg
        |GROUP BY seg ORDER BY seg""".stripMargin,
      Seq("seg"), Map("seg" -> "BUILDING"))
  }

  /** B11 — targeted edge delete: PLACED edges from BUILDING customers to
    * F-status orders are removed; LOCATED edges untouched.
    */
  def edgeDelete(s: SparkSession, dir: String): DataFrame = {
    val g = custOrderGraph(s, dir)
    val g2 = g.deleteEdges("PLACED",
      srcFilter = Seq(FieldFilter("seg", FilterOp.Eq, "BUILDING")),
      dstFilter = Seq(FieldFilter("status", FilterOp.Eq, "F")),
      keys = Seq("key"))
    g2.edges.groupBy("rel_type").agg(count(lit(1)).as("n")).orderBy("rel_type")
  }

  /** A8 — snapshot/resume: the same staged pipeline runs twice into one
    * workDir; the second run must SKIP both committed stages (asserted) and
    * read back the identical snapshot.
    */
  def resume(s: SparkSession, dir: String): DataFrame = {
    import graft.io.StageRunner
    val wd = java.nio.file.Files.createTempDirectory("graft-q-resume").toString
    def build(runner: StageRunner): DataFrame = {
      val ev = runner.stage("ev_filtered")(
        t(s, dir, "events").filter(col("event_type") =!= "error"))
      runner.stage("ev_stats")(
        ev.groupBy("event_type").agg(count(lit(1)).as("n"),
          min(col("ts")).as("first_ts"), max(col("ts")).as("last_ts")))
    }
    val r1 = new StageRunner(s, wd)
    try build(r1).count() finally r1.close()
    val r2 = new StageRunner(s, wd)
    try {
      require(r2.log.isCommitted("ev_filtered") && r2.log.isCommitted("ev_stats"),
        "first run must have committed both stages")
      build(r2).orderBy("event_type") // resume path: reads snapshots only
    } finally r2.close()
  }

  /** B6-temporal — timestamp predicates through the FieldFilter algebra
    * (reference date/datetime matching, test_model.py:1259-1430).
    */
  def temporalFilter(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events").withColumn("labels", array(lit("Event")))
    val g = Graph(ev, s.emptyDataFrame)
    g.matchNodes(Seq("Event"),
        FieldFilter("ts", FilterOp.Ge, to_timestamp(lit("2024-01-10 00:00:00"))),
        FieldFilter("ts", FilterOp.Lt, to_timestamp(lit("2024-01-20 00:00:00"))),
        FieldFilter("event_type", FilterOp.Eq, "click"))
      .select("event_id", "ts")
  }

  // ---------- training-data ops over documents/embeddings/events ----------

  /** Exact dedup: keep min doc_id per identical text. */
  def dedupExact(s: SparkSession, dir: String): DataFrame =
    Dedup.exact(t(s, dir, "documents"))
      .select("doc_id", "n_chars")

  /** Exact token-set Jaccard pairs (1-gram shingles) within one language
    * block. Exact all-pairs is O(block²) by nature — it is the small-block
    * verification tool; MinHash-LSH (q_minhash_pairs) is the corpus-scale
    * path. Bounding to one block keeps the exact variant honest about that.
    */
  def ngramJaccard(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").filter(col("lang") === "de")
    // token sets hashed to longs: set sizes (→ jaccard values) preserved
    // modulo xxhash collisions; long intersections beat string ones ~4×.
    // r6: the 1-gram token-hash set IS wordShingleHashes(n=1) — same
    // split/lower/trim, same xxhash64 values, same first-occurrence
    // distinct — so the native one-pass expression replaces the HOF chain
    val base = docs.select(col("lang").as("blk"), col("doc_id").as("id"),
      Dedup.wordShingleHashes(col("text"), 1).as("sh"))
    // A shuffle join on `blk` would hash on ~5 distinct languages — 5 busy
    // tasks no matter the cluster size. Broadcasting the right side keeps
    // the join partition-parallel on the left (and at real scale the exact
    // all-pairs variant is only ever run on blocks small enough to
    // broadcast — LSH covers the rest). Par.widen: the left leg otherwise
    // inherits the scan's split count — ONE task owning every pairwise
    // intersection when the block fits one split (guide §2.5 input skew).
    val l = graft.ops.Par.widen(base).alias("l"); val r = broadcast(base).alias("r")
    // size-ratio prefilter: jaccard >= θ implies min(|A|,|B|) >= θ·max —
    // exactness-preserving, cuts the candidate set before the array
    // intersection, which is where the time goes. The FINAL filter below is
    // on the 6-dp ROUNDED jaccard, so a raw value as low as 0.5 - 5e-7 can
    // still round up into the result set; the prefilter therefore uses
    // θ' = 0.5 - 5e-7 (the exact rounding boundary), not 0.5, so no
    // boundary pair the rounded filter would admit is pre-dropped.
    val thetaPre = 0.5 - 5e-7
    l.join(r, col("l.blk") === col("r.blk") && col("l.id") < col("r.id") &&
        size(col("l.sh")).cast("double") >= lit(thetaPre) * size(col("r.sh")) &&
        size(col("r.sh")).cast("double") >= lit(thetaPre) * size(col("l.sh")))
      // |A∪B| = |A|+|B|-|A∩B| exactly (hash-distinct sets): half the array
      // work of building the union, integer-identical denominator, so the
      // rounded double is bit-identical
      .withColumn("_i", size(array_intersect(col("l.sh"), col("r.sh"))))
      .withColumn("jaccard", round(col("_i").cast("double") /
        (size(col("l.sh")) + size(col("r.sh")) - col("_i")), 6))
      .filter(col("jaccard") >= 0.5)
      .select(col("l.id").as("a"), col("r.id").as("b"), col("jaccard"))
  }

  /** MinHash-LSH near-dup pairs (jaccard >= 0.9 on word 3-gram shingles). */
  def minhashPairs(s: SparkSession, dir: String): DataFrame =
    Dedup.minhashLshPairs(t(s, dir, "documents"), 0.9)
      .withColumn("jaccard", round(col("jaccard"), 6))

  /** MinHash-LSH dedup: drop whole near-dup components (CC over the pair
    * graph), keep min doc_id. Oracle = recursive-CTE components over the
    * exact-Jaccard pair set (valid at θ=0.9: LSH miss prob ≈ 3e-12).
    */
  def minhashDedup(s: SparkSession, dir: String): DataFrame =
    Dedup.minhashLshDedup(t(s, dir, "documents"), 0.9)
      .select("doc_id", "n_chars")

  /** Keep-best near-dup dedup: within each near-dup component survive the
    * highest-quality doc (rounded quality, doc_id tiebreak). Oracle-exact
    * because the quality formula itself is engine-portable (q_quality).
    */
  def minhashDedupBest(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
      .withColumn("_q6", TextOps.qualityScore(col("text")))
    Dedup.minhashLshDedupKeepBest(docs, 0.9, "_q6")
      .select("doc_id", "n_chars")
  }

  /** SimHash near-dup pairs, hamming <= 3. Value-exact via the two-table
    * dump: the oracle recomputes the band-blocked hamming pairs in SQL FROM
    * the dumped signature table (q_simhash_sigs), so the pair-generation
    * operator — the join/band/dedupe logic that can actually be wrong — is
    * value-checked even though the signature itself is engine-specific.
    */
  def simhashPairs(s: SparkSession, dir: String): DataFrame =
    Dedup.simhashPairs(t(s, dir, "documents"), 3)

  /** The (id, simhash) signature table — dumped so q_simhash_pairs' oracle
    * can derive the pairs from it (rows-only itself: xxhash-specific).
    */
  def simhashSigs(s: SparkSession, dir: String): DataFrame =
    Dedup.simhash(t(s, dir, "documents"))

  /** Text metrics: whitespace + BPE-ish token counts. */
  def tokenCounts(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(col("doc_id"),
      TextOps.tokenCountWs(col("text")).as("n_ws"),
      TextOps.tokenCountBpe(col("text")).as("n_bpe"))

  /** Language ID by stopword-ratio argmax. */
  def langId(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(col("doc_id"),
      TextOps.langId(col("text")).as("lang_pred"))

  /** Quality scoring. */
  def quality(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(col("doc_id"),
      TextOps.qualityScore(col("text")).as("quality"))

  /** Document fingerprint (rolling hash; engine-specific hash → rows-only). */
  def fingerprint(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(col("doc_id"),
      TextOps.fingerprint(col("text")).as("fingerprint"))

  /** Deterministic stratified sampling — the data-mix op: downweight the
    * overrepresented language (en → 30%), keep 80% of everything else.
    * Portable multiplicative-hash buckets, zero shuffles, value-exact.
    */
  def sampleStratified(s: SparkSession, dir: String): DataFrame =
    graft.ops.Sampling.sampleStratified(
        t(s, dir, "documents"), "lang", Map("en" -> 0.3), defaultRate = 0.8, salt = 7L)
      .select("doc_id", "lang")

  /** Deterministic train/val/test split assignment (80/10/10) — every row
    * lands in exactly one split on every rerun and every engine.
    */
  /** Temperature-balanced mix (alpha = 0.5, ~200 target rows): rare
    * languages keep a larger fraction than abundant ones (∝ sqrt of the
    * stratum count). Integer-threshold formula → value-exact SQL oracle.
    */
  def sampleTemperature(s: SparkSession, dir: String): DataFrame =
    graft.ops.Sampling.sampleTemperature(t(s, dir, "documents"), "lang",
        alpha = 0.5, targetRows = 200, salt = 5)
      .select("doc_id", "lang")

  def splitAssign(s: SparkSession, dir: String): DataFrame =
    graft.ops.Sampling.splitAssign(
        t(s, dir, "documents"), Seq("train", "val", "test"), Seq(0.8, 0.1, 0.1), salt = 3L)
      .select("doc_id", "split")

  /** Per-language quality quota: the 10 best documents per language by the
    * portable quality score (ties → lowest doc_id).
    */
  def quotaTopk(s: SparkSession, dir: String): DataFrame = {
    val scored = t(s, dir, "documents").select(col("doc_id"), col("lang"),
      TextOps.qualityScore(col("text")).as("quality"))
    graft.ops.Sampling.quotaPerGroup(scored, "lang", 10,
      Seq(col("quality").desc, col("doc_id")))
  }

  /** Gopher-style repetition metrics: duplicate-bigram fraction, top-token
    * fraction, and the combined repetition gate.
    */
  def repetition(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(col("doc_id"),
      round(TextOps.dupNgramFraction(col("text"), 2), 6).as("dup_bigram"),
      round(TextOps.topTokenFraction(col("text")), 6).as("top_token"),
      TextOps.repetitionOk(col("text")).as("rep_ok"))

  /** Corpus reporting stats per language: doc count, mean token length,
    * exact p50/p90 token percentiles (Spark `percentile` and DuckDB
    * `percentile_cont` share the linear-interpolation definition).
    * One hash aggregation; the exact percentile buffers per-group values —
    * at corpus scale swap in approx_percentile (t-digest, mergeable) and
    * drop the oracle to tolerance.
    */
  def corpusStats(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").groupBy("lang").agg(
      count(lit(1)).as("n_docs"),
      round(avg(size(split(trim(col("text")), "\\s+"))), 6).as("mean_tokens"),
      round(expr("percentile(size(split(trim(text), '\\\\s+')), 0.5)"), 6).as("p50_tokens"),
      round(expr("percentile(size(split(trim(text), '\\\\s+')), 0.9)"), 6).as("p90_tokens"))

  /** Exact vs t-digest percentiles per language with a 10% bound — the
    * sketch that replaces the exact percentile at corpus scale, kept
    * honest by the driver (the q_corpus_stats footnote as a gate).
    */
  def corpusPercentiles(s: SparkSession, dir: String): DataFrame =
    graft.ops.CorpusOps.tokenPercentiles(t(s, dir, "documents"))

  /** Corpus vocabulary: top 50 tokens by frequency (ties → lexicographic). */
  def vocabTopk(s: SparkSession, dir: String): DataFrame =
    graft.ops.CorpusOps.topTokens(t(s, dir, "documents"), 50)

  /** Benchmark decontamination: documents sharing any word 5-gram with the
    * synthetic benchmark slice (doc_id % 97 == 0) are dropped — including
    * the benchmark documents themselves, which share all of their grams.
    */
  def decontaminate(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val bench = docs.filter(col("doc_id") % 97 === 0)
    graft.ops.CorpusOps.decontaminate(docs, bench, n = 5)
      .select("doc_id", "lang")
  }

  /** Bloom-prefiltered decontamination — must be IDENTICAL to q_decontam
    * (same oracle): the sketch only shrinks the probe input; the exact
    * semi-join behind it kills every false positive.
    */
  def decontaminateBloom(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val bench = docs.filter(col("doc_id") % 97 === 0)
    graft.ops.CorpusOps.decontaminateBloom(docs, bench, n = 5)
      .select("doc_id", "lang")
  }

  /** Vocabulary size: exact distinct tokens + the HLL++ estimate bounded
    * to 5% relative error (the sketch that replaces the exact count at
    * 10^12 tokens, kept honest by the driver).
    */
  def vocabSize(s: SparkSession, dir: String): DataFrame =
    graft.ops.CorpusOps.vocabSize(t(s, dir, "documents"))

  /** Sequence packing: documents assigned to 200-token packs within 4
    * deterministic shards (pack = shard * 2^32 + floor(offset/budget)).
    */
  def packBySize(s: SparkSession, dir: String): DataFrame =
    graft.ops.CorpusOps.packBySize(t(s, dir, "documents"), 200L, 4)
      .select("doc_id", "pack_id")

  /** PII/noise scrub: synthetic URL/email/IP/account-number strings derived
    * deterministically from doc_id are appended to each document, then
    * scrubbed to typed placeholders. Both engines build the same input and
    * must produce byte-identical scrubbed text.
    */
  def scrub(s: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id").cast("string")
    val withPii = t(s, dir, "documents").select(col("doc_id"),
      concat_ws(" ", col("text"),
        lit("contact"), concat(lit("user"), id, lit("@example.com")),
        lit("at"), concat(lit("http://site"), id, lit(".com/path?q=1")),
        lit("ip"), concat(lit("10.0."), pmod(col("doc_id"), lit(256)).cast("string"), lit(".7")),
        lit("acct"), concat(lit("9"), lpad(pmod(col("doc_id"), lit(100000)).cast("string"), 7, "0"))
      ).as("text"))
    withPii.select(col("doc_id"), TextOps.scrubPii(col("text")).as("scrubbed"))
  }

  /** Brute-force cosine ANN: top-5 neighbors for query vectors vec_id < 8. */
  def annBruteForce(s: SparkSession, dir: String): DataFrame = {
    val embs = t(s, dir, "embeddings")
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("embedding"))
    val queries = embs.filter(col("vec_id") < 8)
    Similarity.bruteForceTopK(embs, queries, 5)
      .select(col("query_id"), col("item_id"), col("rank"), round(col("cos"), 6).as("cos"))
  }

  /** Quantized ANN: int8 scan + exact-float rescore. Deterministic, and the
    * 4× overscan absorbs the <1% quantization drift, so the result is the
    * exact brute-force top-k — value-checked against the same oracle.
    */
  def annQuantized(s: SparkSession, dir: String): DataFrame = {
    val embs = t(s, dir, "embeddings")
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("embedding"))
    val queries = embs.filter(col("vec_id") < 8)
    Similarity.quantizedTopK(embs, queries, 5)
      .select(col("query_id"), col("item_id"), col("rank"), round(col("cos"), 6).as("cos"))
  }

  /** IVF approximate ANN (scale path) — VALUE-EXACT gate: portable
    * double-fold-hash seeding + rounded-6dp argmax at every comparison
    * (assign, probe, final rank) let the oracle replay seed → assign →
    * probe → rank entirely in SQL; the recall floor stays in q_ann_recall.
    */
  def annIvf(s: SparkSession, dir: String): DataFrame = {
    val embs = t(s, dir, "embeddings")
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("embedding"))
    val queries = embs.filter(col("vec_id") < 8)
    Similarity.ivfTopK(embs, queries, 5, nCells = 16, nProbe = 4)
  }

  /** IVF with k-means-trained centroids (2 Lloyd iterations) — tighter
    * cells, higher recall at the same nProbe. VALUE-EXACT: the oracle
    * unrolls both Lloyd rounds (rounded means, keep-old-on-empty) the way
    * the q_kmeans oracle unrolls one, then replays the probe + rank.
    */
  def annIvfTrained(s: SparkSession, dir: String): DataFrame = {
    val embs = t(s, dir, "embeddings")
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("embedding"))
    val queries = embs.filter(col("vec_id") < 8)
    Similarity.ivfTopK(embs, queries, 5, nCells = 16, nProbe = 4,
      centsOpt = Some(trainedCents(embs, dir, 16, 2)))
  }

  /** Trained k-means centroids memoized per (dir content, k, iters) — the
    * pqCbCache rule: q_ann_ivf_trained and q_ann_recall share one training
    * run instead of re-running the Lloyd rounds per gate.
    */
  private val kmCache =
    scala.collection.concurrent.TrieMap.empty[(String, Int, Int), Seq[(Long, Seq[Double])]]
  private def trainedCents(embs: DataFrame, dir: String, k: Int,
                           iters: Int): Seq[(Long, Seq[Double])] =
    kmCache.getOrElseUpdate((s"$dir@${dirFingerprint(dir)}", k, iters),
      Similarity.kmeansCentroids(embs, k, iters))

  /** Int8 symmetric quantization of the embedding table: per vector the
    * scale (rounded) and exact integer aggregates of the quantized values —
    * the engine-portable floor(x/scale + 0.5) rule makes the ints
    * bit-identical across engines.
    */
  def quantize(s: SparkSession, dir: String): DataFrame =
    graft.ops.Quantize.table(t(s, dir, "embeddings"))
      .select(col("vec_id"),
        round(col("scale"), 6).as("scale"),
        aggregate(col("q"), lit(0L), (a, x) => a + x).as("q_sum"),
        array_min(col("q")).as("q_min"),
        array_max(col("q")).as("q_max"))

  /** Embedding near-dup pairs, exact within label blocks (oracle-checkable). */
  def embedNearDup(s: SparkSession, dir: String): DataFrame = {
    val embs = t(s, dir, "embeddings").select(col("vec_id"), col("label"),
      expr("transform(embedding, x -> cast(x as double))").as("v"))
    val l = embs.alias("l"); val r = embs.alias("r")
    l.join(r, col("l.label") === col("r.label") && col("l.vec_id") < col("r.vec_id"))
      .withColumn("cos", round(Similarity.cosine(col("l.v"), col("r.v")), 6))
      .filter(col("cos") >= 0.3)
      .select(col("l.vec_id").as("a"), col("r.vec_id").as("b"), col("cos"))
  }

  /** Embedding near-dup via sign-LSH blocking — VALUE-EXACT two-table-dump
    * gate (the q_simhash_sigs → q_simhash_pairs pattern): the band
    * signatures themselves are engine-specific (xxhash64 hyperplanes →
    * q_lsh_sigs stays rows-only), but the PAIR OPERATOR — 4×4-bit banding,
    * candidate self-join, dedupe, exact rounded-cosine ≥ 0.3 verify — is
    * recomputed by the oracle in SQL from the dumped signatures.
    */
  def embedNearDupLsh(s: SparkSession, dir: String): DataFrame = {
    val embs = t(s, dir, "embeddings")
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("embedding"))
    Similarity.cosinePairsLsh(embs, 0.3, bits = 16, bandBits = 4)
  }

  /** Sign-LSH band-signature dump for q_embed_neardup_lsh's oracle —
    * (vec_id, sig): 16 hyperplane-sign bits packed into a long, the exact
    * signatures the pair gate bands 4×4 bits. Rows-only itself (xxhash64-
    * derived hyperplanes have no portable SQL twin).
    */
  def lshSigs(s: SparkSession, dir: String): DataFrame = {
    val embs = t(s, dir, "embeddings")
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("embedding"))
    embs.select(col("vec_id"), Similarity.signLsh(col("embedding"), 16).as("sig"))
  }

  /** Recall gate for the approximate similarity operators: each variant's
    * result is compared IN SPARK against the exact reference that is itself
    * value-checked by its own gate (brute-force top-k / exact cosine
    * pairs), and the gate emits one deterministic row per variant —
    * (variant, n_ref, recall_ok). The oracle is the literal expectation, so
    * the DRIVER (not just a spec) fails the round if an approximate
    * operator regresses. Everything is deterministic: seeded centroids,
    * hash-derived hyperplanes, no RNG.
    *
    * Two kinds of rows:
    *  - `ivf_full_probe` is a STRUCTURAL EXACTNESS invariant: probing every
    *    cell must reproduce the brute-force top-k EXACTLY (recall == 1.0).
    *    Any bug in assignment, probing, candidate join, or ranking breaks
    *    it — zero approximation slack.
    *  - the approximate settings carry calibrated floors. The driver's
    *    synthetic embeddings are near-uniform (no cluster structure), the
    *    adversarial case for space-partitioning ANN: probing 4/16 cells
    *    measures recall ≈ 0.48-0.50 here (vs ≥ 0.9 on the clustered
    *    SimilaritySpec fixture — IVF's design regime), and 4-band 4-bit
    *    sign-LSH at θ=0.3 ≈ 0.43 (theory: 1-(1-p⁴)⁴ ≈ 0.42 at the
    *    threshold). Floors at 0.35 / 0.3 sit above the ~0.25 a
    *    wrong-cells/wrong-bands implementation would score but below honest
    *    run-to-run structure, so they gate implementation regressions, not
    *    data luck.
    */
  def annRecall(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val embs = t(s, dir, "embeddings")
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("embedding"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val queries = embs.filter(col("vec_id") < 8)

    // the exact reference is shared by every top-k variant: compute + pin
    // it ONCE (recomputing the cross-join + window per variant was the
    // dominant cost of this gate)
    val exact = Similarity.bruteForceTopK(embs, queries, 5)
      .select(col("query_id"), col("item_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nRef = exact.count()

    def topkRecall(approx: DataFrame, floor: Double): (Long, Boolean) = {
      val hit = exact.join(approx.select(col("query_id"), col("item_id")),
        Seq("query_id", "item_id"), "left_semi").count()
      (nRef, hit.toDouble / nRef >= floor)
    }
    val (fullN, fullOk) = topkRecall(
      Similarity.ivfTopK(embs, queries, 5, nCells = 16, nProbe = 16), floor = 1.0)
    val (ivfN, ivfOk) = topkRecall(
      Similarity.ivfTopK(embs, queries, 5, nCells = 16, nProbe = 4), floor = 0.35)
    val (trN, trOk) = topkRecall(
      Similarity.ivfTopK(embs, queries, 5, nCells = 16, nProbe = 4,
        centsOpt = Some(trainedCents(embs, dir, 16, 2))),
      floor = 0.35)
    // PQ: the approximate setting measures ≈ 0.6 here (m=8 8-dim subspaces
    // on 64-d near-uniform vectors, overscan 8); floor 0.4 gates gross
    // code / LUT / ADC regressions. Full overscan makes the rescore set
    // the whole corpus → must reproduce brute force EXACTLY (floor 1.0):
    // the second structural invariant. The codebook is memoized and shared
    // with q_ann_pq — training is ~2·m driver-collect rounds of heavily
    // codegen'd literal expressions, the expensive part of this gate.
    val pqCb = pqCodebook(embs, dir)
    val pqE = pqEncoded(s, embs, dir)
    val (pqN, pqOk) = topkRecall(
      graft.ops.Pq.pqTopK(embs, queries, 5, pqCb, overscan = 8,
        encOpt = Some(pqE)), floor = 0.4)
    val (pqfN, pqfOk) = topkRecall(
      graft.ops.Pq.pqTopK(embs, queries, 5, pqCb, overscan = 128,
        encOpt = Some(pqE)), floor = 1.0)
    // composed IVF-PQ: recall multiplies the two approximations (floor
    // 0.2); probing every cell at full overscan must again be EXACT.
    val (ipqN, ipqOk) = topkRecall(
      graft.ops.Pq.ivfPqTopK(embs, queries, 5, pqCb, nCells = 16, nProbe = 4,
        overscan = 8), floor = 0.2)
    val (ipqfN, ipqfOk) = topkRecall(
      graft.ops.Pq.ivfPqTopK(embs, queries, 5, pqCb, nCells = 16, nProbe = 16,
        overscan = 128), floor = 1.0)
    exact.unpersist()

    // LSH near-dup recall vs the exact global cosine >= 0.3 pair set
    // (threshold on the 6-dp-rounded cosine, the same boundary rule the
    // value-gated q_embed_neardup uses, so the oracle can recompute n_ref
    // exactly in SQL)
    val l = embs.alias("l"); val r = embs.alias("r")
    val exactPairs = l.join(r, col("l.vec_id") < col("r.vec_id"))
      .filter(round(Similarity.cosine(col("l.embedding"), col("r.embedding")), 6) >= 0.3)
      .select(col("l.vec_id").as("a"), col("r.vec_id").as("b"))
    val lshPairs = Similarity.cosinePairsLsh(embs, 0.3, bits = 16, bandBits = 4)
      .select("a", "b")
    val nPairs = exactPairs.count()
    val lshHit = exactPairs.join(lshPairs, Seq("a", "b"), "left_semi").count()
    val lshOk = lshHit.toDouble / nPairs >= 0.3
    embs.unpersist()

    Seq(("ivf_full_probe", fullN, fullOk), ("ivf", ivfN, ivfOk),
        ("ivf_trained", trN, trOk), ("lsh_neardup", nPairs, lshOk),
        ("pq", pqN, pqOk), ("pq_full_overscan", pqfN, pqfOk),
        ("ivf_pq", ipqN, ipqOk), ("ivf_pq_full", ipqfN, ipqfOk))
      .toDF("variant", "n_ref", "recall_ok")
  }

  /** Memoized PQ codebook per sf dir (training is deterministic, so the
    * gate queries sharing one codebook changes no result — it only stops
    * q_ann_recall and q_ann_pq from paying the training twice in one Verify
    * run). The cache key includes a cheap fingerprint of the embeddings
    * parquet files (count + max mtime + total bytes), so a long-lived JVM
    * whose data dir is REGENERATED between runs retrains instead of
    * silently scoring against a stale codebook.
    */
  private val pqCbCache = scala.collection.concurrent.TrieMap.empty[String, graft.ops.Pq.Codebook]
  private def dirFingerprint(dir: String, table: String = "embeddings"): String = {
    val files = Option(new java.io.File(s"$dir/$table.parquet"))
      .filter(_.exists())
      .map(f => if (f.isDirectory) f.listFiles().toSeq else Seq(f))
      .getOrElse(Seq.empty)
    s"${files.size}:${files.map(_.lastModified()).maxOption.getOrElse(0L)}:${files.map(_.length()).sum}"
  }
  private def pqCodebook(embs: DataFrame, dir: String): graft.ops.Pq.Codebook =
    pqCbCache.getOrElseUpdate(s"$dir@${dirFingerprint(dir)}",
      graft.ops.Pq.train(embs, m = 8, ksub = 16, iters = 2))

  /** PQ encode table memo (the pqCbCache rule + session identity, the
    * sccCache rule): the encode projection inlines the whole codebook as
    * literals, so compiling/running it once per (session, dir content) and
    * pinning the 3-column result serves q_ann_pq and both of
    * q_ann_recall's PQ probes from one job.
    */
  private val pqEncCache = scala.collection.concurrent.TrieMap.empty[(Int, String), DataFrame]
  private def pqEncoded(s: SparkSession, embs: DataFrame, dir: String): DataFrame =
    pqEncCache.getOrElseUpdate(
      (System.identityHashCode(s), s"$dir@${dirFingerprint(dir)}"), {
        graft.ops.Pq.encode(embs, pqCodebook(embs, dir))
          .select(col("vec_id").as("item_id"), col("codes"), col("recon_norm"))
          .localCheckpoint()
      })

  /** Trained-codebook dump for the PQ oracles (the two-table-dump pattern):
    * one row per (subspace j, code c, dim) carrying the centroid component
    * w AND the per-(j,c) squared norm sqn (dumped rather than recomputed so
    * the oracle's L2-correction and reconstructed norms use the exact
    * doubles the engine used — no cross-engine float-summation drift).
    * Rows-only itself: the training floats are engine-specific; everything
    * DOWNSTREAM of them (encode, ADC, rescore) is replayed value-exactly by
    * q_ann_pq / q_ann_ivfpq from this dump.
    */
  def pqCodebookDump(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val embs = t(s, dir, "embeddings")
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("embedding"))
    val cb = pqCodebook(embs, dir)
    val sq = cb.sqNorms
    (for (j <- 0 until cb.m; c <- 0 until cb.ksub; d <- 0 until cb.d)
      yield (j, c, d, cb.cents(j)(c)(d), sq(j)(c)))
      .toDF("j", "c", "dim", "w", "sqn")
  }

  /** PQ ANN top-k — VALUE-EXACT via the q_pq_codebook dump: the oracle
    * replays encode (rounded-6dp L2 argmax) → reconstructed norms → LUT →
    * ADC ranking → overscan candidates → exact rescore, all in SQL from
    * the dumped codebook. q_ann_recall's pq rows keep the quality floor +
    * the full-overscan structural exactness invariant.
    */
  def annPq(s: SparkSession, dir: String): DataFrame = {
    val embs = t(s, dir, "embeddings")
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("embedding"))
    val queries = embs.filter(col("vec_id") < 8)
    graft.ops.Pq.pqTopK(embs, queries, 5, pqCodebook(embs, dir), overscan = 8,
      encOpt = Some(pqEncoded(s, embs, dir)))
  }

  /** IVF-PQ ANN top-k, in-memory composed path — VALUE-EXACT: the oracle
    * composes the q_ann_ivf replay (portable seeds, rounded probe) with
    * the q_ann_pq replay (dumped codebook → ADC) and rescores exactly;
    * q_ann_ivfpq_mat additionally asserts the MATERIALIZED-table path
    * reproduces this row-for-row.
    */
  def annIvfPq(s: SparkSession, dir: String): DataFrame = {
    val embs = t(s, dir, "embeddings")
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("embedding"))
    val queries = embs.filter(col("vec_id") < 8)
    graft.ops.Pq.ivfPqTopK(embs, queries, 5, pqCodebook(embs, dir),
      nCells = 8, nProbe = 3, overscan = 8)
  }

  /** IVF-PQ served from the cell-PARTITIONED materialized encode table
    * ([[graft.ops.Pq.writeEncoded]] → `ivfPqTopKFromTable`, probed cells
    * pruned at the partition level). Value gate: the oracle reads the
    * q_ann_ivfpq dump — the production table layout must reproduce the
    * in-memory path row-for-row, bit-for-bit.
    */
  def annIvfPqMat(s: SparkSession, dir: String): DataFrame = {
    val embs = t(s, dir, "embeddings")
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("embedding"))
    val queries = embs.filter(col("vec_id") < 8)
    val cb = pqCodebook(embs, dir)
    val cents = Similarity.seedCentroids(embs, 8)
    val encPath = java.nio.file.Files.createTempDirectory("graft-ivfpq-enc").toString
    graft.ops.Pq.writeEncoded(embs, cb, cents, encPath)
    graft.ops.Pq.ivfPqTopKFromTable(encPath, embs, queries, 5, cb, cents,
      nProbe = 3, overscan = 8)
  }

  /** A11/B13 — deterministic artifact naming THROUGH the registry: specs
    * are registered by name, looked back up (get_class_by_name analogue),
    * and their table names/paths emitted — including the per-call namespace
    * override beating the registry default (the reference's `database=`
    * parameter precedence). Oracle = the literal expected strings, so the
    * naming contract (nodeset.py:123-141, model.py:596) is value-gated, not
    * just spec-tested.
    */
  def naming(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val schema = new GraphSchema(defaultNamespace = "prod")
    schema.register("cust", NodeSpec(Seq("Customer"), Seq("uuid"),
      additionalLabels = Seq("Gold")))
    schema.register("line", NodeSpec(Seq("Line"), Seq("l_orderkey", "l_linenumber")))
    schema.register("placed", RelSpec("PLACED", Seq("Customer"), Seq("Order"),
      Seq(EqKey("key")), Seq(EqKey("key"))))
    require(schema.nodeNames == Set("cust", "line") && schema.relNames == Set("placed"),
      s"registry lookup mismatch: ${schema.nodeNames} / ${schema.relNames}")
    Seq(
      ("cust_name", GraphSchema.nodeTableName(schema.node("cust"))),
      ("cust_path", schema.nodeTablePath("/warehouse", schema.node("cust"))),
      ("cust_path_override", schema.nodeTablePath("/warehouse", schema.node("cust"),
        namespace = Some("staging"))),
      ("line_name", GraphSchema.nodeTableName(schema.node("line"))),
      ("placed_name", GraphSchema.relTableName(schema.rel("placed"))),
      ("placed_path", schema.relTablePath("/warehouse", schema.rel("placed")))
    ).toDF("entity", "value")
  }

  // ---------- KG pipeline shapes over events-as-transcripts ----------

  /** Triple extraction + aggregation: events → (subj, pred, obj, support). */
  def kgTriples(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events").select(
        concat(lit("user:"), col("user_id")).as("subj"),
        col("event_type").as("pred"),
        concat(lit("bucket:"), floor(col("value") / 100).cast("long")).as("obj"))
      .groupBy("subj", "pred", "obj").agg(count(lit(1)).as("support"))

  /** Entity node table via NodeSetOps.merge over extracted triples. */
  def kgEntities(s: SparkSession, dir: String): DataFrame = {
    val triples = kgTriples(s, dir)
    val rows = triples.select(col("subj").as("name"), col("support"))
      .unionAll(triples.select(col("obj").as("name"), col("support")))
      .groupBy("name").agg(sum(col("support")).as("mentions"))
    NodeSetOps.merge(None, rows, NodeSpec(Seq("Entity"), Seq("name")))
      .select("name", "mentions")
  }

  /** Connected components (user ↔ event_type bipartite graph). */
  def ccEvents(s: SparkSession, dir: String): DataFrame = {
    val edges = t(s, dir, "events").select(
      concat(lit("u:"), col("user_id")).as("a"),
      concat(lit("e:"), col("event_type")).as("b")).distinct()
    graft.kg.ConnectedComponents.runOnStrings(edges, "a", "b")
      .withColumnRenamed("key", "node").withColumnRenamed("canonical", "component")
  }

  /** Salted two-phase per-conversation aggregation over events.
    * (r6 note, measured: a Par.widen before the partial aggregation was
    * tried and REGRESSED 0.69 s → 1.1 s — the keyless repartition's
    * sort-before-repartition serializes on the narrow scan and costs more
    * than the parallelism it buys; the partial agg is not CPU-dense enough
    * to amortize it. Widen stays reserved for signature-grade stages.)
    */
  def convStats(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val partial = ev.groupBy(col("user_id"), pmod(col("event_id"), lit(16)).as("_salt"))
      .agg(count(lit(1)).as("n"), collect_set(col("event_type")).as("et"),
        min(col("ts")).as("mn"), max(col("ts")).as("mx"))
    partial.groupBy("user_id")
      .agg(sum(col("n")).as("n_events"),
        array_join(array_sort(array_distinct(flatten(collect_list(col("et"))))), ",").as("event_types"),
        min(col("mn")).as("first_ts"), max(col("mx")).as("last_ts"))
  }

  /** Tumbling-window aggregation (the batch face of the streaming
    * turn-rate monitor — same expression runs under readStream with a
    * watermark in streaming.IncrementalPipeline.turnRates).
    */
  def windowAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col("event_type"), col("n"))

  /** Stateful sessionization (flatMapGroupsWithState) in its BATCH face:
    * events reshaped as transcript turns (user = conversation, ordinal =
    * turn_idx), one cumulative snapshot row per conversation. The streaming
    * face (micro-batch accumulation + event-time-timeout close) is spec-
    * tested in SessionTrackerSpec; batch/SQL parity is what the oracle can
    * check.
    */
  def sessionize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val turns = t(s, dir, "events").select(
        col("user_id").cast("string").as("conv_id"),
        (row_number().over(w) - 1).as("turn_idx"),
        col("event_type").as("role"),
        lit("").as("text"),
        lit(null).cast("string").as("tool"),
        col("ts"))
      .as[graft.schema.TranscriptTurn]
    graft.streaming.SessionTracker.sessionize(turns, gapMs = 0L).toDF()
      // the source ts is timestamp_ntz; the encoder round-trip produced
      // (session-tz) timestamp — cast back so the parquet dump carries the
      // same int64-µs NTZ type the oracle compares against (UTC session ⇒
      // wall clock preserved)
      .withColumn("first_ts", col("first_ts").cast("timestamp_ntz"))
      .withColumn("last_ts", col("last_ts").cast("timestamp_ntz"))
  }

  /** Co-mention edges: event types co-occurring in one user's stream,
    * support = distinct users (GraphAlgos.coMentionEdges: within-group
    * self-join, never corpus-wide all-pairs).
    */
  def comention(s: SparkSession, dir: String): DataFrame =
    graft.kg.GraphAlgos.coMentionEdges(
        t(s, dir, "events").select(col("user_id"), col("event_type")),
        "user_id", "event_type")
      .orderBy("a", "b")

  /** k-hop BFS reachability with minimum hop counts over the undirected
    * user ↔ event_type bipartite graph, from one source node. Oracle: a
    * recursive CTE bounded at the same hop limit.
    */
  def khop(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val directed = ev.select(
      concat(lit("u:"), col("user_id")).as("src"),
      concat(lit("e:"), col("event_type")).as("dst"))
    // undirected = both directions; the operator itself is directed
    val edges = directed.unionAll(directed.select(col("dst").as("src"), col("src").as("dst")))
    val sources = s.range(1).select(lit("u:1").as("node"))
    graft.kg.GraphAlgos.bfsReachable(edges, sources, maxHops = 3)
  }

  /** Per-node triangle counts over the event-type co-mention graph
    * (degree-oriented wedge enumeration — each triangle found once).
    */
  def triangles(s: SparkSession, dir: String): DataFrame = {
    val edges = graft.kg.GraphAlgos.coMentionEdges(
      t(s, dir, "events").select(col("user_id"), col("event_type")),
      "user_id", "event_type")
    graft.kg.GraphAlgos.triangleCounts(edges.select("a", "b"))
  }

  /** Structural similarity: Jaccard of user-neighborhoods between event
    * types — only pairs with non-zero overlap materialize.
    */
  def neighborJacc(s: SparkSession, dir: String): DataFrame =
    graft.kg.GraphAlgos.neighborJaccard(
        t(s, dir, "events").select(col("event_type"), col("user_id")),
        "event_type", "user_id")
      .orderBy("a", "b")

  /** Winnowing fingerprints (k=5-gram, window w=4) over documents —
    * [[graft.ops.TextOps.winnow]]; every selected (print, pos) replayed
    * in SQL via the portable polynomial hash and the encoded
    * rightmost-tie window minimum.
    */
  def winnowGate(s: SparkSession, dir: String): DataFrame =
    graft.ops.TextOps.winnow(t(s, dir, "documents"), k = 5, w = 4)

  /** Copy-span document pairs by shared winnowed fingerprints —
    * [[graft.ops.TextOps.winnowPairs]] over the same winnow run; oracle
    * recomputes the pairs in SQL from the q_winnow dump (two-table-dump
    * pattern).
    */
  def winnowPairsGate(s: SparkSession, dir: String): DataFrame =
    graft.ops.TextOps.winnowPairs(winnowGate(s, dir), minShared = 2)

  /** Per-user time-weighted average of event values (each value held
    * until the next sample) — [[graft.ops.Temporal.timeWeightedAvg]];
    * exact integer-µs weights, 6-dp display rounding.
    */
  def twaGate(s: SparkSession, dir: String): DataFrame =
    graft.ops.Temporal.timeWeightedAvg(t(s, dir, "events"), Seq("user_id"),
        "ts", "value", orderCols = Seq("event_id"))
      .select(col("user_id"), round(col("twa"), 6).as("twa"))

  /** Cross-split exact-content leakage audit under the q_split
    * assignment — [[graft.ops.Curation.splitLeakage]]; integer counts,
    * exact gate.
    */
  def splitLeakageGate(s: SparkSession, dir: String): DataFrame =
    graft.ops.Curation.splitLeakage(t(s, dir, "documents"),
      Seq("train", "val", "test"), Seq(0.8, 0.1, 0.1), salt = 3L)

  /** Per-dimension z-scored embeddings in long form —
    * [[graft.ops.Similarity.standardize]], 6-dp rounding.
    */
  def standardizeGate(s: SparkSession, dir: String): DataFrame =
    graft.ops.Similarity.standardize(t(s, dir, "embeddings"))
      .withColumnRenamed("id", "vec_id")

  /** n-gram containment near-superset pairs within the 'en' block —
    * [[graft.ops.Dedup.ngramContainmentPairs]] over hashed 3-gram
    * shingles; oracle recomputes the same shingle sets as strings.
    * Integer set sizes → the score and the threshold are exact on both
    * engines.
    */
  def ngramContainment(s: SparkSession, dir: String): DataFrame =
    graft.ops.Dedup.ngramContainmentPairs(
        t(s, dir, "documents").filter(col("lang") === "en"), "lang",
        threshold = 0.1)
      .select(col("a"), col("b"), round(col("containment"), 6).as("containment"))

  /** MMR diversity selection (k=5, λ=0.7) over the embeddings corpus,
    * query = vector 0, candidates = everything else —
    * [[graft.ops.Similarity.mmrSelect]]. The oracle replays all five
    * greedy rounds with unrolled SQL.
    */
  def mmrGate(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val q = emb.filter(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>")).head().getSeq[Double](0)
    graft.ops.Similarity.mmrSelect(emb.filter(col("vec_id") =!= 0), q,
        k = 5, lambda = 0.7)
      .withColumnRenamed("id", "vec_id")
  }

  /** The fixed merge vocabulary for the q_bpe encoder gate (the trainer
    * is spec-tested; the encoder's replace-chain contract is what the
    * cross-engine oracle can replay verbatim).
    */
  val BpeMerges: Seq[(String, String)] = Seq(
    ("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"), ("an", "d"), ("e", "r"),
    ("o", "n"), ("r", "e"), ("o", "r"), ("s", "t"), ("a", "t"), ("e", "n"))

  /** BPE-merge segmentation over documents with a fixed 12-merge
    * vocabulary — [[graft.ops.TextOps.bpeSegment]]. The dump carries the
    * token count and the sha256 of the full segmentation, so a single
    * mis-merged character anywhere in the corpus breaks the gate.
    */
  def bpeGate(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(col("doc_id"),
      TextOps.bpeTokenCount(col("text"), BpeMerges).as("n_tokens"),
      sha2(TextOps.bpeSegment(col("text"), BpeMerges), 256).as("seg_sha"))

  /** Per-user trailing EWMA (k=6, α=0.5) of event values under the
    * (ts, event_id) total order — [[graft.ops.EventAnalytics.ewma]].
    * Powers of 0.5 are exact IEEE doubles and the oracle unrolls the
    * identical lag expression, so values match bit-for-bit before the
    * 6-dp display rounding.
    */
  def ewmaGate(s: SparkSession, dir: String): DataFrame =
    graft.ops.EventAnalytics.ewma(t(s, dir, "events"), "value",
        groupCols = Seq("user_id"), orderCols = Seq("ts", "event_id"),
        k = 6, alpha = 0.5)
      .select(col("event_id"), round(col("ewma"), 6).as("ewma"))

  /** 2-D Pareto frontier over documents: maximize distinct-token count,
    * minimize total token count (the "densest vocabulary per token paid"
    * curation skyline) — [[graft.ops.CorpusOps.paretoFrontier]]. Integer
    * dimensions, exact gate.
    */
  def paretoGate(s: SparkSession, dir: String): DataFrame = {
    val toks = split(lower(trim(col("text"))), "\\s+")
    val base = t(s, dir, "documents").select(col("doc_id"),
      size(array_distinct(toks)).as("d"), size(toks).as("n"))
    graft.ops.CorpusOps.paretoFrontier(base, "d", "n").select("doc_id", "d", "n")
  }

  /** The "rapid handoff" digraph shared by q_scc and q_walks: u→v when
    * v's event follows u's in the same event stream within 30 seconds
    * (exact epoch-microsecond comparison on both engines).
    */
  private def handoffEdges(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy(col("ts"), col("event_id"))
    val seq = t(s, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("nxt", lead(col("user_id"), 1).over(w))
      .withColumn("nts", lead(col("ts"), 1).over(w))
    seq.filter(col("nxt").isNotNull && col("nxt") =!= col("user_id") &&
        unix_micros(col("nts").cast("timestamp")) -
          unix_micros(col("ts").cast("timestamp")) <= 30000000L)
      .select(col("user_id").as("src"), col("nxt").as("dst")).distinct()
  }

  // q_scc and q_condensation share one SCC run on the same edge set
  private val sccCache =
    scala.collection.concurrent.TrieMap.empty[(Int, String), DataFrame]

  /** Strongly connected components of the "rapid handoff" digraph (30s
    * gap, exact epoch-µs comparison on both engines) —
    * [[graft.kg.GraphAlgos.scc]] min-label partition refinement vs a
    * DuckDB recursive-CTE transitive-closure oracle. At sf0.01 this
    * yields one 50-node component plus singletons, so both the
    * cycle-collapse and the DAG paths are exercised; localThreshold 50
    * makes the gate run the DISTRIBUTED refinement for the bulk and the
    * Tarjan cutover for the tail — both code paths. Cached per
    * (session, dir): q_condensation reuses the run, and keying on the
    * session keeps a restarted SparkSession from resurrecting checkpoints
    * of a stopped context.
    */
  def sccGate(s: SparkSession, dir: String): DataFrame =
    sccCache.getOrElseUpdate((System.identityHashCode(s), dir),
      graft.kg.GraphAlgos.scc(handoffEdges(s, dir), localThreshold = 50))

  /** Condensation DAG of the handoff digraph with longest-path layering —
    * [[graft.kg.GraphAlgos.condensationLevels]]; oracle recomputes the
    * SCCs, the condensed edges, and the longest paths via recursive CTE.
    */
  def condensationGate(s: SparkSession, dir: String): DataFrame =
    graft.kg.GraphAlgos.condensationLevels(handoffEdges(s, dir),
      precomputedScc = Some(sccGate(s, dir)))

  /** Deterministic 4-step random walks over the handoff digraph —
    * [[graft.kg.GraphAlgos.randomWalks]]; every hop replayed bit-for-bit
    * by the portable-hash SQL oracle.
    */
  def walksGate(s: SparkSession, dir: String): DataFrame =
    graft.kg.GraphAlgos.randomWalks(handoffEdges(s, dir), walkLen = 4, seed = 7)

  /** node2vec-biased 3-step walks over the handoff digraph —
    * [[graft.kg.GraphAlgos.biasedWalks]] (return 1 / common 4 / far 2):
    * step 1 uniform, steps 2–3 biased by the previous node; every hop —
    * weight classes, cumulative ranges, hash pick — replayed bit-for-bit
    * by the oracle. Exact gate.
    */
  def biasedWalksGate(s: SparkSession, dir: String): DataFrame =
    graft.kg.GraphAlgos.biasedWalks(handoffEdges(s, dir), walkLen = 3,
      seed = 11, wReturn = 1, wCommon = 4, wFar = 2)

  /** Per-node degree stats over the directed user→event_type graph. */
  def degrees(s: SparkSession, dir: String): DataFrame =
    graft.kg.GraphAlgos.degrees(
      t(s, dir, "events").select(
        concat(lit("u:"), col("user_id")).as("src"),
        concat(lit("e:"), col("event_type")).as("dst")))

  /** Fixed-iteration PageRank (3 rounds, d=0.85) over the directed
    * user→event_type graph; rounded to 6 dp so parallel-vs-sequential
    * float summation order cannot split the value-exact compare.
    */
  def pagerank(s: SparkSession, dir: String): DataFrame = {
    val edges = t(s, dir, "events").select(
      concat(lit("u:"), col("user_id")).as("src"),
      concat(lit("e:"), col("event_type")).as("dst"))
    graft.kg.GraphAlgos.pageRank(edges, iters = 3)
      .select(col("n"), round(col("r"), 6).as("r"))
  }

  /** Personalized PageRank (random walk with restart) seeded at two user
    * nodes — "relevance to these entities" over the user→event_type graph;
    * 3 iterations, rounded to 6 dp, against an unrolled-SQL oracle.
    */
  def pagerankPersonal(s: SparkSession, dir: String): DataFrame = {
    val edges = t(s, dir, "events").select(
      concat(lit("u:"), col("user_id")).as("src"),
      concat(lit("e:"), col("event_type")).as("dst"))
    val sources = s.range(2).select(concat(lit("u:"), col("id") + 1).as("node"))
    graft.kg.GraphAlgos.pageRankPersonalized(edges, sources, iters = 3)
      .select(col("n"), round(col("r"), 6).as("r"))
  }

  /** HITS hubs/authorities over the directed user→event_type graph:
    * 2 iterations of L1-normalized mutual reinforcement, 6 dp, unrolled
    * SQL oracle.
    */
  def hitsScores(s: SparkSession, dir: String): DataFrame = {
    val edges = t(s, dir, "events").select(
      concat(lit("u:"), col("user_id")).as("src"),
      concat(lit("e:"), col("event_type")).as("dst"))
    graft.kg.GraphAlgos.hits(edges, iters = 2)
      .select(col("n"), round(col("hub"), 6).as("hub"), round(col("auth"), 6).as("auth"))
  }

  /** Weighted PageRank: edge weight = event support count per
    * (user, event_type), so heavily-evidenced relations carry more rank;
    * 3 iterations, 6 dp, unrolled-SQL oracle.
    */
  def pagerankWeighted(s: SparkSession, dir: String): DataFrame = {
    val edges = t(s, dir, "events").groupBy(
        concat(lit("u:"), col("user_id")).as("src"),
        concat(lit("e:"), col("event_type")).as("dst"))
      .agg(count(lit(1)).as("weight"))
    graft.kg.GraphAlgos.pageRankWeighted(edges, iters = 3)
      .select(col("n"), round(col("r"), 6).as("r"))
  }

  /** k-core membership (k=3) of the undirected user ↔ value-bucket
    * bipartite graph (user degrees vary 2-4 here, so the peel genuinely
    * cascades — the user ↔ event_type graph is complete-bipartite and
    * never peels) — dumped as (node, core_deg) so the check gate's oracle
    * can re-validate the core from the dump (rows-only itself).
    */
  def kcore(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val edges = ev.select(
      concat(lit("u:"), col("user_id")).as("a"),
      concat(lit("b:"), floor(col("value") / 100).cast("long")).as("b"))
    graft.kg.GraphAlgos.kCore(edges, k = 3)
  }

  /** Community detection: deterministic synchronous LPA (2 rounds,
    * min-label ties) over the undirected user ↔ value-bucket graph —
    * value-exact against the unrolled-SQL oracle because the sync rounds +
    * total tie order make the labeling a pure function of the graph.
    */
  def communities(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val edges = ev.select(
      concat(lit("u:"), col("user_id")).as("a"),
      concat(lit("b:"), floor(col("value") / 100).cast("long")).as("b"))
    graft.kg.GraphAlgos.labelPropagation(edges, iters = 2)
  }

  /** Bounded-hop weighted shortest paths (3 Bellman-Ford rounds) from
    * user node u:1 over the undirected user ↔ value-bucket graph with
    * edge weight = per-pair event support. Integer weights make the
    * distances exact; oracle = the same 3 rounds unrolled in SQL.
    */
  def sssp(s: SparkSession, dir: String): DataFrame = {
    val ed = t(s, dir, "events").groupBy(
        concat(lit("u:"), col("user_id")).as("a"),
        concat(lit("b:"), floor(col("value") / 100).cast("long")).as("b"))
      .agg(count(lit(1)).as("w"))
    val sym = ed.select(col("a").as("src"), col("b").as("dst"), col("w").as("weight"))
      .unionByName(ed.select(col("b").as("src"), col("a").as("dst"), col("w").as("weight")))
    val sources = s.range(1).select(lit("u:1").as("node"))
    graft.kg.GraphAlgos.sssp(sym, sources, iters = 3)
  }

  /** Self+oracle-verifying k-core gate: Spark asserts the two core
    * invariants hold and emits (n_core, bad_core, bad_outside) = (count,
    * 0, 0); the ORACLE recomputes all three IN SQL from the dumped
    * membership against the raw edge table — (a) every member's
    * within-core degree >= k and equal to the dumped core_deg, (b) no
    * outside node has >= k core neighbors (else the core wasn't maximal).
    * A wrong peel breaks the value match even though the oracle never
    * runs the peeling itself.
    */
  def kcoreCheck(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val k = 3
    val ev = t(s, dir, "events")
    val directed = ev.select(
      concat(lit("u:"), col("user_id")).as("a"),
      concat(lit("b:"), floor(col("value") / 100).cast("long")).as("b")).distinct()
    val und = directed.unionAll(directed.select(col("b").as("a"), col("a").as("b")))
    val core = graft.kg.GraphAlgos.kCore(directed, k)
    val nCore = core.count()
    val inCoreDeg = und
      .join(core.select(col("node").as("a")), Seq("a"), "left_semi")
      .join(core.select(col("node").as("b")), Seq("b"), "left_semi")
      .groupBy(col("a").as("node")).agg(count(lit(1)).as("d"))
    val badCore = core.join(inCoreDeg, Seq("node"), "left_outer")
      .filter(coalesce(col("d"), lit(0L)) < k || col("d") =!= col("core_deg"))
      .count()
    val badOutside = und
      .join(core.select(col("node").as("a")), Seq("a"), "left_anti")
      .join(core.select(col("node").as("b")), Seq("b"), "left_semi")
      .groupBy("a").agg(count(lit(1)).as("d"))
      .filter(col("d") >= k)
      .count()
    core.unpersist()
    Seq((nCore, badCore, badOutside)).toDF("n_core", "bad_core", "bad_outside")
  }

  /** Temporal-validity merge rules (minProps/maxProps): nodes merged in
    * TWO batches (event_id parity split) accumulate first_seen/last_seen
    * across merges — the interval must equal a single global min/max.
    */
  def temporalValidity(s: SparkSession, dir: String): DataFrame = {
    val spec = NodeSpec(Seq("Actor"), Seq("uid"),
      minProps = Seq("first_seen"), maxProps = Seq("last_seen"),
      sumProps = Seq("n_events"))
    val ev = t(s, dir, "events").select(
      col("event_id"), col("user_id").as("uid"),
      col("ts").as("first_seen"), col("ts").as("last_seen"),
      lit(1L).as("n_events"))
    val b1 = ev.filter(pmod(col("event_id"), lit(2)) === 0).drop("event_id")
    val b2 = ev.filter(pmod(col("event_id"), lit(2)) === 1).drop("event_id")
    val once = NodeSetOps.merge(None, b1, spec)
    NodeSetOps.merge(Some(once), b2, spec)
      .select("uid", "first_seen", "last_seen", "n_events")
  }

  /** Sliding-window chunking (maxTokens=32, overlap=8): every document
    * splits into context-length windows sharing 8 tokens — chunk text is
    * compared byte-for-byte against the oracle's recomputation.
    */
  def chunk(s: SparkSession, dir: String): DataFrame =
    graft.ops.TextOps.chunkDocuments(t(s, dir, "documents"),
      maxTokens = 32, overlap = 8)

  /** Trailing 24h rolling window per user: at every event, the count and
    * integer-cents sum of that user's events in the preceding 24 hours
    * (inclusive). RANGE frame on epoch micros; integer aggregates keep the
    * comparison order-insensitive, so the gate is value-exact.
    */
  def rolling(s: SparkSession, dir: String): DataFrame = {
    val w = graft.ops.Temporal.trailingWindow(Seq("user_id"), "ts",
      24L * 3600 * 1000 * 1000)
    t(s, dir, "events")
      .withColumn("_cents", round(col("value") * 100, 0).cast("long"))
      .select(col("event_id"), col("user_id"),
        count(lit(1)).over(w).as("n_24h"),
        sum(col("_cents")).over(w).as("cents_24h"))
  }

  /** As-of join — the leakage-free point-in-time lookup: every purchase
    * event picks up the latest signup event of the same user at-or-before
    * its timestamp (backward inclusive), unmatched purchases keep nulls.
    * The oracle is DuckDB's native ASOF LEFT JOIN — an independent
    * implementation of the same semantics, so the union+running-last
    * window shape is cross-checked engine-to-engine, value-exact.
    */
  def asof(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    graft.ops.Temporal.asofJoin(
        ev.filter(col("event_type") === "purchase")
          .select("event_id", "user_id", "ts"),
        ev.filter(col("event_type") === "signup"),
        keys = Seq("user_id"), leftTime = "ts", rightTime = "ts",
        rightCols = Seq("event_id", "value"))
      .select(col("event_id"), col("user_id"), col("ts"),
        col("asof_event_id"), col("asof_value"))
  }

  /** OHLC 6-hour bars of each user's purchase values —
    * [[graft.ops.EventAnalytics.ohlcBars]] (min_by/max_by over the
    * (µs, event_id) total order); oracle = the same epoch-aligned buckets
    * with DuckDB's min_by/max_by over the same struct order. Exact gate.
    */
  def ohlcGate(s: SparkSession, dir: String): DataFrame =
    graft.ops.EventAnalytics.ohlcBars(
      t(s, dir, "events").filter(col("event_type") === "purchase"),
      keys = Seq("user_id"), timeCol = "ts", valueCol = "value",
      bucketSec = 21600L, orderCol = "event_id")

  /** Population Stability Index of `value` between purchase (reference)
    * and view (actual) events — [[graft.ops.Checks.psi]] with 10
    * reference-anchored bins and explicit Laplace smoothing; the oracle
    * replays binning, smoothing, and each (q−p)·ln(q/p) term. Exact gate.
    */
  def psiGate(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    graft.ops.Checks.psi(
      ev.filter(col("event_type") === "purchase").select("value"),
      ev.filter(col("event_type") === "view").select("value"),
      "value", nBins = 10)
  }

  /** Cohen's kappa between the gold `lang` column and the langId
    * PREDICTION — [[graft.ops.Checks.cohenKappa]] grading the gated
    * language-ID heuristic's chance-corrected agreement; the oracle reuses
    * the q_lang_id replay for the predictions and recomputes the kappa
    * arithmetic. Exact gate.
    */
  def kappaGate(s: SparkSession, dir: String): DataFrame =
    graft.ops.Checks.cohenKappa(
      t(s, dir, "documents").select(col("lang"),
        TextOps.langId(col("text")).as("lang_pred")),
      "lang", "lang_pred")

  /** Categorical mutual information between documents' lang and source —
    * [[graft.ops.Checks.categoricalMi]]; per-cell MI contributions
    * replayed exactly in SQL. Exact gate.
    */
  def miGate(s: SparkSession, dir: String): DataFrame =
    graft.ops.Checks.categoricalMi(t(s, dir, "documents"), "lang", "source")

  /** LOCF grid resampling — [[graft.ops.Temporal.resampleLocf]]: each
    * user's purchase series aligned onto an epoch-aligned 6-hour grid,
    * each grid point carrying the latest at-or-before event (NULLs before
    * the first). The oracle regenerates the same grid and uses DuckDB's
    * NATIVE ASOF LEFT JOIN — an independent implementation, the q_asof
    * precedent. Exact gate.
    */
  def resampleGate(s: SparkSession, dir: String): DataFrame =
    graft.ops.Temporal.resampleLocf(
      t(s, dir, "events").filter(col("event_type") === "purchase")
        .select("user_id", "ts", "event_id", "value"),
      keys = Seq("user_id"), timeCol = "ts",
      valueCols = Seq("event_id", "value"), stepSec = 21600L)

  /** Byte-aware media partition assignment, VALUE-EXACT: the two-pass
    * sharded cumulative-byte bucketing ([[graft.ops.Multimodal
    * .sizeBucketsByKey]]) over the deterministic synthetic media table.
    * Payload length is a closed form of the id (65 + id % 192 bytes), so
    * the oracle recomputes the whole running-sum assignment as ONE window
    * in SQL — any shard/offset/boundary bug in the distributed two-pass
    * breaks the match. (This replaces the former q_multimodal stub gate:
    * JPEG-entropy/video decode stays documented out-of-scope in
    * [[graft.ops.Multimodal.extractFeatures]] and no gate dumps rows from
    * that stubbed kernel anymore; the REAL PNG/WAV codecs keep their own
    * value-exact gates.)
    */
  def mediaPartition(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.Multimodal
    val media = Multimodal.syntheticMedia(s, 300)
    Multimodal.sizeBucketsByKey(media, targetBytes = 4096, nShards = 8)
  }

  /** Multimodal header round-trip: encode real PNG/WAV headers from
    * id-derived parameters, parse them back byte-level, and emit the parsed
    * fields — the oracle computes the same parameters directly from the id,
    * so any encode/parse asymmetry breaks the value match.
    */
  def mediaMeta(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.Multimodal
    val media = Multimodal.syntheticEncodedMedia(s, 300)
    Multimodal.parseHeaders(media).toDF()
      .select(col("media_id"), col("format"), col("width"), col("height"),
        col("sample_rate"), col("channels"))
  }

  /** One REAL Structured Streaming incremental run per sf dir, memoized so
    * the node and edge gates share it: events-derived triples land as
    * THREE one-file parquet batches, a checkpointed AvailableNow stream
    * with maxFilesPerTrigger=1 merges each micro-batch through
    * [[graft.io.StageRunner.mergeStage]] (batch-id-idempotent snapshot
    * commits), then batch 1 is REPLAYED explicitly and must be skipped by
    * its committed batch note. The require() asserts exactly 3 committed
    * versions per stage — a collapsed stream (one big batch) or a
    * double-merged replay both fail loudly before the oracle even runs.
    */
  private val incrCache = scala.collection.concurrent.TrieMap.empty[String, (DataFrame, DataFrame)]
  private def incrementalRun(s: SparkSession, dir: String): (DataFrame, DataFrame) =
    // keyed by dir CONTENT fingerprint (the pqCbCache rule): a regenerated
    // sf dir in a long-lived JVM must re-run the stream, not serve the
    // previous dir's results — and by SESSION identity (ADVICE r5, the
    // pqEncCache pattern): cached DataFrames are bound to their session,
    // so a fresh session must not be served another session's plans
    incrCache.getOrElseUpdate(
      s"${System.identityHashCode(s)}:$dir@${dirFingerprint(dir, "events")}", {
      import graft.streaming.IncrementalPipeline
      val trip = t(s, dir, "events").select(
        concat(lit("user:"), col("user_id")).as("subj"),
        col("event_type").as("pred"),
        concat(lit("bucket:"), floor(col("value") / 100).cast("long")).as("obj"),
        pmod(col("event_id"), lit(3)).as("_b"))
      val inDir = java.nio.file.Files.createTempDirectory("graft-incr-in").toString
      val ckDir = java.nio.file.Files.createTempDirectory("graft-incr-ck").toString
      val workDir = java.nio.file.Files.createTempDirectory("graft-incr-wd").toString
      (0 until 3).foreach { b =>
        trip.filter(col("_b") === b).drop("_b")
          .coalesce(1).write.mode("append").parquet(inDir)
      }
      val runner = new graft.io.StageRunner(s, workDir)
      try {
        val state = new IncrementalPipeline.DurableGraphState(runner)
        IncrementalPipeline.startDurableTriples(s, inDir, ckDir, state, Some(1))
          .awaitTermination(300000)
        // replay batch 1: the committed "batch-1" note must skip the merge
        state.mergeBatch(trip.filter(col("_b") === 1).drop("_b"), 1L)
        Seq(state.NodesStage, state.EdgesStage).foreach { st =>
          val notes = runner.log.snapshots().filter(_.stage == st).map(_.note)
          require(notes == Seq("batch-0", "batch-1", "batch-2"),
            s"stage $st expected 3 committed batches (replay skipped), got $notes")
        }
        (state.nodes.get, state.edges.get)
      } finally runner.close()
    })

  /** Streaming sessionization gate: [[graft.streaming.SessionTracker]]
    * run as a REAL multi-micro-batch stream (file source, one file per
    * trigger) over events reshaped as turns, each conversation's turns
    * deliberately SPLIT ACROSS batches (pmod(turn_idx, 3)), plus two
    * far-future flush batches so the event-time watermark passes every
    * real session's last_ts + gap and the `closed` timeout rows fire.
    * Dumped rows are the closed sessions only; oracle = the one-shot
    * batch recompute in SQL (count / min / max / arg_max per conv) — a
    * tracker that loses cross-batch state, double-counts a replayed turn,
    * or mis-folds last_role cannot match it.
    */
  def streamSessions(s: SparkSession, dir: String): DataFrame = {
    import graft.schema.TranscriptTurn
    import org.apache.spark.sql.streaming.Trigger
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val turns = t(s, dir, "events").select(
      concat(lit("c:"), col("user_id")).as("conv_id"),
      (row_number().over(w) - 1).as("turn_idx"),
      col("event_type").as("role"),
      lit("").as("text"), lit(null).cast("string").as("tool"),
      col("ts").cast("timestamp").as("ts"))
    val maxTs = turns.agg(max("ts")).head().getTimestamp(0)
    val inDir = java.nio.file.Files.createTempDirectory("graft-sess-in").toString
    val ckDir = java.nio.file.Files.createTempDirectory("graft-sess-ck").toString
    (0 until 3).foreach { b =>
      turns.filter(pmod(col("turn_idx"), lit(3)) === b)
        .coalesce(1).write.mode("append").parquet(inDir)
    }
    // flush batches: each trigger's watermark reflects the PREVIOUS
    // batch's max event time, so two advancing batches are needed for the
    // +365d mark to actually fire the real sessions' timeouts
    import s.implicits._
    Seq(1, 2).foreach { i =>
      Seq((s"flush:$i", 0, "x", "", null: String,
          new java.sql.Timestamp(maxTs.getTime + (464L + i) * 86400000L)))
        .toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
        .coalesce(1).write.mode("append").parquet(inDir)
    }
    val schema = org.apache.spark.sql.Encoders.product[TranscriptTurn].schema
    val stream = s.readStream.schema(schema).option("maxFilesPerTrigger", 1)
      .parquet(inDir)
    // Three knobs, jointly chosen so each conversation forms exactly ONE
    // session whose stats must ACCUMULATE across the three interleaved
    // micro-batches (the cross-batch-state property under test;
    // gap-splitting semantics are value-gated by the batch q_sessionize):
    //  - gap 60 days > any intra-conversation gap → no mid-corpus split;
    //  - watermark delay 400 days > the corpus span → the pmod-interleaved
    //    batches are never "late" (a short delay silently DROPS most rows
    //    of batches 1-2 before the stateful operator — observed as 2/3-
    //    truncated sessions);
    //  - flush batches at +465/466 days → final watermark ≈ max_ts + 65d
    //    clears every last_ts + 60d, firing all closed rows, while the
    //    flush sessions' own timeouts stay in the future (filtered out).
    val sessions = graft.streaming.SessionTracker.sessionize(
      stream.withWatermark("ts", "400 days").as[TranscriptTurn],
      gapMs = 60L * 86400000L)
    val sink = s"graft_sess_out_${System.nanoTime()}"
    sessions.writeStream
      .option("checkpointLocation", ckDir)
      .trigger(Trigger.AvailableNow())
      .format("memory").queryName(sink)
      .start().awaitTermination(300000)
    val closed = s.table(sink)
      .filter(col("closed") && col("conv_id").startsWith("c:"))
      // encoder round-trip yields session-tz timestamps; cast back to NTZ
      // so the dump carries the int64-µs type the oracle compares against
      // (UTC session ⇒ wall clock preserved) — the q_sessionize precedent
      .select(col("conv_id"), col("n_turns"),
        col("first_ts").cast("timestamp_ntz").as("first_ts"),
        col("last_ts").cast("timestamp_ntz").as("last_ts"),
        col("last_role"))
      .localCheckpoint()
    val nConvs = turns.filter(col("conv_id").startsWith("c:"))
      .select("conv_id").distinct().count()
    require(closed.count() == nConvs,
      s"stream sessions: expected $nConvs closed sessions, got ${closed.count()}")
    closed
  }

  /** Stream-stream watermarked interval join gate —
    * [[graft.streaming.StreamJoin.intervalJoin]] run as a REAL
    * checkpointed multi-micro-batch join: even event_ids stream on the
    * left, odd on the right, each side cut into 3 files consumed one per
    * trigger, so matches whose two sides land in DIFFERENT micro-batches
    * (both orders occur under the interleaved split) must come out of the
    * buffered join state. The 400-day watermark keeps every row on-time
    * (the q_stream_sessions rule), so the streaming output must equal the
    * batch join EXACTLY — the oracle recomputes that batch join in SQL,
    * and an in-gate require compares the stream count to the batch plan
    * count before the dump is even written.
    */
  def streamJoin(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val ev = t(s, dir, "events").select(col("event_id"), col("user_id"),
      col("ts").cast("timestamp").as("ts"))
    val lDir = java.nio.file.Files.createTempDirectory("graft-sjoin-l").toString
    val rDir = java.nio.file.Files.createTempDirectory("graft-sjoin-r").toString
    val ckDir = java.nio.file.Files.createTempDirectory("graft-sjoin-ck").toString
    (0 until 3).foreach { b =>
      ev.filter(col("event_id") % 2 === 0 && pmod(col("event_id") / 2, lit(3)) === b)
        .coalesce(1).write.mode("append").parquet(lDir)
      ev.filter(col("event_id") % 2 === 1 && pmod((col("event_id") - 1) / 2, lit(3)) === b)
        .coalesce(1).write.mode("append").parquet(rDir)
    }
    val schema = ev.schema
    def side(d: String) = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(d)
      .withWatermark("ts", "400 days")
    val joined = graft.streaming.StreamJoin
      .intervalJoin(side(lDir), side(rDir), "user_id", "ts", "ts", windowSec = 600)
      .select(col("l.user_id").as("user_id"),
        col("l.event_id").as("l_event_id"), col("r.event_id").as("r_event_id"))
    val sink = s"graft_sjoin_${System.nanoTime()}"
    joined.writeStream.option("checkpointLocation", ckDir)
      .trigger(Trigger.AvailableNow()).format("memory").queryName(sink)
      .start().awaitTermination(300000)
    val out = s.table(sink).localCheckpoint()
    // stream ≡ batch on the same inputs, asserted before the oracle runs
    val batchN = graft.streaming.StreamJoin.intervalJoin(
      s.read.parquet(lDir), s.read.parquet(rDir), "user_id", "ts", "ts", 600).count()
    require(out.count() == batchN,
      s"stream-stream join: expected $batchN rows (batch join), got ${out.count()}")
    out
  }

  /** Streaming exact-dedup gate: [[graft.streaming.StreamingDedup]] over
    * a 3-micro-batch documents stream with a watermark wide enough that
    * no state evicts mid-run — the streaming output must then carry
    * EXACTLY one row per distinct text (the batch-dedup contract). The
    * dump is (sha256(text), n_kept) so a duplicate emission or a dropped
    * document shows as a value mismatch, not just a row-count drift;
    * within-batch duplicate winners are arbitrary, which is why the gate
    * compares content hashes, never doc_ids.
    */
  def streamDedup(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val docs = t(s, dir, "documents").select(
      col("doc_id"), col("text"),
      timestamp_seconds(lit(1704067200L) + col("doc_id")).as("ts"))
    val inDir = java.nio.file.Files.createTempDirectory("graft-sdd-in").toString
    val ckDir = java.nio.file.Files.createTempDirectory("graft-sdd-ck").toString
    (0 until 3).foreach { b =>
      docs.filter(pmod(col("doc_id"), lit(3)) === b)
        .coalesce(1).write.mode("append").parquet(inDir)
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.TimestampType)))
    val stream = s.readStream.schema(schema).option("maxFilesPerTrigger", 1)
      .parquet(inDir)
    val dd = graft.streaming.StreamingDedup.dedupStream(stream,
      watermark = "3650 days")
    val sink = s"graft_sdd_out_${System.nanoTime()}"
    dd.writeStream
      .option("checkpointLocation", ckDir)
      .trigger(Trigger.AvailableNow())
      .format("memory").queryName(sink)
      .start().awaitTermination(300000)
    s.table(sink)
      .groupBy(sha2(col("text"), 256).as("h"))
      .agg(count(lit(1)).as("n_kept"))
  }

  /** Streaming incremental-merge gate (node face): the final node table of
    * the 3-micro-batch + replayed-batch run above; oracle = the one-shot
    * batch recompute in SQL — a multi-batch merge that double-counts,
    * drops, or 'update-wins'es the sum-accumulated mention_count cannot
    * match it.
    */
  def incremental(s: SparkSession, dir: String): DataFrame = {
    val (nodes, _) = incrementalRun(s, dir)
    nodes.select(col("name"), col("mention_count"))
  }

  /** Streaming incremental-merge gate (edge face): final edge table with
    * endpoint ids resolved back to names; oracle = the one-shot batch
    * support aggregation in SQL.
    */
  def incrementalEdges(s: SparkSession, dir: String): DataFrame = {
    val (nodes, edges) = incrementalRun(s, dir)
    val idName = RelSetOps.withNodeId(nodes, Seq("name"))
      .select(col("_node_id"), col("name"))
    edges
      .join(idName.select(col("_node_id").as(RelSetOps.SrcId), col("name").as("start_name")),
        RelSetOps.SrcId)
      .join(idName.select(col("_node_id").as(RelSetOps.DstId), col("name").as("end_name")),
        RelSetOps.DstId)
      .select(col("start_name"), col("end_name"),
        col(RelSetOps.RelType).as("pred"), col("support"))
  }

  /** PNG pixel-decode gate — the former stub made real and VALUE-exact:
    * encode 120 deterministic RGB PNGs (varying per-row filters, real CRCs,
    * zlib IDAT), decode them back with the pure-JVM codec, and aggregate
    * per-(image, channel) pixel statistics with Spark SQL. The pixel
    * formula is closed-form in (id, x, y, c), so the DuckDB oracle
    * recomputes every count/mean/min/max without touching a codec — any
    * wrong unfilter (Sub/Up/Average/Paeth), inflate slip, or stride bug
    * breaks the hash.
    */
  def pixelStats(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.Multimodal
    val media = Multimodal.syntheticPngMedia(s, 120)
    Multimodal.decodePixels(media).toDF()
      .select(col("media_id"), col("width"), col("height"),
        posexplode(col("pixels")).as(Seq("pos", "v")))
      .groupBy(col("media_id"), pmod(col("pos"), lit(3)).cast("int").as("channel"))
      .agg(count(lit(1)).as("n_px"), round(avg(col("v")), 6).as("mean"),
        min(col("v")).as("vmin"), max(col("v")).as("vmax"))
  }

  /** WAV sample-decode gate — the audio half of the former decode stub made
    * real and VALUE-exact: encode 90 deterministic PCM16 WAVs (mono and
    * stereo, word-aligned ancillary chunks on every fourth file), decode
    * them back with the pure-JVM codec, and aggregate per-(file, channel)
    * sample statistics with Spark SQL. The sample formula is closed-form in
    * (id, frame, channel), so the DuckDB oracle recomputes every
    * count/mean/min/max/power without touching a codec — any endianness
    * slip, chunk-walk bug, or de-interleave error breaks the hash.
    */
  def audioStats(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.Multimodal
    val media = Multimodal.syntheticWavMedia(s, 90)
    Multimodal.decodeSamples(media).toDF()
      .select(col("media_id"), col("sample_rate"), col("channels"),
        posexplode(col("samples")).as(Seq("pos", "v")))
      .groupBy(col("media_id"), col("sample_rate"),
        pmod(col("pos"), col("channels")).cast("int").as("channel"))
      .agg(count(lit(1)).as("n_samp"), round(avg(col("v")), 6).as("mean"),
        min(col("v")).as("vmin"), max(col("v")).as("vmax"),
        round(avg(col("v") * col("v")), 6).as("mean_sq"))
  }

  /** Ordered funnel view → click → purchase with a 6-hour max gap per
    * step, first-touch anchors — [[graft.ops.EventAnalytics.funnel]]'s
    * chained window-min shape. Counts are integers and anchors are exact
    * timestamps, so the oracle's join-chain recomputation is value-exact.
    */
  def funnelGate(s: SparkSession, dir: String): DataFrame =
    graft.ops.EventAnalytics.funnel(t(s, dir, "events"),
      Seq("view", "click", "purchase"),
      maxGapMicros = Some(6L * 3600L * 1000000L))

  /** Weekly cohort retention over events: cohort = Monday-start week of
    * each user's first event, cells = distinct active users per
    * (cohort_week, week_offset). Whole-week integer offsets — no float
    * date math to drift.
    */
  def cohortGate(s: SparkSession, dir: String): DataFrame =
    graft.ops.EventAnalytics.cohortRetention(t(s, dir, "events"))
      // date_trunc promotes to session-TZ TimestampType, which the parquet
      // writer emits as INT96/ns; cast back to NTZ (a no-op in the UTC
      // session) so the dump carries micros like every other gate
      .withColumn("cohort_week", col("cohort_week").cast("timestamp_ntz"))

  /** Per-event-type z-score outliers at |z| ≥ 2 on the 6-dp-rounded
    * score — [[graft.ops.EventAnalytics.zscoreOutliers]]'s one-window
    * shape; thresholding on the rounded z keeps the row set a pure
    * function of values both engines agree on.
    */
  def outlierGate(s: SparkSession, dir: String): DataFrame =
    graft.ops.EventAnalytics.zscoreOutliers(t(s, dir, "events"),
        "value", Seq("event_type"), threshold = 2.0)
      .select("event_id", "event_type", "value", "z")

  /** Hashing-trick features at dim 64 over documents — the portable
    * polynomial token hash makes the buckets themselves oracle-checkable
    * (an xxhash variant would be rows-only) —
    * [[graft.ops.TextOps.hashFeatures]].
    */
  def hashFeaturesGate(s: SparkSession, dir: String): DataFrame =
    graft.ops.TextOps.hashFeatures(t(s, dir, "documents"), dim = 64)

  /** Local clustering coefficients over the thresholded user co-activity
    * graph (users sharing ≥ 10 distinct value-ventile buckets) —
    * [[graft.kg.GraphAlgos.clusteringCoefficient]]; 6-dp-rounded ratio of
    * exact integer triangle counts and degrees.
    */
  def clusteringGate(s: SparkSession, dir: String): DataFrame = {
    val m = t(s, dir, "events").select(col("user_id").as("u"),
      floor(col("value") / 20).cast("long").as("b")).distinct()
    val edges = graft.kg.GraphAlgos.coMentionEdges(m, groupCol = "b", entityCol = "u")
      .filter(col("n_groups") >= 10)
    graft.kg.GraphAlgos.clusteringCoefficient(edges)
      .select(col("node"), col("n_triangles"), col("degree"),
        round(col("clustering"), 6).as("clustering"))
  }

  /** Bounded harmonic centrality from 3 customer landmarks over the
    * undirected customer ↔ part co-purchase graph, 3 hops — the
    * landmark-distance sketch ([[graft.kg.GraphAlgos.landmarkDistances]])
    * aggregated to Σ 1/hops. Integer hops ⇒ exact reciprocal terms;
    * oracle = 3 min-relaxation rounds per landmark unrolled in SQL.
    */
  def harmonicGate(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val m = t(s, dir, "lineitem").join(t(s, dir, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .select(concat(lit("p:"), col("l_partkey")).as("p"),
        concat(lit("c:"), col("o_custkey")).as("c")).distinct()
    val sym = m.select(col("c").as("src"), col("p").as("dst"))
      .unionByName(m.select(col("p").as("src"), col("c").as("dst")))
    val lms = Seq("c:1", "c:2", "c:3").toDF("node")
    graft.kg.GraphAlgos.harmonicCentrality(sym, lms, maxHops = 3)
      .select(col("node"), col("n_landmarks"),
        round(col("harmonic"), 6).as("harmonic"))
  }

  /** First-order Markov transitions over per-user event sequences under
    * the (ts, event_id) total order —
    * [[graft.ops.EventAnalytics.transitionMatrix]]: integer counts +
    * 6-dp row-normalized probabilities, exact gate.
    */
  def transitionsGate(s: SparkSession, dir: String): DataFrame =
    graft.ops.EventAnalytics.transitionMatrix(t(s, dir, "events"),
      Seq("user_id"), orderCols = Seq("event_id"))

  /** Deterministic weighted sample (A-Res, weight = n_chars): top-50 keys
    * u^(1/w) from the portable hash — [[graft.ops.Sampling.sampleWeighted]];
    * the oracle recomputes hash, key, and cut in SQL.
    */
  def sampleWeightedGate(s: SparkSession, dir: String): DataFrame =
    graft.ops.Sampling.sampleWeighted(t(s, dir, "documents"), k = 50,
        weightCol = "n_chars")
      .select("doc_id", "n_chars", "wkey")

  /** Per-language weighted draw (k = 10, weight = n_chars) —
    * [[graft.ops.Sampling.sampleWeightedPerGroup]]; the oracle recomputes
    * key and per-group cut in SQL. Exact gate.
    */
  def sampleWeightedGroupGate(s: SparkSession, dir: String): DataFrame =
    graft.ops.Sampling.sampleWeightedPerGroup(t(s, dir, "documents"),
        "lang", k = 10, weightCol = "n_chars")
      .select("doc_id", "lang", "wkey")

  /** Deterministic epoch-order shuffle: rank under the (hash, id) total
    * order via the sharded two-pass global index —
    * [[graft.ops.Sampling.shufflePositions]]; the oracle recomputes the
    * same permutation as one window over the portable hash.
    */
  def shuffleGate(s: SparkSession, dir: String): DataFrame =
    graft.ops.Sampling.shufflePositions(t(s, dir, "documents"), nShards = 8)
      .select("doc_id", "pos")

  /** Deterministic contrastive negatives (k = 4 per anchor) —
    * [[graft.ops.Sampling.negativePairs]]; the oracle replays the
    * position permutation and the composite partner hash. Exact gate.
    */
  def negativePairsGate(s: SparkSession, dir: String): DataFrame =
    graft.ops.Sampling.negativePairs(t(s, dir, "documents"), k = 4)

  /** Portable spherical k-means (one Lloyd round, k = 8): id-ordered
    * seeds, rounded-cosine argmax, rounded centroid means —
    * [[graft.ops.Similarity.kmeansAssign]]; the oracle replays the same
    * round in SQL (seeds → assign → means → final assign), value-exact.
    */
  def kmeansGate(s: SparkSession, dir: String): DataFrame =
    graft.ops.Similarity.kmeansAssign(t(s, dir, "embeddings"), k = 8, iters = 1)
      .select("vec_id", "cell", "cos")

  /** Portable JL random projection 64→16 — the pre-LSH dimension cut;
    * [[graft.ops.Similarity.randomProject]]. The oracle recomputes the
    * plane matrix from the same integer hash and re-sums. Exact gate.
    */
  def randomProjectGate(s: SparkSession, dir: String): DataFrame =
    graft.ops.Similarity.randomProject(t(s, dir, "embeddings"),
      inDim = 64, outDim = 16)

  /** Corpus-self-trained bigram LM quality score (add-one smoothing, mean
    * nll in nats) — [[graft.ops.CorpusOps.lmScore]]; the oracle retrains
    * the same model in SQL. Exact gate.
    */
  def lmScoreGate(s: SparkSession, dir: String): DataFrame =
    graft.ops.CorpusOps.lmScore(t(s, dir, "documents"))

  /** Per-event-type distinct users: exact count + HLL-within-5% boolean —
    * [[graft.ops.Sketches.groupDistinctBound]], the grouped form of the
    * q_vocab_size swap-in contract. Exact gate.
    */
  def groupDistinctGate(s: SparkSession, dir: String): DataFrame =
    graft.ops.Sketches.groupDistinctBound(t(s, dir, "events"),
      "event_type", "user_id")

  /** Hot-key profile over events.user_id: top-20 keys with share and
    * hotness ratio — [[graft.ops.EventAnalytics.keySkew]], the input to
    * any salting / AQE-skew decision. Exact gate.
    */
  def keySkewGate(s: SparkSession, dir: String): DataFrame =
    graft.ops.EventAnalytics.keySkew(t(s, dir, "events"), "user_id", topN = 20)

  /** Graded n-gram contamination audit (5-grams, benchmark = every 97th
    * doc, the q_decontam convention) —
    * [[graft.ops.CorpusOps.contaminationScore]]; the oracle rebuilds the
    * string-gram overlap in SQL. Exact gate.
    */
  def contaminationGate(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    graft.ops.CorpusOps.contaminationScore(docs,
      docs.filter(col("doc_id") % 97 === 0), n = 5)
  }

  /** Bloom-prefiltered semi-join (orders with at least one lineitem):
    * result must be EXACTLY the plain left-semi join —
    * [[graft.ops.Joins.bloomSemiJoin]]; the oracle is the SQL EXISTS.
    */
  def bloomSemiGate(s: SparkSession, dir: String): DataFrame =
    graft.ops.Joins.bloomSemiJoin(t(s, dir, "orders"), t(s, dir, "lineitem"),
        "o_orderkey", "l_orderkey")
      .select("o_orderkey", "o_custkey", "o_orderstatus")

  /** Morton/Z-order layout key over (l_partkey, l_suppkey), 16 bits each —
    * [[graft.ops.Layout.zOrder2]]; the oracle interleaves the same bits
    * in SQL. Exact gate.
    */
  def zorderGate(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem").select(col("l_orderkey"), col("l_linenumber"),
      graft.ops.Layout.zOrder2(col("l_partkey"), col("l_suppkey"), 16).as("z"))

  /** MATERIALIZED Z-order layout, served: lineitem is written z-sorted
    * ([[graft.ops.Layout.writeZOrdered]] — range-partitioned + sorted on
    * z, so every file's z min/max is tight), then a 2-D box query
    * (l_partkey ∈ [256,511], l_suppkey ∈ [32,47]) is answered FROM that
    * table with the corner-code interval zValue(lo)..zValue(hi) pushed to
    * the scan (a correct superset — z is monotone per coordinate) plus the
    * exact residual box predicates. VALUE-EXACT: the oracle is the plain
    * box query on lineitem, so the layout + superset-filter path must
    * reproduce it row-for-row; PlanCheck asserts the z range lands in
    * PushedFilters (row-group pruning on BOTH dimensions at once — the
    * materialized payoff q_ann_ivfpq_mat demonstrates for IVF).
    */
  def zorderMat(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.Layout
    val path = java.nio.file.Files.createTempDirectory("graft-zorder-mat").toString
    Layout.writeZOrdered(
      t(s, dir, "lineitem").select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"),
      "l_partkey", "l_suppkey", bits = 16, path = path)
    val (pLo, pHi, sLo, sHi) = (256L, 511L, 32L, 47L)
    s.read.parquet(path)
      .filter(col("z").between(Layout.zValue(pLo, sLo, 16), Layout.zValue(pHi, sHi, 16)) &&
        col("l_partkey").between(pLo, pHi) && col("l_suppkey").between(sLo, sHi))
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
  }

  /** Salted fact↔dim join (salt 8, spread = l_linenumber): result must be
    * EXACTLY the plain inner join — [[graft.ops.Skew.saltedJoin]]; the
    * oracle is the unsalted SQL join. Exact gate.
    */
  def saltedJoinGate(s: SparkSession, dir: String): DataFrame =
    graft.ops.Skew.saltedJoin(
        t(s, dir, "lineitem"),
        t(s, dir, "orders").select(col("o_orderkey").as("l_orderkey"),
          col("o_orderstatus"), col("o_totalprice")),
        Seq("l_orderkey"), spread = col("l_linenumber"), salt = 8)
      .select("l_orderkey", "l_linenumber", "l_partkey", "o_orderstatus",
        "o_totalprice")

  /** Deequ-style constraint suite over the star schema — uniqueness (the
    * reference's unique-index contract), not-null, accepted values, and
    * two referential checks — [[graft.ops.Checks]]; each check is one
    * evidence row, the oracle recomputes all six in SQL. Exact gate.
    */
  def constraintsGate(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer"); val ord = t(s, dir, "orders")
    val li = t(s, dir, "lineitem"); val ev = t(s, dir, "events")
    import graft.ops.Checks
    Seq(
      Checks.uniqueness(cust, Seq("c_custkey")),
      Checks.uniqueness(ord, Seq("o_custkey")), // expected: repeat buyers
      Checks.notNull(ev, "event_type"),
      Checks.acceptedValues(ord, "o_orderstatus", Seq("O", "F", "P")),
      Checks.referential(ord, "o_custkey", cust, "c_custkey"),
      Checks.referential(li, "l_orderkey", ord, "o_orderkey")
    ).reduce(_ unionByName _).withColumnRenamed("check", "chk")
  }

  /** Per-column drift profile of the events table (exact distinct at gate
    * scale) — [[graft.ops.Checks.profile]]. Exact gate.
    */
  def profileGate(s: SparkSession, dir: String): DataFrame =
    graft.ops.Checks.profile(t(s, dir, "events"),
        Seq("event_id", "user_id", "event_type", "value", "props"))
      .withColumnRenamed("column", "col_name")

  /** 20-bin fixed-width histogram of events.value — the distribution half
    * of the drift snapshot; [[graft.ops.Checks.histogram]]. Exact gate.
    */
  def histogramGate(s: SparkSession, dir: String): DataFrame =
    graft.ops.Checks.histogram(t(s, dir, "events"), "value", nBins = 20)

  /** Per-source exact-duplication report —
    * [[graft.ops.Dedup.dedupStats]]. Exact gate.
    */
  def dedupStatsGate(s: SparkSession, dir: String): DataFrame =
    graft.ops.Dedup.dedupStats(t(s, dir, "documents"), "source")

  /** The composed curation chain (quality ≥ 0.5 → exact dedup → decontam
    * → train cut) — [[graft.ops.Curation.curate]]; the oracle replays the
    * WHOLE chain in SQL, stage order included. Exact gate.
    */
  def curationGate(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    graft.ops.Curation.curate(docs, docs.filter(col("doc_id") % 97 === 0))
      .select("doc_id", "lang", "quality")
  }

  /** Stage-by-stage row counts for the same chain —
    * [[graft.ops.Curation.curationAudit]]. Exact gate.
    */
  def curationAuditGate(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    graft.ops.Curation.curationAudit(docs, docs.filter(col("doc_id") % 97 === 0))
  }

  /** Reciprocal-rank fusion of the BM25 top-20 run and the quality top-20
    * run — [[graft.ops.Search.rrfFuse]]; the oracle re-ranks the two
    * already-value-exact dumps (q_bm25, q_quality) and replays the
    * 1/(60+rank) sum. Exact gate (two-table-dump pattern).
    */
  def rrfGate(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // both runs are top-20-sized BEFORE the rank window: the windows rank
    // 20-row lists, never the corpus
    val a = graft.ops.Search.bm25TopK(t(s, dir, "documents"),
        Seq("hash", "join", "vector"), k = 20)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("score").desc, col("doc_id"))))
    val b = t(s, dir, "documents")
      .select(col("doc_id"), TextOps.qualityScore(col("text")).as("quality"))
      .orderBy(col("quality").desc, col("doc_id")).limit(20)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("quality").desc, col("doc_id"))))
    graft.ops.Search.rrfFuse(Seq(a.select("doc_id", "rank"),
      b.select("doc_id", "rank")), k = 20)
  }

  /** SemDeDup-style semantic dedup over the embeddings table —
    * [[graft.ops.Dedup.semanticDedup]]: portable 1-round spherical k-means
    * (k=8, the q_kmeans configuration) confines the quadratic cosine
    * verify within cells; rounded-cosine >= 0.3 pairs collapse via
    * connected components, min id survives. The oracle replays cluster →
    * within-cell pairs → recursive-CTE components → keep-min entirely in
    * SQL. Exact gate.
    */
  def semanticDedupGate(s: SparkSession, dir: String): DataFrame = {
    val embs = t(s, dir, "embeddings")
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("embedding"))
    graft.ops.Dedup.semanticDedup(embs, k = 8, iters = 1, threshold = 0.3)
  }

  /** Retrieval-quality metrics (recall@5 / MRR@5 / nDCG@5) of the exact
    * cosine top-5 against same-label ground truth —
    * [[graft.ops.Search.rankingMetrics]] over the value-gated
    * [[graft.ops.Similarity.bruteForceTopK]] run. The oracle recomputes
    * the ranking AND every metric formula in SQL. Exact gate.
    */
  def rankingMetricsGate(s: SparkSession, dir: String): DataFrame = {
    val embs = t(s, dir, "embeddings")
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("embedding"))
    val queries = embs.filter(col("vec_id") < 8)
    val ranked = Similarity.bruteForceTopK(embs, queries, 5)
    val lbl = t(s, dir, "embeddings").select(col("vec_id"), col("label"))
    val rel = lbl.alias("q").join(lbl.alias("i"),
        col("q.label") === col("i.label") && col("q.vec_id") < 8 &&
          col("i.vec_id") =!= col("q.vec_id"))
      .select(col("q.vec_id").as("query_id"), col("i.vec_id").as("item_id"))
    graft.ops.Search.rankingMetrics(ranked, rel, 5)
  }

  /** Sparse all-pairs tf-idf cosine ≥ 0.6 over the documents table with
    * the df ≤ 100 vocabulary cut — [[graft.ops.Search.sparseCosinePairs]];
    * the oracle recomputes postings → idf weights → inverted-index dot
    * products → norms → rounded threshold. Exact gate.
    */
  def sparseCosineGate(s: SparkSession, dir: String): DataFrame =
    graft.ops.Search.sparseCosinePairs(t(s, dir, "documents"),
      threshold = 0.6, maxDf = 100)

  /** Blocking-quality audit of the 16-bit/4-band sign-LSH blocking against
    * the exact global rounded-cosine ≥ 0.3 pair set —
    * [[graft.ops.Dedup.blockingQuality]] over
    * [[graft.ops.Similarity.lshCandidatePairs]]: pair completeness
    * (blocking recall) + reduction ratio (pruned fraction of C(n,2)). The
    * oracle recomputes the candidates from the q_lsh_sigs dump and the
    * truth set + both formulas in SQL. Exact gate.
    */
  def blockingQualityGate(s: SparkSession, dir: String): DataFrame = {
    val embs = t(s, dir, "embeddings")
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("embedding"))
    val cand = Similarity.lshCandidatePairs(embs, bits = 16, bandBits = 4)
    val l = embs.alias("l"); val r = embs.alias("r")
    val truth = l.join(r, col("l.vec_id") < col("r.vec_id"))
      .filter(round(Similarity.cosine(col("l.embedding"), col("r.embedding")), 6) >= 0.3)
      .select(col("l.vec_id").as("a"), col("r.vec_id").as("b"))
    graft.ops.Dedup.blockingQuality(cand, truth, embs.count())
  }

  /** Length-bucketed training batches of 32 —
    * [[graft.ops.CorpusOps.lengthBucketedBatches]] (sharded two-pass
    * global (len, id) rank), aggregated to per-batch padding-waste
    * accounting. The oracle recomputes the rank as ONE window in SQL —
    * any shard/offset/ordering bug breaks the value match. Exact gate.
    */
  def lengthBatchesGate(s: SparkSession, dir: String): DataFrame =
    graft.ops.CorpusOps.lengthBucketedBatches(t(s, dir, "documents"),
        batchSize = 32, nShards = 8)
      .groupBy("batch_idx")
      .agg(count(lit(1)).as("n_docs"), max(col("len")).as("max_tokens"),
        (max(col("len")) * count(lit(1)) - sum(col("len"))).as("padding"))

  /** Water-filling data-mix rates — [[graft.ops.CorpusOps.mixRates]] with
    * weights derived from the source name ((srcN → N%4+1)) and a budget of
    * 90% of the corpus tokens, so heavy-weight sources CAP at their
    * availability and the rest re-level: the fixpoint the oracle replays
    * via prefix sums + the cumulative exact cross-multiplied cap test.
    * Exact gate.
    */
  def mixRatesGate(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val sources = docs.select("source").distinct().collect().map(_.getString(0))
    val weights = sources.map(src =>
      src -> ((src.replaceAll("\\D", "").toLong % 4) + 1)).toMap
    val total = docs.agg(sum(TextOps.tokenCountWs(col("text")).cast("long")))
      .head().getLong(0)
    graft.ops.CorpusOps.mixRates(docs, weights, total * 9L / 10L)
  }

  /** Tokenizer-vocabulary coverage per language at k=64 —
    * [[graft.ops.CorpusOps.vocabCoverage]]; the oracle recomputes the
    * top-64 vocabulary and the per-language OOV rates. Exact gate.
    */
  def vocabCoverageGate(s: SparkSession, dir: String): DataFrame =
    graft.ops.CorpusOps.vocabCoverage(t(s, dir, "documents"), k = 64)

  /** CDC read between two committed snapshot versions —
    * [[graft.io.StageRunner.snapshotDiff]]: v1 = orders minus the %5 keys,
    * v2 = orders minus the %7 keys with %3 prices bumped; the diff must
    * emit exactly the inserted (%5 & not %7), deleted (%7 & not %5), and
    * updated (%3, present in both) keys. The oracle recomputes both
    * versions and the full-outer diff directly in SQL. Exact gate.
    */
  def snapshotDiffGate(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    val workDir = java.nio.file.Files.createTempDirectory("graft-cdc").toString
    val runner = new graft.io.StageRunner(s, workDir)
    try {
      runner.stage("orders_cdc")(base.filter(col("o_orderkey") % 5 =!= 0))
      runner.recommit("orders_cdc")(
        base.filter(col("o_orderkey") % 7 =!= 0)
          .select(col("o_orderkey"), col("o_custkey"),
            when(col("o_orderkey") % 3 === 0, col("o_totalprice") + 1)
              .otherwise(col("o_totalprice")).as("o_totalprice")))
      runner.snapshotDiff("orders_cdc", 1, 2, Seq("o_orderkey"))
    } finally runner.close()
  }

  /** k-anonymity audit over (c_nationkey, c_mktsegment) quasi-identifiers
    * — [[graft.ops.Checks.kAnonymityViolations]]: every quasi-id group
    * smaller than k=8 is a re-identification risk and must be suppressed.
    * Oracle = the same HAVING-filtered group count. Exact gate.
    */
  def kAnonymityGate(s: SparkSession, dir: String): DataFrame =
    graft.ops.Checks.kAnonymityViolations(
      t(s, dir, "customer"), Seq("c_nationkey", "c_mktsegment"), k = 8)

  /** Top principal component of the embedding distribution by 2 power
    * rounds — [[graft.ops.Similarity.topComponentDF]]; μ and each round's
    * normalized w round to 6dp, so the oracle unrolls the identical
    * trajectory in SQL. Exact gate.
    */
  def pcaGate(s: SparkSession, dir: String): DataFrame =
    Similarity.topComponentDF(t(s, dir, "embeddings"), iters = 2)

  /** ABTT common-direction removal summarized per vector (projection
    * coefficient + residual norm) — [[graft.ops.Similarity
    * .removeTopComponent]] over the q_pca component. Exact gate.
    */
  def abttGate(s: SparkSession, dir: String): DataFrame =
    Similarity.removeTopComponent(t(s, dir, "embeddings"), iters = 2)

  /** Typo-tolerant fuzzy match over distinct part names: first-char
    * blocking + Levenshtein ≤ 3 — [[graft.kg.Canonicalize.fuzzyPairs]].
    * Integer distances, exact gate.
    */
  def fuzzyGate(s: SparkSession, dir: String): DataFrame =
    graft.kg.Canonicalize.fuzzyPairs(t(s, dir, "part"), "p_name", maxDist = 3)

  /** Jaro-Winkler linkage scores over the same Levenshtein-gated pair set
    * — [[graft.kg.Canonicalize.jaroScoredPairs]] via the native
    * [[graft.functions.JaroWinkler]] expression. Membership is the
    * integer edit-distance filter; every float score is value-checked
    * against DuckDB's jaro_winkler_similarity at 6 dp.
    */
  def jaroWinklerGate(s: SparkSession, dir: String): DataFrame =
    graft.kg.Canonicalize.jaroScoredPairs(t(s, dir, "part"), "p_name", maxDist = 3)
      .select(col("a"), col("b"), col("dist"), round(col("jw"), 6).as("jw"))

  /** Per-event-type decile assignment under the (value, event_id) total
    * order — [[graft.ops.EventAnalytics.equiDepthBuckets]]; SQL-standard
    * ntile on both engines, exact gate.
    */
  def ntileGate(s: SparkSession, dir: String): DataFrame =
    graft.ops.EventAnalytics.equiDepthBuckets(t(s, dir, "events"),
        "value", Seq("event_type"), nBuckets = 10, orderCols = Seq("event_id"),
        bucketCol = "decile")
      .select("event_id", "event_type", "decile")

  /** Per-label embedding centroids in long (label, dim, mean, n) form —
    * [[graft.ops.Similarity.labelCentroids]], 6-dp-rounded means.
    */
  def centroidsGate(s: SparkSession, dir: String): DataFrame =
    graft.ops.Similarity.labelCentroids(t(s, dir, "embeddings"))
      .select(col("label"), col("dim"), round(col("mean"), 6).as("mean"), col("n"))

  /** Dialogue-integrity stats per conversation (events reshaped as turns,
    * the q_context reshape) — [[graft.ops.TextOps.dialogueStats]]:
    * integer counts, exact gate.
    */
  def dialogueGate(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val turns = t(s, dir, "events").select(
      col("user_id").cast("string").as("conv_id"),
      (row_number().over(w) - 1).as("turn_idx"),
      col("event_type").as("role"))
    graft.ops.TextOps.dialogueStats(turns)
  }

  /** Dialogue-context assembly over events reshaped as transcript turns
    * (the q_sessionize reshape): each turn's previous 3 turns rendered
    * `role: text`, newline-joined — byte-exact against the oracle's
    * window list aggregation, so any frame or order slip breaks it.
    */
  def contextGate(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val turns = t(s, dir, "events").select(
      col("user_id").cast("string").as("conv_id"),
      (row_number().over(w) - 1).as("turn_idx"),
      col("event_type").as("role"), col("props").as("text"))
    graft.ops.TextOps.assembleContext(turns, k = 3)
      .select("conv_id", "turn_idx", "context")
  }

  /** Gaps-and-islands session assignment: per user, 0-based session index
    * with a 30-minute gap rule, (ts, event_id) total order —
    * [[graft.ops.Temporal.sessionIds]]. Integer indexes, exact gate.
    */
  def sessionIdsGate(s: SparkSession, dir: String): DataFrame =
    graft.ops.Temporal.sessionIds(t(s, dir, "events"), Seq("user_id"), "ts",
        gapMicros = 30L * 60L * 1000000L, orderCols = Seq("event_id"))
      .select("event_id", "user_id", "session_idx")

  /** Document-frequency PMI for every co-occurring token pair —
    * [[graft.ops.CorpusOps.pmiPairs]], 6-dp-rounded.
    */
  def pmi(s: SparkSession, dir: String): DataFrame =
    graft.ops.CorpusOps.pmiPairs(t(s, dir, "documents"))

  /** TF-IDF top-3 keywords per document, ranked on the 6-dp-rounded
    * score with a lexicographic tiebreak — [[graft.ops.Search.tfidfTopTerms]].
    */
  def tfidf(s: SparkSession, dir: String): DataFrame =
    graft.ops.Search.tfidfTopTerms(t(s, dir, "documents"), k = 3)

  /** Per-event-type winsorization of `value` into the exact interpolated
    * [p05, p95] band — [[graft.ops.EventAnalytics.winsorize]]; clipped
    * values rounded to 6 dp for the cross-engine compare.
    */
  def winsorizeGate(s: SparkSession, dir: String): DataFrame =
    graft.ops.EventAnalytics.winsorize(t(s, dir, "events"),
        "value", Seq("event_type"), lo = 0.05, hi = 0.95)
      .select(col("event_id"), col("event_type"),
        round(col("value_w"), 6).as("value_w"))

  /** OLAP rollup over lineitem: (returnflag, linestatus) cells plus
    * per-flag subtotals and the grand total in one pass (Spark `rollup` =
    * partial aggregates reused up the hierarchy, one shuffle). Quantities
    * are integer-valued doubles, so the sums are exact and cast clean to
    * BIGINT; NULL subtotal markers are coalesced to 'ALL' on both sides.
    */
  def rollupAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity")).as("_sq"), count(lit(1)).as("n_rows"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("_sq").cast("long").as("sum_qty"), col("n_rows"))

  /** Count-Min heavy hitters, kept honest: the top-20 exact token counts
    * next to a boolean asserting the CMS point estimate sits in
    * [n, n + 2N/width] — the sketch's one-sided guarantee. The estimate
    * itself is deterministic (xxhash rows), so the gate is stable; the
    * oracle recomputes the exact counts and expects every bound to hold.
    */
  def heavyHitters(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.Sketches
    val depth = 4; val width = 1024
    val toks = t(s, dir, "documents")
      .select(explode(split(lower(trim(col("text"))), "\\s+")).as("token"))
    val sketch = Sketches.countMinSketch(toks, "token", depth, width)
    val top = toks.groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token")).limit(20)
    Sketches.estimateCounts(sketch, top, "token", depth, width)
      .join(top, Seq("token"))
      .crossJoin(broadcast(toks.agg(count(lit(1)).as("_N"))))
      .select(col("token"), col("n"),
        (col("cm_est") >= col("n") &&
          (col("cm_est") - col("n")).cast("double")
            <= lit(2.0) * col("_N") / lit(width)).as("cm_ok"))
  }

  /** Resize gate — the vision-preprocessing half-step after decode:
    * 120 synthetic PNGs decoded AND nearest-neighbor-resized to 6×5 in
    * one mapPartitions pass, then per-(image, channel) stats. The floor
    * index mapping keeps every resized pixel closed-form in
    * (id, x', y', c), so the oracle recomputes all stats without a codec
    * or a resampler — any stride or mapping slip breaks the hash.
    */
  def resizeStats(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.Multimodal
    val media = Multimodal.syntheticPngMedia(s, 120)
    Multimodal.decodeResized(media, newW = 6, newH = 5).toDF()
      .select(col("media_id"), posexplode(col("pixels")).as(Seq("pos", "v")))
      .groupBy(col("media_id"), pmod(col("pos"), lit(3)).cast("int").as("channel"))
      .agg(count(lit(1)).as("n_px"), round(avg(col("v")), 6).as("mean"),
        min(col("v")).as("vmin"), max(col("v")).as("vmax"))
  }

  /** Audio decimation gate: 90 synthetic WAVs decoded and every-3rd-frame
    * decimated in one pass (rate divided accordingly), then per-(file,
    * channel) stats — the kept samples are the closed-form values at
    * frames ≡ 0 (mod 3), recomputed entirely in SQL.
    */
  def audioDecimateStats(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.Multimodal
    val media = Multimodal.syntheticWavMedia(s, 90)
    Multimodal.decodeDecimated(media, every = 3).toDF()
      .select(col("media_id"), col("sample_rate"), col("channels"),
        posexplode(col("samples")).as(Seq("pos", "v")))
      .groupBy(col("media_id"), col("sample_rate"),
        pmod(col("pos"), col("channels")).cast("int").as("channel"))
      .agg(count(lit(1)).as("n_samp"), round(avg(col("v")), 6).as("mean"),
        min(col("v")).as("vmin"), max(col("v")).as("vmax"))
  }

  /** BM25 top-20 for the fixed query {hash, join, vector} over the
    * documents table — the postings probe + broadcast-df + one doc-keyed
    * score shuffle of [[graft.ops.Search.bm25TopK]]. The oracle recomputes
    * Okapi BM25 in SQL from the same whitespace tokenization; scores are
    * 6-dp-rounded on both sides and the (score DESC, doc_id) order is
    * total, so the cut at 20 is deterministic.
    */
  def bm25(s: SparkSession, dir: String): DataFrame =
    graft.ops.Search.bm25TopK(t(s, dir, "documents"),
      Seq("hash", "join", "vector"), k = 20)

  /** Adamic–Adar link prediction on the customer ↔ part co-purchase
    * bipartite graph (membership = distinct (part, customer) via
    * orders ⋈ lineitem): top-100 unlinked-pair scores. Integer shared
    * counts plus a ≤49-term 1/ln(deg) float sum, 6-dp-rounded — the
    * (score DESC, a, b) order is total, so the cut is deterministic.
    */
  def adamicAdar(s: SparkSession, dir: String): DataFrame = {
    val m = t(s, dir, "lineitem").join(t(s, dir, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_partkey").as("part"), col("o_custkey").as("cust"))
    graft.kg.GraphAlgos.adamicAdar(m, nodeCol = "cust", neighborCol = "part")
      .select(col("a"), col("b"), col("common"),
        round(col("aa_score"), 6).as("score"))
      .orderBy(col("score").desc, col("a"), col("b"))
      .limit(100)
  }

  /** Banded interval join gate: every event joined to the 2-hour
    * purchase windows of the SAME user that contain it (inclusive ends),
    * aggregated per event. Band width = 1 h, so each window lands in ≤ 3
    * bands and the join is a plain (user_id, band) equi-join — the oracle
    * is the naive SQL BETWEEN join, so any band-boundary slip (an event
    * exactly on a window edge, a window straddling a band cut) breaks
    * the value match.
    */
  def intervalJoinAgg(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val windows = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("w_start"),
        (col("ts") + expr("INTERVAL 2 HOURS")).as("w_end"),
        col("event_id").as("w_id"))
    graft.ops.Temporal.intervalJoin(ev, windows, Seq("user_id"), "ts",
        "w_start", "w_end", Seq("w_id"), bandMicros = 3600L * 1000000L)
      .groupBy("event_id")
      .agg(count(lit(1)).as("n_win"), min(col("iv_w_id")).as("first_win"),
        max(col("iv_w_id")).as("last_win"))
  }
}
