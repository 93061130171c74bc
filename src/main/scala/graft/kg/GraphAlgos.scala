package graft.kg

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Graph analytics over materialized node/edge tables — the operators a KG
  * consumer runs right after construction. All DataFrame-native (no RDDs,
  * no driver-side adjacency), designed for the 10^12-turn node/edge scale:
  * shuffles only on join keys, iterative ops carry a bounded frontier and
  * cut lineage as they go (same discipline as [[ConnectedComponents]]).
  */
object GraphAlgos {

  /** Co-mention edges: undirected entity pairs that appear in the same
    * group (conversation, document, user stream), with the number of
    * distinct groups supporting each pair.
    *
    * Dataflow: distinct (group, entity) → equi-self-join on group with
    * `a < b` (each unordered pair once) → count per pair. The self-join
    * shuffles each group's entity set once and pairs WITHIN groups only —
    * never an all-pairs blowup across the corpus. Cost is
    * sum(m_g choose 2) over group entity-counts m_g; a hot group with
    * thousands of distinct entities is quadratic in ITS OWN m_g (that is
    * the semantics, not an implementation artifact), so `maxGroupSize`
    * drops degenerate groups (a conversation mentioning 10k entities is
    * boilerplate, not signal — same spirit as Lsh's frequency gates).
    * AQE's skew-join split handles residual group-size skew.
    */
  def coMentionEdges(df: DataFrame, groupCol: String, entityCol: String,
                     maxGroupSize: Int = 10000): DataFrame = {
    require(maxGroupSize > 1, s"maxGroupSize must be > 1, got $maxGroupSize")
    val pairs0 = df.select(col(groupCol).as("g"), col(entityCol).as("e")).distinct()
    val sized = pairs0
      .withColumn("_gsz", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("g")))
      .filter(col("_gsz") <= maxGroupSize)
      .drop("_gsz")
    val l = sized.alias("l"); val r = sized.alias("r")
    l.join(r, col("l.g") === col("r.g") && col("l.e") < col("r.e"))
      .groupBy(col("l.e").as("a"), col("r.e").as("b"))
      .agg(countDistinct(col("l.g")).as("n_groups"))
  }

  /** Community detection via SYNCHRONOUS label propagation (LPA) over the
    * undirected view, fully deterministic: every node starts with its own
    * id as label; each round every node adopts the most frequent label
    * among its neighbors, ties broken by the SMALLEST label. Synchronous
    * rounds + a total tie order make the result a pure function of (graph,
    * iters) — no RNG, no visit order — so an unrolled SQL oracle replicates
    * it exactly (the classic async LPA is deliberately traded away: its
    * update order dependence is exactly what a distributed engine cannot
    * reproduce run-to-run).
    *
    * Scale shape per round: one shuffle of the (neighbor → label) join on
    * node id, one (node, label) count aggregation, one windowed argmax per
    * node — all keyed on node id, state is (node, label) only, persisted +
    * counted per round with the previous pin released (the [[pageRank]]
    * lineage discipline). Hot hubs skew the count aggregation, not the
    * join — AQE's skew split covers it.
    */
  def labelPropagation(edges: DataFrame, iters: Int,
                       aCol: String = "a", bCol: String = "b"): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    val canon = edges
      .select(least(col(aCol), col(bCol)).as("x"), greatest(col(aCol), col(bCol)).as("y"))
      .filter(col("x") =!= col("y")).distinct()
    val nbr = canon.select(col("x").as("n"), col("y").as("m"))
      .unionAll(canon.select(col("y").as("n"), col("x").as("m")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = nbr.select(col("n")).distinct().withColumn("lbl", col("n"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    labels.count()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("n").orderBy(col("c").desc, col("lbl"))
    var i = 0
    while (i < iters) {
      val next = nbr
        .join(labels.select(col("n").as("m"), col("lbl")), "m")
        .groupBy("n", "lbl").agg(count(lit(1)).as("c"))
        .withColumn("_rk", row_number().over(w))
        .filter(col("_rk") === 1)
        .select("n", "lbl")
        .persist(StorageLevel.MEMORY_AND_DISK)
      next.count()
      labels.unpersist()
      labels = next
      i += 1
    }
    val out = labels.select(col("n").as("node"), col("lbl").as("community"))
    nbr.unpersist()
    out
  }

  /** Per-node triangle participation counts over an undirected graph.
    *
    * Edges are canonicalized (unordered pair once), then ORIENTED from the
    * lower (degree, id) endpoint to the higher — the classic orientation
    * trick: every triangle has exactly one "apex" whose two out-edges form
    * the wedge, so each triangle is enumerated ONCE, and a hub of degree d
    * contributes wedges only from its (few) lower-degree neighbors instead
    * of d² — the skew bound that makes this survive power-law graphs at
    * 100 TB. Dataflow: two equi-joins (wedge build on the apex, closure
    * probe on the (v,w) pair), both hash-shuffled on their keys, AQE
    * skew-split on residual hubs. Returns (node, n_triangles) for every
    * node in at least one triangle.
    */
  def triangleCounts(edges: DataFrame, aCol: String = "a", bCol: String = "b"): DataFrame = {
    val canon = edges
      .select(least(col(aCol), col(bCol)).as("x"), greatest(col(aCol), col(bCol)).as("y"))
      .filter(col("x") =!= col("y")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val deg = canon.select(col("x").as("n")).unionAll(canon.select(col("y").as("n")))
      .groupBy("n").agg(count(lit(1)).as("d"))
    // orientation key: (degree, node) — a total order, so exactly one
    // direction per edge and one apex per triangle
    val withDeg = canon
      .join(deg.withColumnRenamed("n", "x").withColumnRenamed("d", "dx"), Seq("x"))
      .join(deg.withColumnRenamed("n", "y").withColumnRenamed("d", "dy"), Seq("y"))
    val oriented = withDeg.select(
        when(col("dx") < col("dy") || (col("dx") === col("dy") && col("x") < col("y")),
          struct(col("x").as("u"), col("y").as("v")))
          .otherwise(struct(col("y").as("u"), col("x").as("v"))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val e1 = oriented.alias("e1"); val e2 = oriented.alias("e2")
    // wedge at apex u: (u→v, u→w), VALUE-ordered v<w so each unordered
    // wedge appears once; closed iff the value-canonical edge (v,w) exists
    // — a plain two-column equi-join against `canon` (an OR of orientation
    // directions here would force a nested-loop join)
    val triangles = e1.join(e2,
        col("e1.u") === col("e2.u") &&
        (col("e1.v") < col("e2.v")))
      .select(col("e1.u").as("n1"), col("e1.v").as("n2"), col("e2.v").as("n3"))
      .join(canon.select(least(col("x"), col("y")).as("n2"),
                         greatest(col("x"), col("y")).as("n3")),
        Seq("n2", "n3"), "left_semi")
    val out = triangles
      .select(explode(array(col("n1"), col("n2"), col("n3"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    out.count()
    oriented.unpersist()
    canon.unpersist()
    out
  }

  /** Local clustering coefficient per node over the undirected simple
    * graph: 2·T(v) / (deg(v)·(deg(v)−1)) — the fraction of a node's
    * neighbor pairs that are themselves connected (how clique-like its
    * neighborhood is). Degree-≤1 nodes get 0 by convention; every node
    * on at least one edge appears. Reuses [[triangleCounts]]'s
    * degree-oriented enumeration (the skew-safe wedge bound) plus one
    * degree aggregation and a left join — no new join shapes.
    */
  def clusteringCoefficient(edges: DataFrame, aCol: String = "a",
                            bCol: String = "b"): DataFrame = {
    val canon = edges
      .select(least(col(aCol), col(bCol)).as("x"), greatest(col(aCol), col(bCol)).as("y"))
      .filter(col("x") =!= col("y")).distinct()
    val deg = canon.select(col("x").as("node")).unionAll(canon.select(col("y").as("node")))
      .groupBy("node").agg(count(lit(1)).as("degree"))
    val tri = triangleCounts(edges, aCol, bCol).withColumnRenamed("n_triangles", "_t")
    deg.join(tri, Seq("node"), "left")
      .select(col("node"), coalesce(col("_t"), lit(0L)).as("n_triangles"),
        col("degree"),
        when(col("degree") >= 2,
          lit(2.0) * coalesce(col("_t"), lit(0L)) /
            (col("degree") * (col("degree") - 1)))
          .otherwise(lit(0.0)).as("clustering"))
  }

  /** Structural node similarity: Jaccard of (out-)neighborhoods in a
    * bipartite membership table — |N(a) ∩ N(b)| / |N(a) ∪ N(b)| for every
    * pair sharing at least one neighbor. Built on [[coMentionEdges]]
    * (shared-neighbor counts are co-mention counts with the roles
    * flipped), plus a broadcast-friendly degree join. Pairs with zero
    * overlap are absent by construction — never materialize the n²
    * zero-similarity pairs.
    */
  def neighborJaccard(df: DataFrame, nodeCol: String, neighborCol: String,
                      maxNeighborhood: Int = 10000): DataFrame = {
    val shared = coMentionEdges(df, groupCol = neighborCol, entityCol = nodeCol,
      maxGroupSize = maxNeighborhood)
      .withColumnRenamed("n_groups", "shared")
    val deg = df.select(col(nodeCol).as("n"), col(neighborCol).as("nb")).distinct()
      .groupBy("n").agg(count(lit(1)).as("d"))
    shared
      .join(deg.withColumnRenamed("n", "a").withColumnRenamed("d", "da"), Seq("a"))
      .join(deg.withColumnRenamed("n", "b").withColumnRenamed("d", "db"), Seq("b"))
      .select(col("a"), col("b"), col("shared"),
        (col("shared").cast("double") / (col("da") + col("db") - col("shared")))
          .as("jaccard"))
  }

  /** Link prediction over a bipartite membership table: for every node
    * pair sharing at least one neighbor, the Adamic–Adar score
    * Σ_{n ∈ N(a)∩N(b)} 1 / ln(deg(n)), where deg(n) counts the distinct
    * nodes attached to shared neighbor n — rare shared neighbors count
    * more than ubiquitous hubs, the classic fix for raw common-neighbor
    * counts. A SHARED neighbor has deg ≥ 2 by construction, so ln(deg) is
    * never 0: deg-1 neighbors simply form no pairs.
    *
    * Dataflow mirrors [[coMentionEdges]]: distinct (neighbor, node)
    * membership → per-neighbor degree via one keyed window count (the
    * same pass that applies the `maxNeighborhood` hub gate — a neighbor
    * attached to 100k nodes contributes ~1/ln(100k)≈0.09 per pair but
    * 5·10^9 pairs; past the gate that fan-out is boilerplate, not
    * signal) → equi-self-join on neighbor with `a < b` → per-pair SUM of
    * the precomputed 1/ln(deg) weights plus the shared count. Pairs form
    * WITHIN a neighbor's attachment set only — never across the corpus —
    * and every shuffle is keyed on the neighbor or the pair, carrying
    * (neighbor, node, weight) rows only.
    */
  def adamicAdar(df: DataFrame, nodeCol: String, neighborCol: String,
                 maxNeighborhood: Int = 10000): DataFrame = {
    require(maxNeighborhood > 1, s"maxNeighborhood must be > 1, got $maxNeighborhood")
    val m = df.select(col(neighborCol).as("nb"), col(nodeCol).as("e")).distinct()
    val sized = m
      .withColumn("_d", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("nb")))
      .filter(col("_d") <= maxNeighborhood)
      .withColumn("_w", lit(1.0) / log(col("_d").cast("double")))
    val l = sized.alias("l"); val r = sized.alias("r")
    l.join(r, col("l.nb") === col("r.nb") && col("l.e") < col("r.e"))
      .groupBy(col("l.e").as("a"), col("r.e").as("b"))
      .agg(count(lit(1)).as("common"), sum(col("l._w")).as("aa_score"))
  }

  /** Per-node degree statistics over directed edges: out-degree, in-degree
    * and total, with distinct parallel edges collapsed first. One shuffle
    * per direction (map-side partial counts), full outer combined — every
    * node appears even if it only ever sits on one side.
    */
  def degrees(edges: DataFrame, srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst")).distinct()
    val outD = e.groupBy(col("src").as("node")).agg(count(lit(1)).as("out_deg"))
    val inD = e.groupBy(col("dst").as("node")).agg(count(lit(1)).as("in_deg"))
    outD.join(inD, Seq("node"), "full_outer")
      .select(col("node"),
        coalesce(col("out_deg"), lit(0L)).as("out_deg"),
        coalesce(col("in_deg"), lit(0L)).as("in_deg"),
        (coalesce(col("out_deg"), lit(0L)) + coalesce(col("in_deg"), lit(0L))).as("degree"))
  }

  /** Fixed-iteration PageRank over directed edges.
    *
    * Per iteration: one hash-shuffled join (edge src → current rank), one
    * aggregation (contributions per dst), one left join back onto the node
    * set — rank state is (node, double) ONLY, persisted + counted per
    * iteration and the previous iteration's pin released, so lineage stays
    * one round deep no matter how many iterations run (the same loop
    * discipline as [[ConnectedComponents]] and [[bfsReachable]]).
    *
    * Deliberately simple mass model: dangling nodes (no out-edges) leak
    * their damped mass rather than redistributing it — the standard
    * teleport-only formulation that an unrolled SQL oracle can replicate
    * exactly. Ranks therefore sum to <= 1; relative ordering (the thing
    * consumers rank by) is unaffected for connected regions.
    */
  def pageRank(edges: DataFrame, iters: Int, damping: Double = 0.85,
               srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    require(damping > 0 && damping < 1, s"damping must be in (0,1), got $damping")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst")).distinct()
    val nodes = e.select(col("src").as("n")).unionAll(e.select(col("dst").as("n")))
      .distinct().persist(StorageLevel.MEMORY_AND_DISK)
    val nN = nodes.count()
    val eod = e.join(e.groupBy("src").agg(count(lit(1)).cast("double").as("od")), "src")
      .persist(StorageLevel.MEMORY_AND_DISK)
    var ranks = nodes.withColumn("r", lit(1.0 / nN))
      .persist(StorageLevel.MEMORY_AND_DISK)
    ranks.count()
    var i = 0
    while (i < iters) {
      val contrib = eod.join(ranks, eod("src") === ranks("n"))
        .groupBy("dst").agg(sum(col("r") / col("od")).as("c"))
      val next = nodes.join(contrib, nodes("n") === contrib("dst"), "left_outer")
        .select(col("n"),
          (lit((1.0 - damping) / nN) + lit(damping) * coalesce(col("c"), lit(0.0))).as("r"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      next.count()
      ranks.unpersist()
      ranks = next
      i += 1
    }
    eod.unpersist()
    nodes.unpersist()
    ranks
  }

  /** k-core decomposition (membership for a fixed k): iteratively peel
    * nodes of degree < k from the undirected graph until none remain — the
    * unique maximal subgraph where every node keeps >= k neighbors. The
    * KG consumer's "dense backbone" filter (drop entities without enough
    * mutually-supported context).
    *
    * Loop discipline (same as [[ConnectedComponents]]/[[bfsReachable]]):
    * per round one degree aggregation + one semi-join against the
    * surviving node set, state is (node) / (x, y) edge pairs only,
    * persisted + counted per round with the previous pin released, early
    * exit at fixpoint. Rounds are bounded by the peeling depth (≤ the
    * graph's degeneracy ordering length; in practice a handful).
    *
    * Returns (node, core_deg) — the surviving nodes with their
    * within-core degree (all >= k by construction; the q_kcore_check gate
    * has DuckDB re-validate both invariants from the dumped membership).
    */
  def kCore(edges: DataFrame, k: Int,
            aCol: String = "a", bCol: String = "b"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    var live = edges
      .select(least(col(aCol), col(bCol)).as("x"), greatest(col(aCol), col(bCol)).as("y"))
      .filter(col("x") =!= col("y")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    var nEdges = live.count()
    var changed = true
    while (changed && nEdges > 0) {
      val deg = live.select(col("x").as("n")).unionAll(live.select(col("y").as("n")))
        .groupBy("n").agg(count(lit(1)).as("d"))
      val keep = deg.filter(col("d") >= k).select("n")
      val next = live
        .join(keep.withColumnRenamed("n", "x"), Seq("x"), "left_semi")
        .join(keep.withColumnRenamed("n", "y"), Seq("y"), "left_semi")
        .persist(StorageLevel.MEMORY_AND_DISK)
      val nNext = next.count()
      changed = nNext != nEdges
      live.unpersist()
      live = next
      nEdges = nNext
    }
    val out = live.select(col("x").as("n")).unionAll(live.select(col("y").as("n")))
      .groupBy(col("n").as("node")).agg(count(lit(1)).as("core_deg"))
      .filter(col("core_deg") >= k)
    val matd = out.persist(StorageLevel.MEMORY_AND_DISK)
    matd.count()
    live.unpersist()
    matd
  }

  /** Personalized PageRank (random walk with restart): like [[pageRank]],
    * but the teleport mass returns to the SOURCE set instead of spreading
    * uniformly — the standard "relevance to these seed entities" ranking
    * for KG neighborhoods (seed an entity, rank its graph context).
    *
    * Same loop discipline as [[pageRank]]: per iteration one hash-shuffled
    * join + one aggregation over (node, double) state, persisted + counted
    * per round with the previous pin released. The teleport vector rides
    * the node frame as a second double column (computed once via a
    * left-semi-derived flag, never re-joined per iteration). Dangling mass
    * leaks, as in the base model, so an unrolled SQL oracle replicates the
    * values exactly.
    */
  def pageRankPersonalized(edges: DataFrame, sources: DataFrame, iters: Int,
                           damping: Double = 0.85,
                           srcCol: String = "src", dstCol: String = "dst",
                           nodeCol: String = "node"): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    require(damping > 0 && damping < 1, s"damping must be in (0,1), got $damping")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst")).distinct()
    val srcSet = sources.select(col(nodeCol).as("n")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nS = srcSet.count()
    require(nS > 0, "personalized PageRank needs at least one source node")
    val nodes = e.select(col("src").as("n")).unionAll(e.select(col("dst").as("n")))
      .distinct()
    val withTele = nodes
      .join(srcSet.withColumn("_is_src", lit(1)), Seq("n"), "left_outer")
      .select(col("n"),
        when(col("_is_src").isNotNull, lit(1.0 / nS)).otherwise(lit(0.0)).as("t"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    withTele.count()
    val eod = e.join(e.groupBy("src").agg(count(lit(1)).cast("double").as("od")), "src")
      .persist(StorageLevel.MEMORY_AND_DISK)
    var ranks = withTele.select(col("n"), col("t"), col("t").as("r"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    ranks.count()
    var i = 0
    while (i < iters) {
      val contrib = eod.join(ranks, eod("src") === ranks("n"))
        .groupBy("dst").agg(sum(col("r") / col("od")).as("c"))
      val next = withTele.join(contrib, withTele("n") === contrib("dst"), "left_outer")
        .select(withTele("n"), withTele("t"),
          (lit(1.0 - damping) * col("t") +
            lit(damping) * coalesce(col("c"), lit(0.0))).as("r"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      next.count()
      ranks.unpersist()
      ranks = next
      i += 1
    }
    eod.unpersist()
    srcSet.unpersist()
    val out = ranks.select("n", "r")
    withTele.unpersist()
    out
  }

  /** HITS (hubs & authorities), fixed iterations: authority = in-flow of
    * hub scores, hub = out-flow of authority scores, each half-step
    * L1-normalized (sum-to-1 — chosen over the classical L2 because an
    * unrolled SQL oracle can replicate a plain SUM division exactly;
    * rankings are identical under any positive rescaling). The KG reading:
    * authorities = entities many well-connected sources point at, hubs =
    * sources that point at many good authorities.
    *
    * Loop shape per iteration: two (join on one endpoint → aggregate →
    * left-join back) rounds over (node, double) state, persisted + counted
    * per half-step with the previous pin released — the [[pageRank]]
    * discipline; the L1 sums are single-scalar aggregations.
    */
  def hits(edges: DataFrame, iters: Int,
           srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("n")).unionAll(e.select(col("dst").as("n")))
      .distinct().persist(StorageLevel.MEMORY_AND_DISK)
    if (nodes.count() == 0) {
      e.unpersist(); nodes.unpersist()
      return nodes.select(col("n"), lit(0.0).as("hub"), lit(0.0).as("auth"))
    }
    var hubs = nodes.withColumn("h", lit(1.0))
      .persist(StorageLevel.MEMORY_AND_DISK)
    hubs.count()
    var auths: DataFrame = null
    var i = 0
    // The L1 sum rides the SAME job as the normalize join: the one-row
    // aggregate is cross-joined (broadcast — Catalyst plans a 1-row
    // BroadcastNestedLoopJoin) instead of `.head()`-ing it first, so each
    // half-step is ONE action (persist+count), not a separate driver
    // round-trip + full lineage re-walk per sum.
    while (i < iters) {
      val aRaw = e.join(hubs, e("src") === hubs("n"))
        .groupBy("dst").agg(sum("h").as("x"))
      val nextA = nodes.join(aRaw, nodes("n") === aRaw("dst"), "left_outer")
        .crossJoin(broadcast(aRaw.agg(sum("x").as("_tot"))))
        .select(nodes("n"), (coalesce(col("x"), lit(0.0)) / col("_tot")).as("a"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      nextA.count()
      if (auths != null) auths.unpersist()
      auths = nextA
      val hRaw = e.join(auths, e("dst") === auths("n"))
        .groupBy("src").agg(sum("a").as("x"))
      val nextH = nodes.join(hRaw, nodes("n") === hRaw("src"), "left_outer")
        .crossJoin(broadcast(hRaw.agg(sum("x").as("_tot"))))
        .select(nodes("n"), (coalesce(col("x"), lit(0.0)) / col("_tot")).as("h"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      nextH.count()
      hubs.unpersist()
      hubs = nextH
      i += 1
    }
    val out = hubs.join(auths, Seq("n"))
      .select(col("n"), col("h").as("hub"), col("a").as("auth"))
    e.unpersist()
    nodes.unpersist()
    out
  }

  /** Weighted PageRank: [[pageRank]] with per-edge weights — each node
    * distributes its damped rank to successors IN PROPORTION to edge
    * weight (w / Σ out-weights) instead of uniformly. The KG shape:
    * edge support counts as weights, so heavily-evidenced relations carry
    * more rank. Parallel (src,dst) duplicates are weight-SUMMED first.
    * Same per-iteration (node, double) state + lineage discipline; same
    * teleport-only dangling model, so an unrolled SQL oracle is exact.
    */
  def pageRankWeighted(edges: DataFrame, iters: Int, damping: Double = 0.85,
                       srcCol: String = "src", dstCol: String = "dst",
                       weightCol: String = "weight"): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    require(damping > 0 && damping < 1, s"damping must be in (0,1), got $damping")
    val e = edges
      .select(col(srcCol).as("src"), col(dstCol).as("dst"),
        col(weightCol).cast("double").as("w"))
      .groupBy("src", "dst").agg(sum("w").as("w"))
    val nodes = e.select(col("src").as("n")).unionAll(e.select(col("dst").as("n")))
      .distinct().persist(StorageLevel.MEMORY_AND_DISK)
    val nN = nodes.count()
    val eow = e.join(e.groupBy("src").agg(sum("w").as("sw")), "src")
      .persist(StorageLevel.MEMORY_AND_DISK)
    var ranks = nodes.withColumn("r", lit(1.0 / nN))
      .persist(StorageLevel.MEMORY_AND_DISK)
    ranks.count()
    var i = 0
    while (i < iters) {
      val contrib = eow.join(ranks, eow("src") === ranks("n"))
        .groupBy("dst").agg(sum(col("r") * col("w") / col("sw")).as("c"))
      val next = nodes.join(contrib, nodes("n") === contrib("dst"), "left_outer")
        .select(col("n"),
          (lit((1.0 - damping) / nN) + lit(damping) * coalesce(col("c"), lit(0.0))).as("r"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      next.count()
      ranks.unpersist()
      ranks = next
      i += 1
    }
    eow.unpersist()
    nodes.unpersist()
    ranks
  }

  /** k-hop reachability (BFS): every node reachable from `sources` in at
    * most `maxHops` directed edge traversals, with its MINIMUM hop count.
    *
    * Iterative frontier expansion: hop h's frontier joins the edge table
    * (shuffle on src), anti-joins the visited set (first settlement = min
    * hops, since expansion is strictly by hop level), and becomes hop h+1.
    * The frontier and visited sets carry (node, hops) ONLY — corpus-scale
    * state never rides the loop. Each iteration persists + counts its
    * frontier (cuts lineage growth, gives the fixpoint test), and the loop
    * exits early when a frontier empties. `reverse=true` follows edges
    * dst→src.
    *
    * Scale shape: identical join pattern to [[ConnectedComponents]]'s star
    * rounds — hash shuffle on node id per hop, AQE skew-split on hub
    * nodes; maxHops bounds the rounds, so worst case is maxHops shuffles
    * of (id, int) pairs.
    */
  /** Bounded-round single-source shortest paths — Bellman-Ford relaxation
    * over a weighted directed edge list (pass the symmetrized union for an
    * undirected graph). After `iters` rounds, dist(n) is the minimum total
    * weight over paths from any source using at most `iters` edges; nodes
    * not reachable within that budget are absent. With integer weights the
    * result is a pure function of (graph, sources, iters) — no float
    * summation order — so an unrolled SQL oracle reproduces it exactly.
    *
    * Scale shape per round: ONE shuffle joining the current distance
    * table to the edges on the source endpoint + one min-aggregation on
    * the node id; state is (node, dist) only, persisted + counted per
    * round with the parent pin released (the [[pageRank]] lineage
    * discipline). Parallel edges collapse to their cheapest copy up
    * front, so the per-round join fan-out is the true out-degree.
    */
  def sssp(edges: DataFrame, sources: DataFrame, iters: Int,
           srcCol: String = "src", dstCol: String = "dst",
           wCol: String = "weight", nodeCol: String = "node"): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    val e = edges.select(col(srcCol).as("_s"), col(dstCol).as("_d"),
        col(wCol).cast("long").as("_w"))
      .groupBy("_s", "_d").agg(min("_w").as("_w"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var dist = sources.select(col(nodeCol).as("node")).distinct()
      .withColumn("dist", lit(0L))
      .persist(StorageLevel.MEMORY_AND_DISK)
    dist.count()
    val retired = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    var i = 0
    while (i < iters) {
      val relaxed = dist.join(e, dist("node") === e("_s"))
        .select(col("_d").as("node"), (col("dist") + col("_w")).as("dist"))
        .unionByName(dist.select("node", "dist"))
        .groupBy("node").agg(min("dist").as("dist"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      relaxed.count() // materialize BEFORE unpersisting the parent
      retired += dist
      dist = relaxed
      i += 1
    }
    retired.foreach(_.unpersist())
    e.unpersist()
    dist
  }

  def bfsReachable(edges: DataFrame, sources: DataFrame, maxHops: Int,
                   srcCol: String = "src", dstCol: String = "dst",
                   nodeCol: String = "node", reverse: Boolean = false): DataFrame = {
    require(maxHops >= 0, s"maxHops must be >= 0, got $maxHops")
    val (from, to) = if (reverse) (dstCol, srcCol) else (srcCol, dstCol)
    val e = edges.select(col(from).as("_from"), col(to).as("_to")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    var visited = sources.select(col(nodeCol).as("node")).distinct()
      .withColumn("hops", lit(0))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var frontier = visited
    var frontierN = frontier.count()
    var h = 1
    val retired = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    while (h <= maxHops && frontierN > 0) {
      val next = frontier.join(e, frontier("node") === e("_from"))
        .select(col("_to").as("node")).distinct()
        .join(visited.select("node"), Seq("node"), "left_anti")
        .withColumn("hops", lit(h))
        .persist(StorageLevel.MEMORY_AND_DISK)
      frontierN = next.count() // materialize BEFORE unpersisting parents
      val nextVisited = visited.unionAll(next)
        .persist(StorageLevel.MEMORY_AND_DISK)
      nextVisited.count()
      retired += visited; retired += next
      visited = nextVisited
      frontier = next
      h += 1
    }
    retired.foreach(_.unpersist())
    e.unpersist()
    visited
  }

  /** Landmark distances: minimum hop counts from EACH landmark separately
    * — the distance-sketch primitive (pick a handful of landmarks, store
    * per-node distance vectors, estimate any s→t distance by triangle
    * bounds without an all-pairs computation). Returns one
    * (landmark, node, hops) row per landmark that reaches the node
    * within `maxHops`.
    *
    * Same per-round discipline as [[bfsReachable]] but keyed on the
    * COMPOSITE (landmark, node): all landmarks expand in the SAME
    * per-round join — one shuffle per hop regardless of landmark count,
    * never a driver loop over landmarks. State is (lm, node, int); the
    * frontier shrinks to newly reached (lm, node) pairs each round and
    * the loop exits early when every landmark's frontier is exhausted.
    */
  def landmarkDistances(edges: DataFrame, landmarks: DataFrame, maxHops: Int,
                        srcCol: String = "src", dstCol: String = "dst",
                        nodeCol: String = "node"): DataFrame = {
    require(maxHops >= 0, s"maxHops must be >= 0, got $maxHops")
    val e = edges.select(col(srcCol).as("_from"), col(dstCol).as("_to")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    var visited = landmarks.select(col(nodeCol).as("lm")).distinct()
      .withColumn("node", col("lm")).withColumn("hops", lit(0))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var frontier = visited
    var frontierN = frontier.count()
    var h = 1
    val retired = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    while (h <= maxHops && frontierN > 0) {
      val next = frontier.join(e, frontier("node") === e("_from"))
        .select(col("lm"), col("_to").as("node")).distinct()
        .join(visited.select("lm", "node"), Seq("lm", "node"), "left_anti")
        .withColumn("hops", lit(h))
        .persist(StorageLevel.MEMORY_AND_DISK)
      frontierN = next.count() // materialize BEFORE unpersisting parents
      val nextVisited = visited.unionAll(next)
        .persist(StorageLevel.MEMORY_AND_DISK)
      nextVisited.count()
      retired += visited; retired += next
      visited = nextVisited
      frontier = next
      h += 1
    }
    retired.foreach(_.unpersist())
    e.unpersist()
    visited
  }

  /** Bounded harmonic centrality from a landmark sample: per node,
    * Σ over landmarks reaching it within `maxHops` of 1/hops (the
    * landmark itself contributes nothing at hops 0 — 1/0 is excluded by
    * definition). Harmonic form handles disconnection gracefully where
    * classic closeness (n−1)/Σd does not; with integer hops the terms
    * are exact reciprocals, so a SQL oracle reproduces the rounded sum.
    */
  def harmonicCentrality(edges: DataFrame, landmarks: DataFrame, maxHops: Int,
                         srcCol: String = "src", dstCol: String = "dst",
                         nodeCol: String = "node"): DataFrame =
    landmarkDistances(edges, landmarks, maxHops, srcCol, dstCol, nodeCol)
      .filter(col("hops") > 0)
      .groupBy("node")
      .agg(count(lit(1)).as("n_landmarks"),
        sum(lit(1.0) / col("hops")).as("harmonic"))

  /** Strongly connected components of a DIRECTED graph — the cycle
    * detector the directed KG needs (mutual-implication clusters, circular
    * ownership/citation rings) where [[ConnectedComponents]] only sees the
    * undirected shadow. Tarjan's stack is inherently sequential, so this
    * is the distributed alternative: min-label forward/backward PARTITION
    * REFINEMENT (the two-direction label propagation of Slota et al.'s
    * MultiStep family, shaped for DataFrames).
    *
    * Invariant: partitions only ever contain whole SCCs. Per outer round,
    * within each partition, propagate f(u) = min id that REACHES u and
    * b(u) = min id u CAN REACH (paths confined to the partition — safe,
    * because an SCC's internal paths never leave its partition). Nodes of
    * one SCC then share (f, b); a class with f == b == w is exactly
    * SCC(w) (w reaches u and u reaches w), and each partition's minimum
    * node m always yields f(m) == b(m) == m, so EVERY partition retires
    * at least its min node's SCC EVERY round — guaranteed progress, ~log
    * rounds on real graphs (a path graph needs 2, where classic FW-BW
    * coloring needs n). Unresolved classes re-partition on (part, f, b)
    * and iterate.
    *
    * Scale shape: state is (node, part) + a (node, label) frame per
    * direction; every inner round is one edge⋈label hash join + one
    * min-aggregation, keyed on node id — no adjacency lists, no driver
    * graph. Labels decrease monotonically, so inner fixpoints terminate
    * in ≤ partition-diameter rounds (pointer jumping cuts that to
    * O(log)); per-round EAGER localCheckpoints truncate plans, their
    * retired blocks reclaimed by the ContextCleaner as frames leave
    * driver reach (MEMORY_AND_DISK — pressure spills, never fails).
    * Same-part edges are recomputed ONCE per outer round and shrink as
    * components retire.
    *
    * Returns (node, scc_id) with scc_id = the component's minimum node
    * id, for every node incident to at least one edge (matching the SQL
    * oracle's closure over the edge list). Throws if the round budgets
    * are exhausted before the fixpoint — a loud failure, never a
    * silently-partial labeling.
    */
  def scc(edges: DataFrame, maxOuterRounds: Int = 40, maxInnerRounds: Int = 500,
          srcCol: String = "src", dstCol: String = "dst",
          localThreshold: Long = 100000L): DataFrame = {
    require(maxOuterRounds > 0 && maxInnerRounds > 0,
      s"round budgets must be positive, got ($maxOuterRounds, $maxInnerRounds)")
    // integral or string ids only: the Tarjan cutover must reproduce the
    // distributed path's min/least ordering exactly, which float ids
    // (ulp ties), decimals (scale), and exotic types make treacherous
    edges.schema(srcCol).dataType match {
      case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType |
           org.apache.spark.sql.types.StringType => ()
      case other => throw new IllegalArgumentException(
        s"scc supports integral or string node ids, got ${other.simpleString}")
    }
    val e0 = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .filter(col("src") =!= col("dst")).distinct().localCheckpoint()

    // the forward and backward min-label fixpoints, run as ONE tagged loop
    // (dir ∈ {f, b} rides the join key): labels decrease monotonically
    // along same-partition edges until no row changes. Fusing the two
    // directions halves the per-round job count and the total rounds are
    // max(fwd, bwd) instead of their sum — on a driver-latency-bound
    // local run that is the dominant cost of the whole operator.
    def propagateBoth(nodesPart: DataFrame, pe: DataFrame): DataFrame = {
      val adj = pe.select(col("src").as("from"), col("dst").as("to"), lit("f").as("dir"))
        .unionAll(pe.select(col("dst").as("from"), col("src").as("to"), lit("b").as("dir")))
      // EAGER localCheckpoint per round: each round's plan references the
      // label frame THREE times (edge relaxation, the jump self-join, and
      // the join-back), so without plan truncation Catalyst re-analyzes a
      // tree that grows 3^round — the empirical blowup was 0.4 s rounds
      // degrading to 40 s by round ~15. An eager checkpoint collapses the
      // plan to a LogicalRDD at a fixed one-extra-job cost per round, and
      // pointer jumping keeps the round count logarithmic.
      var lbl = nodesPart.select(col("n"), lit("f").as("dir"), col("n").as("l"))
        .unionAll(nodesPart.select(col("n"), lit("b").as("dir"), col("n").as("l")))
        .localCheckpoint()
      var round = 0
      var changed = 1L
      while (changed > 0) {
        round += 1
        val t0 = System.nanoTime()
        require(round <= maxInnerRounds,
          s"scc: label propagation did not converge in $maxInnerRounds rounds")
        // 1-hop edge relaxation AND pointer jumping in ONE join: the label
        // map is itself an edge set — a label w on u certifies "w reaches
        // u (resp. is reached)", so the jump l(u) ← l(l(u)) is exactly
        // relaxation along the derived edge (l(u) → u). Unioning those
        // label edges into the adjacency before the single relax join
        // halves the per-round join count while keeping the jump's
        // O(log n) collapse of the fixpoint (vs O(partition diameter) —
        // the difference between 10^4 and ~14 rounds on a long production
        // cycle). The fixpoint itself is unchanged (min id that reaches/
        // is-reached within the partition). (Deeper intra-round jump
        // composition — l^4/l^8 per round — was measured and LOST:
        // convergence here is edge-relaxation-bound, so the extra
        // compositions bought no rounds and tripled the per-round plan.)
        val relax = adj.unionAll(
          lbl.select(col("l").as("from"), col("n").as("to"), col("dir")))
        val cand = relax.join(lbl, relax("from") === lbl("n") && relax("dir") === lbl("dir"))
          .select(relax("to").as("n"), relax("dir").as("dir"), col("l"))
          .groupBy(col("n"), col("dir")).agg(min(col("l")).as("c"))
        val next = lbl.join(cand, Seq("n", "dir"), "left_outer")
          .select(col("n"), col("dir"),
            least(col("l"), coalesce(col("c"), col("l"))).as("l"),
            (col("c").isNotNull && col("c") < col("l")).as("_chg"))
          .localCheckpoint()
        changed = next.filter(col("_chg")).count()
        if (sys.env.contains("GRAFT_SCC_DEBUG"))
          System.err.println(f"[scc] inner round $round changed=$changed " +
            f"${(System.nanoTime() - t0) / 1e9}%.1fs")
        // superseded checkpoint blocks are released by the ContextCleaner
        // once the round's frames drop out of driver reach (the same
        // lifecycle ConnectedComponents relies on — Dataset.unpersist
        // does not cover RDD-level localCheckpoint storage); they are
        // MEMORY_AND_DISK, so accumulation across a long run degrades to
        // disk spill, never OOM or wrong results
        lbl = next.select("n", "dir", "l")
      }
      lbl
    }

    var live = e0.select(col("src").as("n")).unionAll(e0.select(col("dst").as("n")))
      .distinct().withColumn("part", lit("0"))
      .localCheckpoint()
    var nLive = live.count()
    val done = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    var outer = 0
    while (nLive > 0 && nLive > localThreshold) {
      outer += 1
      require(outer <= maxOuterRounds,
        s"scc: $nLive nodes unresolved after $maxOuterRounds refinement rounds")
      // same-partition edges among live nodes, computed once per round
      val pe = e0
        .join(live.select(col("n").as("src"), col("part").as("_ps")), "src")
        .join(live.select(col("n").as("dst"), col("part").as("_pd")), "dst")
        .filter(col("_ps") === col("_pd"))
        .select("src", "dst")
        .persist(StorageLevel.MEMORY_AND_DISK)
      pe.count()
      val fb = propagateBoth(live, pe)
      val labeled = live
        .join(fb.filter(col("dir") === "f").select(col("n"), col("l").as("f")), "n")
        .join(fb.filter(col("dir") === "b").select(col("n"), col("l").as("b")), "n")
        .persist(StorageLevel.MEMORY_AND_DISK)
      labeled.count()
      val resolved = labeled.filter(col("f") === col("b"))
        .select(col("n").as("node"), col("f").as("scc_id"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      resolved.count()
      done += resolved
      // the ONLY frame carried across outer rounds — truncate its lineage
      // (lazy localCheckpoint, materialized by the count; the
      // [[ConnectedComponents]] once-per-round discipline — nesting
      // checkpoints inside the inner fixpoint is what blows up)
      val next = labeled.filter(col("f") =!= col("b"))
        .select(col("n"),
          concat_ws("|", col("part"), col("f").cast("string"),
            col("b").cast("string")).as("part"))
        .localCheckpoint()
      nLive = next.count()
      if (sys.env.contains("GRAFT_SCC_DEBUG"))
        System.err.println(s"[scc] outer round $outer remaining=$nLive")
      labeled.unpersist(); pe.unpersist()
      live = next
    }
    if (nLive > 0) {
      // small remainder (or small graph): finish with driver-side Tarjan —
      // the same size-adaptive cutover [[ConnectedComponents.run]] makes.
      // Only same-partition edges can belong to an SCC, so the collected
      // subgraph is exact, and the tail of a refinement loop is where a
      // distributed fixpoint pays the most jobs per resolved node.
      val spark = edges.sparkSession
      val lp = live.select("n", "part").collect()
      val peL = e0
        .join(live.select(col("n").as("src"), col("part").as("_ps")), "src")
        .join(live.select(col("n").as("dst"), col("part").as("_pd")), "dst")
        .filter(col("_ps") === col("_pd"))
        .select("src", "dst").collect()
      val nodeVals: Array[Any] = lp.map(_.get(0))
      val nodeIdx = nodeVals.zipWithIndex.toMap
      val n = nodeVals.length
      val adjB = Array.fill(n)(scala.collection.mutable.ArrayBuffer.empty[Int])
      peL.foreach(r => adjB(nodeIdx(r.get(0))) += nodeIdx(r.get(1)))
      val comp = tarjanScc(adjB.map(_.toArray))
      // scc_id = the component's minimum member under EXACTLY the order
      // Spark's min/least used on the distributed path: numeric for the
      // integral types, UTF-8 BINARY for strings (String.compareTo is
      // UTF-16 code-unit order, which disagrees beyond the BMP)
      val cmp: (Any, Any) => Int = {
        case (x: java.lang.Number, y: java.lang.Number) =>
          java.lang.Long.compare(x.longValue, y.longValue)
        case (x: String, y: String) =>
          val (a, b) = (x.getBytes(java.nio.charset.StandardCharsets.UTF_8),
            y.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          var i = 0
          var r = 0
          while (r == 0 && i < a.length && i < b.length) {
            r = java.lang.Integer.compare(a(i) & 0xff, b(i) & 0xff); i += 1
          }
          if (r != 0) r else java.lang.Integer.compare(a.length, b.length)
        case (a, b) => a.toString.compareTo(b.toString) // unreachable: gated above
      }
      val minOf = new Array[Any](n)
      (0 until n).foreach { i =>
        val c = comp(i)
        if (minOf(c) == null || cmp(nodeVals(i), minOf(c)) < 0) minOf(c) = nodeVals(i)
      }
      val dt = e0.schema("src").dataType
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("node", dt),
        org.apache.spark.sql.types.StructField("scc_id", dt)))
      val rows = new java.util.ArrayList[org.apache.spark.sql.Row](n)
      (0 until n).foreach(i =>
        rows.add(org.apache.spark.sql.Row(nodeVals(i), minOf(comp(i)))))
      done += spark.createDataFrame(rows, schema)
    }
    if (done.isEmpty)            // edgeless input: no incident nodes at all
      return e0.select(col("src").as("node"), col("src").as("scc_id")).limit(0)
    val out = done.reduceLeft(_ unionAll _).localCheckpoint()
    out.count()
    done.foreach(_.unpersist())
    out
  }

  /** Deterministic random walks — the sequence generator for graph
    * embedding pipelines (DeepWalk / node2vec input: one walk per start
    * node, corpus of node sequences out). "Random" is a PORTABLE
    * deterministic function, not an RNG: at step k a walk at node u picks
    * out-neighbor rank
    *   (bucket(start, seed+k) + bucket(u, seed+1000+k)) % deg(u)
    * over the node's out-neighbors ranked by id — [[graft.ops.Sampling
    * .bucket]] is the repo's double-fold multiplicative hash, exact in
    * 64-bit integer arithmetic on any engine, so a SQL oracle replays
    * every step bit-for-bit (the same portable-determinism contract as
    * the sampling and shuffle operators). Folding BOTH the walk identity
    * and the current node into the choice decorrelates walks that meet at
    * the same node mid-walk.
    *
    * Scale shape: the ranked adjacency (one row_number window over the
    * out-edges) and out-degrees are computed once; each step is one hash
    * equi-join keyed on the current node — walkLen shuffles total, state
    * is (start, node) pairs. Walks terminate early at sink nodes (the
    * join drops them). Node ids must be integral (the portable hash is
    * integer arithmetic).
    *
    * Returns (start, step, node) long-form walks, step 0 = the start node
    * itself, one walk per node incident to any edge.
    */
  def randomWalks(edges: DataFrame, walkLen: Int, seed: Long,
                  srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    require(walkLen >= 1 && walkLen <= 16,
      s"walkLen must be in [1,16] (each step is an unrolled join), got $walkLen")
    val e = edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .filter(col("src") =!= col("dst")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("src").orderBy("dst")
    val ranked = e.withColumn("rk", row_number().over(w) - 1)
      .persist(StorageLevel.MEMORY_AND_DISK)
    // renamed projections per use — a walk revisits `ranked` every step,
    // and Dataset-tagged column references across that self-join are
    // ambiguous; unique NAMES resolve cleanly
    val degR = e.groupBy("src").agg(count(lit(1)).as("_deg"))
      .select(col("src").as("_ds"), col("_deg"))
    val rankedR = ranked.select(col("src").as("_rs"), col("dst").as("_rd"),
      col("rk").as("_rk"))
    val starts = e.select(col("src").as("n")).unionAll(e.select(col("dst").as("n")))
      .distinct()
    var cur = starts.select(col("n").as("start"), col("n").as("node"))
    val steps = scala.collection.mutable.ArrayBuffer[DataFrame](
      cur.withColumn("step", lit(0)))
    var k = 1
    while (k <= walkLen) {
      val pick = pmod(
        graft.ops.Sampling.bucket(col("start"), seed + k) +
          graft.ops.Sampling.bucket(col("node"), seed + 1000 + k),
        lit(graft.ops.Sampling.Buckets))
      cur = cur.join(degR, col("node") === col("_ds"))
        .withColumn("_pick", pick % col("_deg"))
        .join(rankedR, col("node") === col("_rs") && col("_pick") === col("_rk"))
        .select(col("start"), col("_rd").as("node"))
      steps += cur.withColumn("step", lit(k))
      k += 1
    }
    val out = steps.reduceLeft(_ unionAll _).select("start", "step", "node")
      .persist(StorageLevel.MEMORY_AND_DISK)
    out.count()
    ranked.unpersist(); e.unpersist()
    out
  }

  /** node2vec-BIASED deterministic walks — [[randomWalks]] upgraded with
    * the Grover–Leskovec second-order bias: from node u with previous node
    * p, each out-neighbor v carries an integer weight by its relation to p
    * (v = p → `wReturn`, the 1/p return bias; p→v edge exists → `wCommon`,
    * the BFS-ish stay-local bias; else → `wFar`, the 1/q DFS-ish
    * exploration bias; directed adjacency — p→v — stands in for the
    * paper's undirected neighbor test). The deterministic pick walks the
    * id-ordered neighbors' cumulative weights and selects the one whose
    * range contains hash % total-weight — the same portable double-fold
    * hash as [[randomWalks]], so a SQL oracle replays every biased hop
    * bit-for-bit. Step 1 has no previous node and picks uniformly (the
    * [[randomWalks]] rule, same salts).
    *
    * Scale shape per step: one hash equi-join expands each walk to its
    * current node's out-neighbors (degree-bounded), one left join marks
    * p-adjacency, and two per-walk windows (cumulative + total weight —
    * partitions are single walks, never data-sized); walkLen shuffles
    * total, state (start, prev, node). Sinks terminate walks early.
    * Integral node ids only.
    *
    * Returns (start, step, node), step 0 = the start node.
    */
  def biasedWalks(edges: DataFrame, walkLen: Int, seed: Long,
                  wReturn: Int = 1, wCommon: Int = 4, wFar: Int = 2,
                  srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    require(walkLen >= 1 && walkLen <= 8,
      s"walkLen must be in [1,8] (each step is an unrolled join), got $walkLen")
    require(wReturn > 0 && wCommon > 0 && wFar > 0, "bias weights must be positive")
    val e = edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .filter(col("src") =!= col("dst")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("src").orderBy("dst")
    val rankedR = e.withColumn("rk", row_number().over(w) - 1)
      .select(col("src").as("_rs"), col("dst").as("_rd"), col("rk").as("_rk"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val degR = e.groupBy("src").agg(count(lit(1)).as("_deg"))
      .select(col("src").as("_ds"), col("_deg"))
    val starts = e.select(col("src").as("n")).unionAll(e.select(col("dst").as("n")))
      .distinct()
    val step0 = starts.select(col("n").as("start"), col("n").as("node"))
    val pick1 = pmod(
      graft.ops.Sampling.bucket(col("start"), seed + 1) +
        graft.ops.Sampling.bucket(col("node"), seed + 1001),
      lit(graft.ops.Sampling.Buckets))
    var cur = step0.join(degR, col("node") === col("_ds"))
      .withColumn("_pick", pick1 % col("_deg"))
      .join(rankedR, col("node") === col("_rs") && col("_pick") === col("_rk"))
      .select(col("start"), col("node").as("prev"), col("_rd").as("node"))
    val steps = scala.collection.mutable.ArrayBuffer[DataFrame](
      step0.withColumn("step", lit(0)),
      cur.select("start", "node").withColumn("step", lit(1)))
    val adjR = e.select(col("src").as("_as"), col("dst").as("_ad"), lit(1).as("_adj"))
    for (k <- 2 to walkLen) {
      val cand = cur
        .join(e.select(col("src").as("_cs"), col("dst").as("_v")),
          col("node") === col("_cs"))
        .join(adjR, col("prev") === col("_as") && col("_v") === col("_ad"),
          "left_outer")
        .withColumn("_w",
          when(col("_v") === col("prev"), lit(wReturn))
            .when(col("_adj").isNotNull, lit(wCommon))
            .otherwise(lit(wFar)).cast("long"))
      val wc = org.apache.spark.sql.expressions.Window
        .partitionBy("start").orderBy("_v")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      val wt = org.apache.spark.sql.expressions.Window.partitionBy("start")
      val pick = pmod(
        graft.ops.Sampling.bucket(col("start"), seed + k) +
          graft.ops.Sampling.bucket(col("node"), seed + 1000 + k),
        lit(graft.ops.Sampling.Buckets))
      cur = cand
        .withColumn("_cum", sum(col("_w")).over(wc))
        .withColumn("_tot", sum(col("_w")).over(wt))
        .withColumn("_pk", pick % col("_tot"))
        .filter(col("_pk") >= col("_cum") - col("_w") && col("_pk") < col("_cum"))
        .select(col("start"), col("node").as("prev"), col("_v").as("node"))
      steps += cur.select("start", "node").withColumn("step", lit(k))
    }
    val out = steps.reduceLeft(_ unionAll _).select("start", "step", "node")
      .persist(StorageLevel.MEMORY_AND_DISK)
    out.count()
    rankedR.unpersist(); e.unpersist()
    out
  }

  /** Condensation of a directed graph: collapse each SCC (from [[scc]])
    * to one node and keep the distinct cross-component edges — by
    * construction a DAG — then layer it by LONGEST path from the sources:
    * level(c) = max over in-edges of level(parent) + 1, 0 at sources.
    * The KG reading: a dependency/flow ordering over mutually-entangled
    * clusters ("which rings feed which"), and the standard preprocessing
    * step before any topological computation on a cyclic graph.
    *
    * The level fixpoint is one hash join + max-aggregation per round over
    * (component, int) state, rounds bounded by the DAG depth, plans
    * truncated per round (the [[scc]] discipline). Throws if `maxRounds`
    * is exhausted — on a true DAG that means depth > maxRounds, never
    * divergence.
    *
    * Returns (scc_id, level, n_members).
    */
  def condensationLevels(edges: DataFrame, maxRounds: Int = 1000,
                         srcCol: String = "src", dstCol: String = "dst",
                         sccLocalThreshold: Long = 100000L,
                         precomputedScc: Option[DataFrame] = None): DataFrame = {
    // callers that already ran scc on these edges pass it in — the SCC
    // fixpoint dominates the cost and need not run twice
    val comp = precomputedScc.getOrElse(scc(edges, srcCol = srcCol,
      dstCol = dstCol, localThreshold = sccLocalThreshold))
    val e = edges.select(col(srcCol).as("_s"), col(dstCol).as("_d"))
    val ce = e
      .join(comp.select(col("node").as("_s"), col("scc_id").as("cs")), "_s")
      .join(comp.select(col("node").as("_d"), col("scc_id").as("cd")), "_d")
      .filter(col("cs") =!= col("cd"))
      .select("cs", "cd").distinct()
      .localCheckpoint()
    var lvl = comp.select(col("scc_id")).distinct()
      .withColumn("level", lit(0)).localCheckpoint()
    var changed = 1L
    var round = 0
    while (changed > 0) {
      round += 1
      require(round <= maxRounds,
        s"condensationLevels: depth exceeds $maxRounds rounds")
      val cand = ce.join(lvl, ce("cs") === lvl("scc_id"))
        .groupBy(col("cd").as("scc_id")).agg((max(col("level")) + 1).as("c"))
      val next = lvl.join(cand, Seq("scc_id"), "left_outer")
        .select(col("scc_id"),
          greatest(col("level"), coalesce(col("c"), col("level"))).as("level"),
          (col("c").isNotNull && col("c") > col("level")).as("_chg"))
        .localCheckpoint()
      changed = next.filter(col("_chg")).count()
      lvl = next.select("scc_id", "level")
    }
    val members = comp.groupBy("scc_id").agg(count(lit(1)).as("n_members"))
    lvl.join(members, "scc_id")
  }

  /** Iterative Tarjan over an index-based adjacency list (explicit stacks,
    * no recursion — a 100k-node chain must not overflow the driver stack).
    * Returns a component index per node; component indices are arbitrary.
    */
  private def tarjanScc(adj: Array[Array[Int]]): Array[Int] = {
    val n = adj.length
    val index = Array.fill(n)(-1)
    val low = new Array[Int](n)
    val onStk = new Array[Boolean](n)
    val ptr = new Array[Int](n)
    val comp = Array.fill(n)(-1)
    val stk = new java.util.ArrayDeque[Integer]
    val call = new java.util.ArrayDeque[Integer]
    var idx = 0
    var nComp = 0
    var root = 0
    while (root < n) {
      if (index(root) == -1) {
        call.push(root)
        index(root) = idx; low(root) = idx; idx += 1
        stk.push(root); onStk(root) = true
        while (!call.isEmpty) {
          val v = call.peek.intValue
          if (ptr(v) < adj(v).length) {
            val w = adj(v)(ptr(v)); ptr(v) += 1
            if (index(w) == -1) {
              index(w) = idx; low(w) = idx; idx += 1
              stk.push(w); onStk(w) = true
              call.push(w)
            } else if (onStk(w)) {
              if (index(w) < low(v)) low(v) = index(w)
            }
          } else {
            call.pop()
            if (!call.isEmpty) {
              val p = call.peek.intValue
              if (low(v) < low(p)) low(p) = low(v)
            }
            if (low(v) == index(v)) {
              var w = -1
              while (w != v) {
                w = stk.pop().intValue
                onStk(w) = false
                comp(w) = nComp
              }
              nComp += 1
            }
          }
        }
      }
      root += 1
    }
    comp
  }
}
