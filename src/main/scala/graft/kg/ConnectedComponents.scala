package graft.kg

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Connected components as iterative DataFrame self-joins — no GraphX, no
  * RDDs (BASELINE.json north_star requirement).
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14). Converges in
  * O(log^2 n) rounds independent of graph diameter — the right choice at
  * 10^12-edge scale, where label propagation's O(diameter) rounds on a long
  * chain would be fatal.
  *
  * Cost discipline (this loop runs inside larger pipelines):
  *   - ONE action per iteration: convergence is checked with a
  *     (count, xxhash64-sum) fingerprint of the edge set computed in the
  *     same job that materializes the lazy localCheckpoint — not with
  *     exceptAll (which costs two extra shuffle jobs per round).
  *   - lineage truncated per round via localCheckpoint (lazy; materialized
  *     by the fingerprint action).
  *   - shuffle width adapts to the edge count (`partitionsFor`): a
  *     66-surface similarity graph must not pay 32-partition shuffles per
  *     round, and a 10^10-edge graph must not run single-partition. AQE
  *     handles the in-between.
  *
  * Input: edges DataFrame with long columns (src, dst), undirected, self
  * loops ignored. Output: (id, component) — component = min node id in the
  * component; isolated vertices of the edge set map to themselves.
  */
object ConnectedComponents {

  /** large-star: connect every strictly-larger neighbor of u to
    * m = min(N(u) ∪ {u}).
    *
    * Hub-proof formulation: an aggregate for min(v) per u, then a join back
    * to the edge list — two exchanges on the SAME key (the join reuses the
    * aggregation's hash partitioning). The collect_set alternative
    * materializes each neighborhood as one array: a 10^8-degree hub in a
    * 10^12-edge graph becomes a single multi-GB row on a single task. Here
    * a hub is just many (u, v) rows, which AQE's skew-join splitting
    * already knows how to spread.
    */
  private def largeStar(e: DataFrame): DataFrame = {
    val both = e.select(col("src").as("u"), col("dst").as("v"))
      .unionAll(e.select(col("dst").as("u"), col("src").as("v")))
    val mins = both.groupBy("u")
      .agg(min(col("v")).as("mn"))
      .select(col("u"), least(col("u"), col("mn")).as("m"))
    both.join(mins, "u")
      .filter(col("v") > col("u"))
      .select(col("v").as("src"), col("m").as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
  }

  /** small-star: orient edges toward the larger endpoint; connect every
    * smaller neighbor (and u itself) to the min. Same hub-proof
    * aggregate-then-join shape as [[largeStar]].
    */
  private def smallStar(e: DataFrame): DataFrame = {
    val directed = e.select(
      greatest(col("src"), col("dst")).as("u"),
      least(col("src"), col("dst")).as("v"))
    val mins = directed.groupBy("u").agg(min(col("v")).as("m"))
    val nbrEdges = directed.join(mins, "u")
      .filter(col("v") =!= col("m"))
      .select(col("v").as("src"), col("m").as("dst"))
    val selfEdges = mins
      .filter(col("u") =!= col("m"))
      .select(col("u").as("src"), col("m").as("dst"))
    nbrEdges.unionAll(selfEdges).distinct()
  }

  /** Edge-set fingerprint (count + order-independent hash sum) — one job,
    * also materializes the lazy checkpoint backing `e`.
    */
  private def fingerprint(e: DataFrame): (Long, BigDecimal) = {
    // decimal sum: overflow-free under ANSI mode
    val r = e.agg(
      count(lit(1)),
      sum(xxhash64(col("src"), col("dst")).cast("decimal(38,0)"))).head()
    (r.getLong(0), if (r.isNullAt(1)) BigDecimal(0) else BigDecimal(r.getDecimal(1)))
  }

  /** Edge graphs at or below this size are solved with a driver-local
    * union-find instead of iterated distributed rounds — the same adaptive
    * move Spark makes when it collects a small join side to broadcast. Each
    * large-star/small-star round costs 2 shuffles + 1 action of driver-serial
    * latency; a 10^5-edge graph pays seconds of round-trips for work a local
    * union-find does in milliseconds. Both paths produce the identical
    * (id, min-id component) assignment (asserted in ConnectedComponentsSpec).
    */
  val DefaultLocalThreshold = 100000L

  /** Driver-local union-find (path halving, min-id roots). */
  private def localAssign(pairs: Array[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.LongMap.empty[Long]
    def find(x0: Long): Long = {
      var x = x0
      var p = parent.getOrElse(x, x)
      while (p != x) {
        val gp = parent.getOrElse(p, p)
        parent.update(x, gp)
        x = gp
        p = parent.getOrElse(x, x)
      }
      x
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent.update(rb, ra) else parent.update(ra, rb) }
    }
    val ids = pairs.iterator.flatMap(p => Iterator(p._1, p._2)).toSet
    ids.iterator.map(id => id -> find(id)).toMap
  }

  /** Returns (id, component) for every node id appearing in `edges`. */
  def run(edges: DataFrame, maxIter: Int = 25,
          localThreshold: Long = DefaultLocalThreshold): DataFrame = {
    val spark = edges.sparkSession
    val e0 = edges
      .select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
    val allNodes = e0.select(col("src").as("id"))
      .unionAll(e0.select(col("dst").as("id"))).distinct().localCheckpoint(false)

    var e = e0
      .filter(col("src") =!= col("dst"))
      .distinct()
      .localCheckpoint(false)
    var fp = fingerprint(e)

    if (fp._1 > 0 && fp._1 <= localThreshold) {
      // small graph: e is already materialized by the fingerprint action —
      // collect it and solve exactly in the driver
      import spark.implicits._
      val pairs = e.as[(Long, Long)].collect()
      val assign = spark.createDataset(localAssign(pairs).toSeq)
        .toDF("id", "component")
      return allNodes.join(assign, Seq("id"), "left_outer")
        .select(col("id"), coalesce(col("component"), col("id")).as("component"))
    }

    var converged = fp._1 == 0
    var i = 0
    while (!converged && i < maxIter) {
      // shuffle width: AQE coalesces the groupBy/join exchanges to match the
      // actual edge volume, so tiny graphs run narrow and huge graphs wide
      val ss = smallStar(largeStar(e)).localCheckpoint(false)
      val fp2 = fingerprint(ss)
      e = ss
      converged = fp2 == fp
      fp = fp2
      i += 1
    }
    if (!converged)
      // a truncated run can silently split components downstream — make the
      // exhaustion visible (callers that need a hard guarantee raise maxIter;
      // O(log^2 n) rounds means 25 covers any realistic n)
      org.slf4j.LoggerFactory.getLogger(getClass)
        .warn(s"connected components did NOT converge after $maxIter " +
          s"large-star/small-star rounds (edges=${fp._1}); assignment may split components")
    // After convergence every edge points node -> component min.
    val assign = e.select(col("src").as("id"), col("dst").as("component"))
      .groupBy("id").agg(min("component").as("component"))
    allNodes.join(assign, Seq("id"), "left_outer")
      .select(col("id"), coalesce(col("component"), col("id")).as("component"))
  }

  /** Convenience for string-keyed vertices: hashes keys to stable longs via
    * xxhash64, runs CC, and returns (key, component_key) where component_key
    * is the minimum ORIGINAL key (lexicographic) in the component.
    *
    * r6: size-adaptive like [[run]] — a probe of localThreshold+1 edge rows
    * decides the path in ONE job. At or below the threshold the probe IS
    * the complete edge set, and a driver union-find over the strings
    * replaces the whole distributed chain (hash → CC → idMap join →
    * canonical groupBy → join → materialize: 6+ driver-serial jobs that
    * cost seconds of round-trips for millisecond-scale work — the same
    * argument as run()'s local path, measured on q_cc_events). Above it
    * the probe is discarded and the distributed path runs unchanged.
    * Identical assignment: the local path unions original strings with
    * lexicographic-min roots — the distributed path's min-ORIGINAL-key
    * canonical, without the vanishing xxhash64 key-collision caveat.
    */
  def runOnStrings(edges: DataFrame, srcCol: String, dstCol: String,
                   localThreshold: Long = DefaultLocalThreshold): DataFrame = {
    val spark = edges.sparkSession
    val probeN = (math.min(localThreshold, Int.MaxValue - 1L) + 1L).toInt
    val probe = edges.select(col(srcCol).cast("string"), col(dstCol).cast("string"))
      .limit(probeN).collect()
    if (probe.length < probeN) {
      import spark.implicits._
      val parent = scala.collection.mutable.HashMap.empty[String, String]
      def find(x0: String): String = {
        var x = x0
        var p = parent.getOrElse(x, x)
        while (p != x) {
          val gp = parent.getOrElse(p, p)
          parent.update(x, gp)
          x = gp
          p = parent.getOrElse(x, x)
        }
        x
      }
      probe.foreach { r =>
        val (ra, rb) = (find(r.getString(0)), find(r.getString(1)))
        if (ra != rb) { if (ra < rb) parent.update(rb, ra) else parent.update(ra, rb) }
      }
      val keys = probe.iterator.flatMap(r => Iterator(r.getString(0), r.getString(1))).toSet
      return spark.createDataset(keys.iterator.map(k => k -> find(k)).toSeq)
        .toDF("key", "canonical")
    }
    runOnStringsDistributed(edges, srcCol, dstCol)
  }

  private def runOnStringsDistributed(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val keyed = edges.select(
      col(srcCol).as("ks"), col(dstCol).as("kd"),
      xxhash64(col(srcCol)).as("src"), xxhash64(col(dstCol)).as("dst"))
      // consumed by idMap twice and by run(); pin it so the (possibly
      // expensive) edge-producing subplan evaluates once
      .persist(StorageLevel.MEMORY_AND_DISK)
    val idMap = keyed.select(col("ks").as("key"), col("src").as("id"))
      .unionAll(keyed.select(col("kd").as("key"), col("dst").as("id")))
      .distinct()
    val cc = run(keyed.select("src", "dst"))
    val withKeys = idMap.join(cc, Seq("id"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val canon = withKeys
      .groupBy("component").agg(min("key").as("canonical"))
    val out = withKeys.join(canon, Seq("component"))
      .select(col("key"), col("canonical"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // materialize the assignment once, then release the working caches —
    // repeated pipeline invocations in one session must not accumulate blocks
    out.count()
    withKeys.unpersist()
    keyed.unpersist()
    out
  }
}
