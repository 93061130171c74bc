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
  * chain would be fatal. Each round is one groupBy + one join (hash shuffles
  * on node id); `localCheckpoint` truncates the lineage so the plan doesn't
  * grow with iterations.
  *
  * Input: edges DataFrame with long columns (src, dst), undirected, self
  * loops ignored. Output: (id, component) — component = min node id in the
  * component; isolated vertices of the edge set map to themselves.
  */
object ConnectedComponents {

  /** large-star: connect every strictly-larger neighbor of u to
    * m = min(N(u) ∪ {u}).
    */
  private def largeStar(e: DataFrame): DataFrame = {
    val both = e.select(col("src").as("u"), col("dst").as("v"))
      .unionAll(e.select(col("dst").as("u"), col("src").as("v")))
    val withMin = both
      .groupBy("u")
      .agg(min(col("v")).as("mn"), collect_set(col("v")).as("nbrs"))
      .withColumn("m", least(col("u"), col("mn")))
    withMin
      .select(col("u"), col("m"), explode(col("nbrs")).as("v"))
      .filter(col("v") > col("u"))
      .select(col("v").as("src"), col("m").as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
  }

  /** small-star: orient edges toward the larger endpoint; connect every
    * smaller-or-equal neighbor (and u itself) to the min.
    */
  private def smallStar(e: DataFrame): DataFrame = {
    val directed = e.select(
      greatest(col("src"), col("dst")).as("u"),
      least(col("src"), col("dst")).as("v"))
    val grouped = directed
      .groupBy("u")
      .agg(min(col("v")).as("m"), collect_set(col("v")).as("nbrs"))
    grouped
      .select(col("u"), col("m"),
        explode(array_union(col("nbrs"), array(col("u")))).as("v"))
      .filter(col("v") =!= col("m"))
      .select(col("v").as("src"), col("m").as("dst"))
      .distinct()
  }

  /** Returns (id, component) for every node id appearing in `edges`. */
  def run(edges: DataFrame, maxIter: Int = 25): DataFrame = {
    val spark = edges.sparkSession
    val e0 = edges
      .select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
    val allNodes = e0.select(col("src").as("id"))
      .unionAll(e0.select(col("dst").as("id"))).distinct().localCheckpoint()
    var e = e0
      .filter(col("src") =!= col("dst"))
      .distinct()
      .localCheckpoint()

    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val ls = largeStar(e)
      val ss = smallStar(ls).localCheckpoint()
      // Converged when the small-star output equals the previous edge set.
      val changed = ss.exceptAll(e).limit(1).count() + e.exceptAll(ss).limit(1).count()
      e = ss
      converged = changed == 0
      i += 1
    }
    // After convergence every edge points node -> component min.
    val assign = e.select(col("src").as("id"), col("dst").as("component"))
      .groupBy("id").agg(min("component").as("component"))
    // Roots and isolated nodes map to themselves.
    allNodes.join(assign, Seq("id"), "left_outer")
      .select(col("id"), coalesce(col("component"), col("id")).as("component"))
  }

  /** Convenience for string-keyed vertices: hashes keys to stable longs via
    * xxhash64, runs CC, and returns (key, component_key) where component_key
    * is the minimum ORIGINAL key (lexicographic) in the component.
    */
  def runOnStrings(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val spark = edges.sparkSession
    val keyed = edges.select(
      col(srcCol).as("ks"), col(dstCol).as("kd"),
      xxhash64(col(srcCol)).as("src"), xxhash64(col(dstCol)).as("dst"))
    val idMap = keyed.select(col("ks").as("key"), col("src").as("id"))
      .unionAll(keyed.select(col("kd").as("key"), col("dst").as("id")))
      .distinct()
    val cc = run(keyed.select("src", "dst"))
    val withKeys = idMap.join(cc, Seq("id"))
    val canon = withKeys
      .groupBy("component").agg(min("key").as("canonical"))
    withKeys.join(canon, Seq("component"))
      .select(col("key"), col("canonical"))
  }
}
