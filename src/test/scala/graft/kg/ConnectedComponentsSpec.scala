package graft.kg

import graft.SparkSpec
import scala.collection.mutable
import scala.util.Random

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  /** Sequential union-find truth. */
  def ufComponents(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      parent.getOrElseUpdate(x, x)
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    // normalize: min id per component
    val byRoot = nodes.groupBy(find)
    byRoot.flatMap { case (_, ns) => val m = ns.min; ns.map(_ -> m) }.toMap
  }

  /** Both paths — the driver-local union-find (small-graph gate) and the
    * distributed large-star/small-star rounds (localThreshold=0 forces it) —
    * must produce the identical min-id assignment.
    */
  def check(edges: Seq[(Long, Long)]): Unit = {
    val want = ufComponents(edges)
    val local = ConnectedComponents.run(edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(local == want)
    val distributed = ConnectedComponents.run(edges.toDF("src", "dst"),
        localThreshold = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(distributed == want)
  }

  test("two simple components") {
    check(Seq((1L, 2L), (2L, 3L), (10L, 11L)))
  }

  test("long chain (diameter stress — log rounds, not diameter rounds)") {
    check((0L until 200L).map(i => (i, i + 1)))
  }

  test("star + cycle + isolated-in-edge-set") {
    check(Seq((5L, 1L), (5L, 2L), (5L, 3L), (20L, 21L), (21L, 22L), (22L, 20L), (30L, 30L + 0L)))
  }

  test("random graphs match union-find") {
    val rnd = new Random(42)
    for (trial <- 1 to 3) {
      val n = 300
      val edges = (1 to 400).map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
      check(edges)
    }
  }

  test("string-keyed CC returns lexicographic-min canonical") {
    val e = Seq(("acme", "acmee"), ("globex", "globexx"), ("zeta", "acme"))
      .toDF("a", "b")
    val got = ConnectedComponents.runOnStrings(e, "a", "b")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got("acmee") == "acme")
    assert(got("zeta") == "acme")
    assert(got("globexx") == "globex")
  }
}
