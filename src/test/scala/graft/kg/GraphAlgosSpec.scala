package graft.kg

import graft.SparkSpec
import graft.bulk.NodeSetOps
import graft.schema.NodeSpec
import org.apache.spark.sql.functions._

class GraphAlgosSpec extends SparkSpec {
  import spark.implicits._

  // path graph: 1→2→3→4→5, plus a detached 9→10 and a hub shortcut 1→4
  private def edges = Seq(
    (1, 2), (2, 3), (3, 4), (4, 5), (9, 10), (1, 4)
  ).toDF("src", "dst")

  test("bfsReachable: minimum hop counts, early shortcut wins") {
    val out = GraphAlgos.bfsReachable(
        edges.select(col("src").cast("string").as("src"), col("dst").cast("string").as("dst")),
        Seq("1").toDF("node"), maxHops = 4)
      .as[(String, Int)].collect().toMap
    // 4 is reachable in 1 hop via the shortcut (not 3 via the path)
    assert(out === Map("1" -> 0, "2" -> 1, "4" -> 1, "3" -> 2, "5" -> 2))
  }

  test("bfsReachable: maxHops truncates; 0 hops = sources only; reverse follows dst→src") {
    val e = edges.select(col("src").cast("string").as("src"), col("dst").cast("string").as("dst"))
    val h1 = GraphAlgos.bfsReachable(e, Seq("1").toDF("node"), maxHops = 1)
      .as[(String, Int)].collect().toMap
    assert(h1 === Map("1" -> 0, "2" -> 1, "4" -> 1))
    val h0 = GraphAlgos.bfsReachable(e, Seq("1").toDF("node"), maxHops = 0)
      .as[(String, Int)].collect().toMap
    assert(h0 === Map("1" -> 0))
    val rev = GraphAlgos.bfsReachable(e, Seq("5").toDF("node"), maxHops = 2, reverse = true)
      .as[(String, Int)].collect().toMap
    assert(rev === Map("5" -> 0, "4" -> 1, "3" -> 2, "1" -> 2))
  }

  test("bfsReachable: multiple sources settle at their nearest hop") {
    val e = edges.select(col("src").cast("string").as("src"), col("dst").cast("string").as("dst"))
    val out = GraphAlgos.bfsReachable(e, Seq("3", "9").toDF("node"), maxHops = 2)
      .as[(String, Int)].collect().toMap
    assert(out === Map("3" -> 0, "9" -> 0, "4" -> 1, "10" -> 1, "5" -> 2))
  }

  test("coMentionEdges: distinct-group support, each unordered pair once") {
    val df = Seq(
      ("g1", "x"), ("g1", "y"), ("g1", "z"), ("g1", "x"), // duplicate mention
      ("g2", "x"), ("g2", "y"),
      ("g3", "x")                                          // singleton: no pairs
    ).toDF("grp", "ent")
    val out = GraphAlgos.coMentionEdges(df, "grp", "ent")
      .as[(String, String, Long)].collect().toSet
    assert(out === Set(("x", "y", 2L), ("x", "z", 1L), ("y", "z", 1L)))
  }

  test("coMentionEdges: maxGroupSize drops degenerate groups entirely") {
    val big = (1 to 50).map(i => ("big", s"e$i"))
    val df = (big ++ Seq(("small", "a"), ("small", "b"))).toDF("grp", "ent")
    val out = GraphAlgos.coMentionEdges(df, "grp", "ent", maxGroupSize = 10)
      .as[(String, String, Long)].collect().toSet
    assert(out === Set(("a", "b", 1L)))
  }

  test("triangleCounts: hand graph — K4 plus a pendant") {
    // K4 on {1,2,3,4}: each node is in C(3,2)=3 triangles; pendant 5 in none
    val e = Seq((1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5),
      (2, 1) /* duplicate reversed edge must not double-count */)
      .toDF("a", "b")
    val out = GraphAlgos.triangleCounts(e).as[(Int, Long)].collect().toMap
    assert(out === Map(1 -> 3L, 2 -> 3L, 3 -> 3L, 4 -> 3L))
  }

  test("clusteringCoefficient: 2T/d(d-1) with low-degree and pendant conventions") {
    // K4 on {1,2,3,4} + pendant 5 on node 4
    val e = Seq((1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5)).toDF("a", "b")
    val out = GraphAlgos.clusteringCoefficient(e)
      .as[(Int, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1) === ((3L, 3L, 1.0)) && out(2) === ((3L, 3L, 1.0)))
    assert(out(4) === ((3L, 4L, 0.5)))  // pendant dilutes: 6/12
    assert(out(5) === ((0L, 1L, 0.0)))  // degree-1 convention
  }

  test("triangleCounts matches a brute-force oracle on a deterministic random graph") {
    val rnd = new scala.util.Random(42)
    val n = 30
    val edges = (for {
      i <- 1 to n; j <- (i + 1) to n if rnd.nextDouble() < 0.2
    } yield (i, j)).toSeq
    val adj = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val oracle = (for {
      (a, b) <- edges
      c <- adj(a).intersect(adj(b)) if c > b
    } yield Seq(a, b, c)).flatten
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val out = GraphAlgos.triangleCounts(edges.toDF("a", "b"))
      .as[(Int, Long)].collect().toMap
    assert(out === oracle)
  }

  test("neighborJaccard: shared-neighbor ratio, zero-overlap pairs absent") {
    val m = Seq(
      ("x", 1), ("x", 2), ("x", 3),
      ("y", 2), ("y", 3), ("y", 4),
      ("z", 9) // no overlap with anyone
    ).toDF("node", "nb")
    val out = GraphAlgos.neighborJaccard(m, "node", "nb")
      .select("a", "b", "shared", "jaccard")
      .as[(String, String, Long, Double)].collect().toSet
    // |x∩y|=2, |x∪y|=4
    assert(out === Set(("x", "y", 2L, 0.5)))
  }

  test("degrees: out/in/total per node, one-sided nodes included") {
    val e = Seq(("a", "b"), ("a", "c"), ("b", "c"), ("a", "b") /* dup collapses */)
      .toDF("src", "dst")
    val out = GraphAlgos.degrees(e)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(out === Map(
      "a" -> (2L, 0L, 2L), "b" -> (1L, 1L, 2L), "c" -> (0L, 2L, 2L)))
  }

  test("pageRank matches a sequential double-precision reference loop") {
    val es = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"), ("d", "a"))
    val iters = 5; val d = 0.85
    // sequential reference, same teleport-only mass model
    val ns = es.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val outd = es.groupBy(_._1).map { case (k, v) => k -> v.size.toDouble }
    var r = ns.map(_ -> 1.0 / ns.size).toMap
    for (_ <- 1 to iters) {
      val c = es.groupBy(_._2).map { case (dst, in) =>
        dst -> in.map(e => r(e._1) / outd(e._1)).sum
      }
      r = ns.map(n => n -> ((1.0 - d) / ns.size + d * c.getOrElse(n, 0.0))).toMap
    }
    val got = GraphAlgos.pageRank(es.toDF("src", "dst"), iters, d)
      .as[(String, Double)].collect().toMap
    assert(got.keySet === r.keySet)
    got.foreach { case (n, v) => assert(math.abs(v - r(n)) < 1e-12, s"$n: $v vs ${r(n)}") }
    // sink of the cycle ('c' has in-edges from both a and b) outranks the
    // pure source 'd'
    assert(got("c") > got("d"))
  }

  test("pageRankPersonalized matches a sequential restart-walk reference") {
    val es = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"), ("d", "a"))
    val iters = 5; val d = 0.85
    val seeds = Seq("a")
    val ns = es.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val outd = es.groupBy(_._1).map { case (k, v) => k -> v.size.toDouble }
    val t = ns.map(n => n -> (if (seeds.contains(n)) 1.0 / seeds.size else 0.0)).toMap
    var r = t
    for (_ <- 1 to iters) {
      val c = es.groupBy(_._2).map { case (dst, in) =>
        dst -> in.map(e => r(e._1) / outd(e._1)).sum
      }
      r = ns.map(n => n -> ((1.0 - d) * t(n) + d * c.getOrElse(n, 0.0))).toMap
    }
    val got = GraphAlgos.pageRankPersonalized(
        es.toDF("src", "dst"), seeds.toDF("node"), iters, d)
      .as[(String, Double)].collect().toMap
    assert(got.keySet === r.keySet)
    got.foreach { case (n, v) => assert(math.abs(v - r(n)) < 1e-12, s"$n: $v vs ${r(n)}") }
    // restart mass concentrates near the seed: its direct successors
    // outrank the node pointing INTO the seed from outside the walk
    assert(got("b") > got("d") && got("c") > got("d"))
    // the detached component of a different graph gets zero mass: seed 'a'
    // in the path+detached fixture reaches 9/10 never
    val det = GraphAlgos.pageRankPersonalized(
        edges.select(col("src").cast("string").as("src"), col("dst").cast("string").as("dst")),
        Seq("1").toDF("node"), 3, d)
      .as[(String, Double)].collect().toMap
    assert(det("9") == 0.0 && det("10") == 0.0)
    assert(det("2") > 0.0 && det("4") > 0.0)
  }

  test("pageRankWeighted matches a sequential weighted reference; uniform weights = pageRank") {
    val es = Seq(("a", "b", 3.0), ("b", "c", 1.0), ("c", "a", 2.0), ("a", "c", 1.0), ("d", "a", 5.0))
    val iters = 4; val d = 0.85
    val ns = es.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val sw = es.groupBy(_._1).map { case (k, v) => k -> v.map(_._3).sum }
    var r = ns.map(_ -> 1.0 / ns.size).toMap
    for (_ <- 1 to iters) {
      val c = es.groupBy(_._2).map { case (dst, in) =>
        dst -> in.map(e => r(e._1) * e._3 / sw(e._1)).sum
      }
      r = ns.map(n => n -> ((1.0 - d) / ns.size + d * c.getOrElse(n, 0.0))).toMap
    }
    val got = GraphAlgos.pageRankWeighted(es.toDF("src", "dst", "weight"), iters, d)
      .as[(String, Double)].collect().toMap
    assert(got.keySet === r.keySet)
    got.foreach { case (n, v) => assert(math.abs(v - r(n)) < 1e-12, s"$n: $v vs ${r(n)}") }
    // uniform weights reduce to the unweighted operator exactly
    val uni = es.map(e => (e._1, e._2, 1.0))
    val gotU = GraphAlgos.pageRankWeighted(uni.toDF("src", "dst", "weight"), iters, d)
      .as[(String, Double)].collect().toMap
    val base = GraphAlgos.pageRank(uni.map(e => (e._1, e._2)).toDF("src", "dst"), iters, d)
      .as[(String, Double)].collect().toMap
    gotU.foreach { case (n, v) => assert(math.abs(v - base(n)) < 1e-12) }
  }

  test("hits matches a sequential reference; hubs/authorities land where expected") {
    // a,b,c all point at z (authority); a also points at y; w isolated-ish
    val es = Seq(("a", "z"), ("b", "z"), ("c", "z"), ("a", "y"), ("w", "y"))
    val iters = 3
    val ns = es.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    var h = ns.map(_ -> 1.0).toMap
    var a = Map.empty[String, Double]
    for (_ <- 1 to iters) {
      val ar = ns.map(n => n -> es.filter(_._2 == n).map(e => h(e._1)).sum).toMap
      val as = ar.values.sum
      a = ar.map { case (k, v) => k -> v / as }
      val hr = ns.map(n => n -> es.filter(_._1 == n).map(e => a(e._2)).sum).toMap
      val hs = hr.values.sum
      h = hr.map { case (k, v) => k -> v / hs }
    }
    val got = GraphAlgos.hits(es.toDF("src", "dst"), iters)
      .as[(String, Double, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got.keySet === ns.toSet)
    got.foreach { case (n, (hub, auth)) =>
      assert(math.abs(hub - h(n)) < 1e-12, s"$n hub: $hub vs ${h(n)}")
      assert(math.abs(auth - a(n)) < 1e-12, s"$n auth: $auth vs ${a(n)}")
    }
    // z is the dominant authority; a the dominant hub (points at both)
    assert(got("z")._2 > got("y")._2 && got("z")._2 > got("a")._2)
    assert(got("a")._1 > got("b")._1 && got("a")._1 > got("w")._1)
  }

  test("labelPropagation: two cliques with a bridge settle into two communities") {
    // clique A {1,2,3,4}, clique B {11,12,13,14}, bridge 4-11
    val cliqueEdges = (for {
      g <- Seq(Seq(1L, 2L, 3L, 4L), Seq(11L, 12L, 13L, 14L))
      i <- g; j <- g if i < j
    } yield (i, j)) :+ ((4L, 11L))
    val e = cliqueEdges.toDF("a", "b")
    val out = GraphAlgos.labelPropagation(e, iters = 2)
      .as[(Long, Long)].collect().toMap
    assert(out.size == 8)
    assert(Seq(1L, 2L, 3L, 4L).forall(out(_) == 1L), out.toString)
    assert(Seq(11L, 12L, 13L, 14L).forall(out(_) == 11L), out.toString)
    // iters = 0 → every node keeps its own label
    val self = GraphAlgos.labelPropagation(e, iters = 0)
      .as[(Long, Long)].collect().toMap
    assert(self.forall { case (n, l) => n == l })
    // synchronous determinism: a rerun produces the identical labeling
    val rerun = GraphAlgos.labelPropagation(e, iters = 2)
      .as[(Long, Long)].collect().toMap
    assert(rerun == out)
  }

  test("kCore peels to the unique maximal k-core (brute-force reference)") {
    // K4 {a,b,c,d} + a tail c-e, e-f: 3-core = K4 exactly; 2-core = K4 too
    // (e has degree 2 only until f peels, then e peels)
    val k4 = for (Seq(x, y) <- Seq("a", "b", "c", "d").combinations(2).toSeq) yield (x, y)
    val es = (k4 ++ Seq(("c", "e"), ("e", "f"))).toDF("a", "b")
    def peelRef(edges: Seq[(String, String)], k: Int): Set[String] = {
      var live = edges
      var done = false
      while (!done) {
        val deg = live.flatMap(e => Seq(e._1, e._2)).groupBy(identity).map { case (n, v) => n -> v.size }
        val keep = deg.filter(_._2 >= k).keySet
        val next = live.filter(e => keep(e._1) && keep(e._2))
        done = next.size == live.size
        live = next
      }
      live.flatMap(e => Seq(e._1, e._2)).toSet
    }
    val allEdges = k4 ++ Seq(("c", "e"), ("e", "f"))
    for (k <- 1 to 4) {
      val got = GraphAlgos.kCore(es, k).select("node").as[String].collect().toSet
      assert(got === peelRef(allEdges, k), s"k=$k")
    }
    // core_deg is the within-core degree: in the 3-core (= K4) every node has 3
    val degs = GraphAlgos.kCore(es, 3).as[(String, Long)].collect().toMap
    assert(degs.values.forall(_ == 3L), degs.toString)
    // k beyond the densest core → empty
    assert(GraphAlgos.kCore(es, 4).count() === 0)
  }

  test("sssp: cheapest path wins over fewest hops, rounds bound path length") {
    // 1→2→3 costs 1+1=2; direct 1→3 costs 5; 3→4 extends the cheap path
    val we = Seq(
      ("1", "2", 1L), ("2", "3", 1L), ("1", "3", 5L), ("3", "4", 1L),
      ("9", "10", 7L),                  // unreachable from 1
      ("1", "2", 9L)                    // parallel edge: cheapest copy wins
    ).toDF("src", "dst", "weight")
    val out = GraphAlgos.sssp(we, Seq("1").toDF("node"), iters = 3)
      .as[(String, Long)].collect().toMap
    assert(out === Map("1" -> 0L, "2" -> 1L, "3" -> 2L, "4" -> 3L))
    // 2 rounds cannot yet use the 3-edge path: dist(4) = via 1→3→4 = 6
    val two = GraphAlgos.sssp(we, Seq("1").toDF("node"), iters = 2)
      .as[(String, Long)].collect().toMap
    assert(two("4") === 6L && two("3") === 2L)
    // 0 rounds = sources only at distance 0
    val zero = GraphAlgos.sssp(we, Seq("1").toDF("node"), iters = 0)
      .as[(String, Long)].collect().toMap
    assert(zero === Map("1" -> 0L))
  }

  test("fuzzyPairs: prefix-blocked Levenshtein matches, duplicates collapsed") {
    val df = Seq("widget", "widgit", "widget", "gadget", "wzzzzz", "gizmo")
      .toDF("name")
    val out = Canonicalize.fuzzyPairs(df, "name", maxDist = 2)
      .as[(String, String, Int)].collect().toSet
    // widget~widgit dist 1 share block 'w'; gadget/widget differ by block;
    // wzzzzz is 5 edits from widget; gizmo/gadget share 'g' but dist 5
    assert(out === Set(("widget", "widgit", 1)))
    // widening the distance keeps blocking: cross-block pairs never form
    val wide = Canonicalize.fuzzyPairs(df, "name", maxDist = 5)
      .as[(String, String, Int)].collect().toSet
    assert(wide === Set(("widget", "widgit", 1), ("widgit", "wzzzzz", 5),
      ("widget", "wzzzzz", 5), ("gadget", "gizmo", 5)))
  }

  test("landmarkDistances + harmonicCentrality: per-landmark hops, Σ 1/hops") {
    // path 1→2→3→4→5, shortcut 1→4, detached 9→10
    val lms = Seq("1", "3", "9").toDF("node")
    val d = GraphAlgos.landmarkDistances(edges, lms, maxHops = 2)
      .as[(String, String, Int)].collect().toSet
    assert(d === Set(
      ("1", "1", 0), ("1", "2", 1), ("1", "4", 1), ("1", "3", 2), ("1", "5", 2),
      ("3", "3", 0), ("3", "4", 1), ("3", "5", 2),
      ("9", "9", 0), ("9", "10", 1)))
    val h = GraphAlgos.harmonicCentrality(edges, lms, maxHops = 2)
      .as[(String, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(h(("4")) === ((2L, 2.0)))        // hops 1 from both lm 1 and lm 3
    assert(h(("5")) === ((2L, 1.0)))        // 0.5 + 0.5
    assert(h(("2")) === ((1L, 1.0)) && h(("10")) === ((1L, 1.0)))
    assert(h(("3")) === ((1L, 0.5)))        // reached only from lm 1 at hops 2
    assert(!h.contains("1") && !h.contains("9")) // self rows (hops 0) excluded
  }

  test("adamicAdar: 1/ln(deg) shared-neighbor sums, hub gate drops big neighborhoods") {
    val m = Seq(
      ("n1", "a"), ("n1", "b"), ("n1", "c"), // deg(n1)=3
      ("n2", "a"), ("n2", "b"),              // deg(n2)=2
      ("n3", "c")                            // deg 1: forms no pairs
    ).toDF("nb", "e")
    val out = GraphAlgos.adamicAdar(m, nodeCol = "e", neighborCol = "nb")
      .as[(String, String, Long, Double)].collect()
      .map { case (a, b, c, s) => ((a, b), (c, s)) }.toMap
    val w3 = 1.0 / math.log(3.0); val w2 = 1.0 / math.log(2.0)
    assert(out.keySet === Set(("a", "b"), ("a", "c"), ("b", "c")))
    assert(out(("a", "b"))._1 === 2L)
    assert(math.abs(out(("a", "b"))._2 - (w3 + w2)) < 1e-12)
    assert(out(("a", "c"))._1 === 1L && math.abs(out(("a", "c"))._2 - w3) < 1e-12)
    // maxNeighborhood = 2 drops n1 entirely: only (a,b) via n2 remains
    val gated = GraphAlgos.adamicAdar(m, "e", "nb", maxNeighborhood = 2)
      .as[(String, String, Long, Double)].collect()
    assert(gated.toSeq === Seq(("a", "b", 1L, w2)))
  }

  test("minProps/maxProps merge rules accumulate a validity interval across merges") {
    val spec = NodeSpec(Seq("T"), Seq("k"),
      minProps = Seq("lo"), maxProps = Seq("hi"))
    val b1 = Seq(("a", 5, 5), ("a", 3, 3), ("b", 7, 7)).toDF("k", "lo", "hi")
    val b2 = Seq(("a", 9, 9), ("b", 1, 1), ("c", 4, 4)).toDF("k", "lo", "hi")
    val out = NodeSetOps.merge(Some(NodeSetOps.merge(None, b1, spec)), b2, spec)
      .select("k", "lo", "hi").as[(String, Int, Int)].collect()
      .map { case (k, l, h) => k -> (l, h) }.toMap
    assert(out === Map("a" -> (3, 9), "b" -> (1, 7), "c" -> (4, 4)))
  }

  // run scc through BOTH code paths — full distributed refinement
  // (localThreshold = 0) and the driver-side Tarjan cutover (default
  // threshold swallows these tiny graphs whole) — and demand identical
  // assignments before returning them
  private def sccBoth(es: org.apache.spark.sql.DataFrame): Map[Any, Any] = {
    val dist = GraphAlgos.scc(es, localThreshold = 0L)
      .collect().map(r => r.get(0) -> r.get(1)).toMap
    val local = GraphAlgos.scc(es)
      .collect().map(r => r.get(0) -> r.get(1)).toMap
    assert(dist === local, "distributed refinement and Tarjan cutover disagree")
    dist
  }

  test("scc: cycles, tails, and bridges resolve to min-node component ids") {
    // 1→2→3→1 (SCC {1,2,3}), 3→4 bridge, 5⇄6 (SCC {5,6}), 4→5,
    // singleton 4; detached 2-cycle 8⇄9 with tail 7→8
    val es = Seq(
      (1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 6), (6, 5), (7, 8), (8, 9), (9, 8)
    ).toDF("src", "dst")
    assert(sccBoth(es) === Map(1 -> 1, 2 -> 1, 3 -> 1, 4 -> 4, 5 -> 5, 6 -> 5,
      7 -> 7, 8 -> 8, 9 -> 8))
  }

  test("scc: pure DAG is all singletons (the path-graph worst case of FW-BW)") {
    val es = Seq((1, 2), (2, 3), (3, 4), (4, 5), (1, 4)).toDF("src", "dst")
    assert(sccBoth(es) === Map(1 -> 1, 2 -> 2, 3 -> 3, 4 -> 4, 5 -> 5))
  }

  test("scc: one giant cycle, self-loops ignored, empty input") {
    val ring = (1 to 12).map(i => (i, i % 12 + 1)) :+ ((3, 3))
    assert(sccBoth(ring.toDF("src", "dst")) === (1 to 12).map(i => i -> 1).toMap)
    assert(GraphAlgos.scc(Seq.empty[(Int, Int)].toDF("src", "dst")).count() === 0)
    // only-self-loop input: no non-loop edges → no incident nodes
    assert(GraphAlgos.scc(Seq((4, 4)).toDF("src", "dst")).count() === 0)
  }

  test("scc: string node ids and a two-SCC condensation chain") {
    val es = Seq(("a", "b"), ("b", "a"), ("b", "c"), ("c", "d"), ("d", "c"))
      .toDF("src", "dst")
    assert(sccBoth(es) === Map("a" -> "a", "b" -> "a", "c" -> "c", "d" -> "c"))
  }

  test("condensationLevels: SCCs collapse to a DAG layered by longest path") {
    // ring {1,2,3} → 4 → ring {5,6}; separate 7 → ring {8,9}
    val es = Seq(
      (1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 6), (6, 5), (7, 8), (8, 9), (9, 8)
    ).toDF("src", "dst")
    val out = GraphAlgos.condensationLevels(es)
      .as[(Int, Int, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out === Map(
      1 -> ((0, 3L)), 4 -> ((1, 1L)), 5 -> ((2, 2L)),
      7 -> ((0, 1L)), 8 -> ((1, 2L))))
  }

  test("randomWalks: every hop follows an edge, sinks stop, runs reproduce") {
    // ring 1→2→3→1 with branch 2→4 (4 is a sink), detached 9→10
    val es = Seq((1, 2), (2, 3), (3, 1), (2, 4), (9, 10)).toDF("src", "dst")
    val eset = es.collect().map(r => (r.getInt(0).toLong, r.getInt(1).toLong)).toSet
    val out = GraphAlgos.randomWalks(es, walkLen = 3, seed = 42)
      .as[(Long, Int, Long)].collect()
    val byWalk = out.groupBy(_._1).map { case (s, rows) =>
      s -> rows.sortBy(_._2).map(_._3).toSeq
    }
    // step 0 is the start node, one walk per incident node
    assert(byWalk.keySet === Set(1L, 2L, 3L, 4L, 9L, 10L))
    byWalk.foreach { case (s, seq) => assert(seq.head === s) }
    // every consecutive hop is a real edge
    byWalk.values.foreach(seq =>
      seq.sliding(2).filter(_.size == 2).foreach(p => assert(eset((p(0), p(1))))))
    // sinks terminate immediately; a walk only falls short of walkLen+1
    // entries by dying at the sink (node 4)
    assert(byWalk(4L) === Seq(4L))
    assert(byWalk(10L) === Seq(10L))
    assert(byWalk(3L).length === 4) // 3→1→2→{3|4}: can't die before step 3
    Seq(1L, 2L, 3L).foreach { s =>
      val seq = byWalk(s)
      assert(seq.length === 4 || seq.last === 4L,
        s"walk from $s stopped early without hitting the sink: $seq")
    }
    // bit-reproducible: same seed → same walks; different seed may differ
    val again = GraphAlgos.randomWalks(es, walkLen = 3, seed = 42)
      .as[(Long, Int, Long)].collect().toSet
    assert(again === out.toSet)
  }

  test("biasedWalks matches an independent in-memory node2vec reference") {
    import spark.implicits._
    val edgeList = Seq((1L, 2L), (2L, 1L), (2L, 3L), (2L, 4L), (1L, 3L),
      (3L, 2L), (4L, 1L), (3L, 4L))
    val es = edgeList.toDF("src", "dst")
    val (wR, wC, wF) = (1L, 4L, 2L)
    val seed = 11L
    val out = GraphAlgos.biasedWalks(es, walkLen = 3, seed = seed,
        wReturn = wR.toInt, wCommon = wC.toInt, wFar = wF.toInt)
      .as[(Long, Int, Long)].collect().toSet

    // independent reference: sorted adjacency, uniform step 1, weighted
    // cumulative pick for steps 2..3 — same portable hash, written from
    // the CONTRACT (not the Spark code)
    def buck(id: Long, s: Long): Long =
      (((id + s) % 1000003L * 2654435761L + s) % 1000000L +
        ((id + s) % 999983L * 2246822518L) % 1000000L) % 1000000L
    val adj = edgeList.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val nodes = edgeList.flatMap(e => Seq(e._1, e._2)).distinct
    val ref = scala.collection.mutable.Set.empty[(Long, Int, Long)]
    for (s0 <- nodes) {
      ref += ((s0, 0, s0))
      adj.get(s0).foreach { n1s =>
        val pick1 = ((buck(s0, seed + 1) + buck(s0, seed + 1001)) % 1000000L
          % n1s.length).toInt
        var prev = s0
        var node = n1s(pick1)
        ref += ((s0, 1, node))
        var k = 2
        var alive = true
        while (k <= 3 && alive) {
          adj.get(node) match {
            case None => alive = false
            case Some(vs) =>
              val wts = vs.map { v =>
                if (v == prev) wR
                else if (adj.get(prev).exists(_.contains(v))) wC
                else wF
              }
              val tot = wts.sum
              val pick = (buck(s0, seed + k) + buck(node, seed + 1000 + k)) %
                1000000L % tot
              var cum = 0L; var chosen = -1
              for (i <- vs.indices if chosen < 0) {
                cum += wts(i); if (pick < cum) chosen = i
              }
              prev = node; node = vs(chosen)
              ref += ((s0, k, node))
          }
          k += 1
        }
      }
    }
    assert(out === ref.toSet)
  }
}
