package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  // deterministic toy vectors: unit-ish 4-d
  val vecs = Seq(
    (0L, Seq(1.0, 0.0, 0.0, 0.0)),
    (1L, Seq(0.9, 0.1, 0.0, 0.0)),   // close to 0
    (2L, Seq(0.0, 1.0, 0.0, 0.0)),
    (3L, Seq(0.0, 0.95, 0.05, 0.0)), // close to 2
    (4L, Seq(-1.0, 0.0, 0.0, 0.0)),  // opposite of 0
    (5L, Seq(0.5, 0.5, 0.5, 0.5))
  ).toDF("vec_id", "embedding")

  test("brute-force top-k ranks the nearest vector first") {
    val out = Similarity.bruteForceTopK(vecs, vecs.filter($"vec_id" === 0), 2)
      .collect().sortBy(_.getInt(2))
    assert(out(0).getLong(1) == 1L) // rank 1 neighbor of 0 is 1
    assert(out(0).getDouble(3) > 0.99)
  }

  test("cosine column math matches scalar computation") {
    val c = vecs.filter($"vec_id" === 0).alias("a")
      .crossJoin(vecs.filter($"vec_id" === 5).alias("b"))
      .select(Similarity.cosine(col("a.embedding"), col("b.embedding")).as("cos"))
      .head().getDouble(0)
    assert(math.abs(c - 0.5) < 1e-12)
  }

  test("sign-LSH pair mining finds the close pairs with exact verification") {
    val pairs = Similarity.cosinePairsLsh(vecs, 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val keys = pairs.map(p => (p._1, p._2)).toSet
    assert(keys.contains((0L, 1L)))
    assert(keys.contains((2L, 3L)))
    assert(!keys.contains((0L, 4L))) // opposite vectors: cos -1
    pairs.foreach(p => assert(p._3 >= 0.9))
  }

  test("IVF top-k finds the true neighbor when it shares the probed cell") {
    val (cents, assigned) = Similarity.ivfAssign(vecs, 3)
    assert(cents.count() == 3)
    assert(assigned.select("cell").distinct().count() <= 3)
    val out = Similarity.ivfTopK(vecs, vecs.filter($"vec_id" === 0), 1, 3, 3)
      .collect()
    assert(out.length == 1 && out(0).getLong(1) == 1L) // nProbe=all cells ⇒ exact
  }
}
