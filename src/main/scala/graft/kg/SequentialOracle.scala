package graft.kg

import scala.collection.mutable

/** The "reference" implementation of the triple-extraction rule spec: a
  * single-threaded, Spark-free Scala program. The distributed pipeline is
  * graded against this oracle's (subj, pred, obj) set (P/R >= 0.95,
  * BASELINE.json). Exact everywhere the pipeline is approximate:
  * all-pairs Jaccard instead of MinHash-LSH, union-find instead of
  * iterative DataFrame CC.
  */
object SequentialOracle {
  private val tripleRe = Corpus.TripleRegex.r
  private val predCanon: Map[String, String] =
    Corpus.predicates.map(p => p._1 -> p._2).toMap

  final case class RawTriple(subjSurface: String, pred: String, objSurface: String,
                             convId: String, turnIdx: Int)

  def extract(text: String, convId: String, turnIdx: Int): Seq[RawTriple] =
    tripleRe.findAllMatchIn(text).map { m =>
      RawTriple(m.group(1), predCanon(m.group(2)), m.group(3), convId, turnIdx)
    }.toSeq

  def charTrigrams(s: String): Set[String] =
    if (s.length < 3) Set(s) else s.sliding(3).toSet

  def jaccard(a: Set[String], b: Set[String]): Double =
    if (a.isEmpty && b.isEmpty) 1.0
    else a.intersect(b).size.toDouble / a.union(b).size

  /** Exact clustering: all-pairs Jaccard >= threshold on char-3-grams of the
    * normalized surfaces, union-find, canonical = lexicographic min.
    */
  def canonicalMap(surfaces: Set[String], threshold: Double = Pipeline.JaccardThreshold): Map[String, String] = {
    val norms = surfaces.map(Corpus.normalizeSurface).toVector.sorted
    val parent = mutable.Map(norms.map(n => n -> n): _*)
    def find(x: String): String = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val nxt = parent(c); parent(c) = r; c = nxt }
      r
    }
    def union(a: String, b: String): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    val grams = norms.map(n => n -> charTrigrams(n)).toMap
    for (i <- norms.indices; j <- (i + 1) until norms.length)
      if (jaccard(grams(norms(i)), grams(norms(j))) >= threshold)
        union(norms(i), norms(j))
    surfaces.map { s =>
      val n = Corpus.normalizeSurface(s)
      s -> find(n) // union-by-min ⇒ root IS the lexicographic min
    }.toMap
  }

  /** Entity-link confidence: exact trigram Jaccard between the normalized
    * surface and its canonical name (1.0 for exact matches).
    */
  def linkScore(surface: String, canonical: String): Double = {
    val n = Corpus.normalizeSurface(surface)
    if (n == canonical) 1.0 else jaccard(charTrigrams(n), charTrigrams(canonical))
  }

  /** Scored canonical triples: score = subj link confidence × obj link
    * confidence (the pipeline's formula).
    */
  def scoredTriples(turns: Seq[(String, Int, String)]): Set[(String, String, String, Double)] = {
    val raw = turns.flatMap { case (conv, idx, text) => extract(text, conv, idx) }
    val surfaces = raw.flatMap(t => Seq(t.subjSurface, t.objSurface)).toSet
    val canon = canonicalMap(surfaces)
    raw.map { t =>
      val s = canon(t.subjSurface); val o = canon(t.objSurface)
      (s, t.pred, o, linkScore(t.subjSurface, s) * linkScore(t.objSurface, o))
    }.toSet
  }

  /** End-to-end oracle: turns → canonical (subj, pred, obj) set. */
  def triples(turns: Seq[(String, Int, String)]): Set[(String, String, String)] = {
    val raw = turns.flatMap { case (conv, idx, text) => extract(text, conv, idx) }
    val surfaces = raw.flatMap(t => Seq(t.subjSurface, t.objSurface)).toSet
    val canon = canonicalMap(surfaces)
    raw.map(t => (canon(t.subjSurface), t.pred, canon(t.objSurface))).toSet
  }

  /** Oracle over the generated corpus of n turns. */
  def triplesForCorpus(nTurns: Long): Set[(String, String, String)] = {
    val turns = (0L until nTurns).map { id =>
      val t = Corpus.turnAt(id, nTurns)
      (t.conv_id, t.turn_idx, t.text)
    }
    triples(turns)
  }

  final case class PR(precision: Double, recall: Double, truePos: Long, falsePos: Long, falseNeg: Long)

  def prScore(got: Set[(String, String, String)], truth: Set[(String, String, String)]): PR = {
    val tp = got.intersect(truth).size.toLong
    val fp = (got -- truth).size.toLong
    val fn = (truth -- got).size.toLong
    PR(
      if (tp + fp == 0) 1.0 else tp.toDouble / (tp + fp),
      if (tp + fn == 0) 1.0 else tp.toDouble / (tp + fn),
      tp, fp, fn)
  }
}
