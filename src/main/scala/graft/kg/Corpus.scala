package graft.kg

import graft.schema.TranscriptTurn

/** Deterministic synthetic transcript corpus + the extraction RULE SPEC.
  *
  * The reference (graphio) is a load/query frontend — it defines MERGE
  * semantics, not NLP. The triple-extraction rules below are therefore OUR
  * spec (SURVEY §7.2): a fixed mention grammar + predicate phrase list. The
  * "reference semantics" for the P/R gate is the sequential scalar
  * implementation in [[SequentialOracle]]; the distributed pipeline in
  * [[Pipeline]] must reproduce its (subj, pred, obj) set at P/R >= 0.95.
  *
  * Everything here is a pure function of the row id, so the corpus is
  * generated identically by a Spark job and by a single-threaded loop —
  * no external data, no RNG state.
  */
object Corpus {

  val persons: Vector[String] =
    Vector("Alice", "Bob", "Carol", "Dave", "Erin", "Frank", "Grace", "Heidi", "Ivan", "Judy")

  val orgBases: Vector[String] =
    Vector("Acme", "Globex", "Initech", "Umbrella", "Hooli", "Vehement", "Massive", "Octan")

  /** Surface variants of an org entity: bare, suffixed, and a typo (last
    * char doubled). All must canonicalize to lower(base).
    */
  def orgVariants(base: String): Vector[String] =
    Vector(base, s"$base Corp", s"$base Corporation", s"$base Inc", base + base.last)

  val tools: Vector[String] =
    Vector("spark", "duckdb", "flink", "trino", "kafka", "presto", "hive", "beam")

  /** (phrase, canonical predicate, subj kind, obj kind); kinds: P/O/T. */
  val predicates: Vector[(String, String, Char, Char)] = Vector(
    ("works at", "works_at", 'P', 'O'),
    ("joined", "member_of", 'P', 'O'),
    ("uses", "uses", 'P', 'T'),
    ("reports to", "reports_to", 'P', 'P'),
    ("met with", "met_with", 'P', 'P'),
    ("acquired", "acquired", 'O', 'O'),
    ("partnered with", "partner_of", 'O', 'O'),
    ("deployed", "deployed", 'O', 'T')
  )

  val fillers: Vector[String] = Vector(
    "ok let me check the logs",
    "that run finished clean",
    "can you look into this",
    "the numbers came back mixed",
    "we should sync on the rollout",
    "nothing unusual in the output",
    "let me pull the latest snapshot",
    "still waiting on the review"
  )

  // ---- mention grammar (the rule spec) ----

  /** Capitalized name, optionally with a corporate suffix; longest
    * alternative first so backtracking isn't needed for the final capture.
    * Possessive quantifiers (`++`/`*+`): the name tokens can never give
    * characters back to the rest of the pattern here (the next element is
    * always a space), so possessive matching is semantics-preserving and
    * lets failed attempts at non-triple capitalized words (sentence starts,
    * lone names) fail immediately instead of backtracking through the
    * token. This regex runs once per text in the dominant extraction stage.
    */
  val EntPattern: String =
    "(?:[A-Z][a-z]++[a-zA-Z]*+(?: (?:Corporation|Corp|Inc))?|" + tools.mkString("|") + ")"

  val PredPattern: String =
    "(?:" + predicates.map(_._1).sortBy(-_.length).mkString("|") + ")"

  /** One triple statement: entity, predicate phrase, entity — single spaces,
    * cannot cross a sentence boundary ('.' not matchable inside).
    */
  val TripleRegex: String = s"($EntPattern) ($PredPattern) ($EntPattern)"

  /** Corporate suffix tokens dropped by surface normalization. */
  val SuffixTokens: Set[String] = Set("corp", "corporation", "inc")

  /** Normalize a mention surface to its clustering key: lowercase, drop
    * corporate-suffix tokens, collapse spaces.
    */
  def normalizeSurface(s: String): String =
    s.toLowerCase.split(' ').filterNot(SuffixTokens.contains).mkString(" ").trim

  /** Canonical entity name for a cluster = lexicographic min of the
    * normalized surfaces in its connected component.
    */

  // ---- deterministic generation ----

  /** splitmix64 — stable, public-domain bit mixer. */
  def mix(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }
  private def pick(r: Long, n: Int): Int = (((r >>> 1) % n).toInt + n) % n

  val TurnsPerConv = 20
  val HotShareNum = 3 // 30% of turns land in one hot conversation
  val HotShareDen = 10
  val TsBase = 1700000000L // 2023-11-14T22:13:20Z

  /** One generated fact: surfaces as written + the canonical expected triple. */
  final case class Fact(subjSurface: String, phrase: String, objSurface: String,
                        subj: String, pred: String, obj: String)

  def factAt(r: Long): Fact = {
    val (phrase, pred, sk, ok) = predicates(pick(r, predicates.length))
    def ent(kind: Char, rr: Long): (String, String) = kind match {
      case 'P' => val p = persons(pick(rr, persons.length)); (p, p.toLowerCase)
      case 'T' => val t = tools(pick(rr, tools.length)); (t, t)
      case 'O' =>
        val base = orgBases(pick(rr, orgBases.length))
        val variant = orgVariants(base)(pick(rr >>> 16, 5))
        (variant, base.toLowerCase)
    }
    val (ss, sc) = ent(sk, mix(r + 101))
    val (os, oc) = ent(ok, mix(r + 202))
    Fact(ss, phrase, os, sc, pred, oc)
  }

  /** Expected facts for a turn (0..2 facts, deterministic). */
  def factsAt(id: Long): Seq[Fact] = {
    val n = pick(mix(id * 31 + 7), 3)
    (0 until n).map(f => factAt(mix(id * 7919 + f * 131 + 17)))
  }

  /** The full turn row — the single source of truth shared by the Spark
    * generator and the sequential oracle.
    */
  def turnAt(id: Long, nTurns: Long): TranscriptTurn = {
    val hot = nTurns * HotShareNum / HotShareDen
    val (convIdx, convId, turnIdx) =
      if (id < hot) (-1L, "conv-hot", id.toInt)
      else {
        val rest = id - hot
        val c = rest / TurnsPerConv
        (c, f"conv-${c}%06d", (rest % TurnsPerConv).toInt)
      }
    val role = (turnIdx % 3) match {
      case 0 => "user"
      case 1 => "assistant"
      case _ => "tool"
    }
    val tool = if (role == "tool") tools(pick(mix(id * 3 + 1), tools.length)) else null
    val facts = factsAt(id)
    val filler = fillers(pick(mix(id * 13 + 5), fillers.length))
    val text = (filler +: facts.map(f => s"${f.subjSurface} ${f.phrase} ${f.objSurface}"))
      .mkString("", ". ", ".")
    val tsSec = TsBase + (convIdx + 2) * 1000L + turnIdx
    TranscriptTurn(convId, turnIdx, role, text, tool,
      new java.sql.Timestamp(tsSec * 1000L))
  }

  /** Ground-truth canonical triple set for a corpus of n turns (from the
    * generator's own parameters — the spec-level truth).
    */
  def expectedTriples(nTurns: Long): Set[(String, String, String)] =
    (0L until nTurns).flatMap(id => factsAt(id).map(f => (f.subj, f.pred, f.obj))).toSet
}
