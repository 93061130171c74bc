package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("token counts: whitespace and BPE-ish") {
    val df = Seq((1L, "Hello world, 42 foo-bar")).toDF("id", "text")
      .select(TextOps.tokenCountWs(col("text")).as("ws"),
        TextOps.tokenCountBpe(col("text")).as("bpe"))
    val r = df.head()
    assert(r.getInt(0) == 4)
    // lower: "hello world, 42 foo-bar" → [hello][world][,][42][foo][-][bar] = 7
    assert(r.getInt(1) == 7)
  }

  test("language id picks the language with most marker hits") {
    val df = Seq(
      (1L, "the cat and the dog of the house is that"),
      (2L, "el perro y la casa de los gatos del barrio que"),
      (3L, "le chat et les maisons des chiens est un"),
      (4L, "der hund und die katze ist von den haus ein")
    ).toDF("id", "text")
    val out = df.select(col("id"), TextOps.langId(col("text")).as("lang"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "en", 2L -> "es", 3L -> "fr", 4L -> "de"))
  }

  test("quality score: clean prose beats repetitive junk") {
    val df = Seq(
      (1L, "a sensible sentence with varied vocabulary and reasonable structure for scoring"),
      (2L, "spam spam spam spam spam spam spam spam spam spam spam spam")
    ).toDF("id", "text")
    val q = df.select(col("id"), TextOps.qualityScore(col("text")).as("q"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(q(1L) > q(2L))
  }

  test("fingerprint is order-sensitive and deterministic") {
    val df = Seq(
      (1L, "alpha beta gamma"), (2L, "alpha beta gamma"), (3L, "gamma beta alpha")
    ).toDF("id", "text")
    val fp = df.select(col("id"), TextOps.fingerprint(col("text")).as("f"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) == fp(2L))
    assert(fp(1L) != fp(3L))
  }

  test("annotate adds all metric columns") {
    val out = TextOps.annotate(Seq((1L, "some text here")).toDF("doc_id", "text"))
    assert(Set("n_tokens_ws", "n_tokens_bpe", "lang_pred", "quality", "fingerprint")
      .subsetOf(out.columns.toSet))
  }

  test("duplicate-bigram fraction counts repeated n-grams with multiplicity") {
    val df = Seq(
      (1L, "a b a b a b"),      // bigrams: ab ba ab ba ab → 5 total, 2 distinct
      (2L, "all words differ here now"), // 4 distinct of 4
      (3L, "single")            // < n tokens → 0.0
    ).toDF("id", "text")
    val d = df.select(col("id"), TextOps.dupNgramFraction(col("text"), 2).as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(d(1L) - 0.6) < 1e-9, d.toString)
    assert(d(2L) == 0.0)
    assert(d(3L) == 0.0)
  }

  test("top-token fraction finds the dominant token share") {
    val df = Seq((1L, "spam spam spam eggs"), (2L, "a b c d")).toDF("id", "text")
    val f = df.select(col("id"), TextOps.topTokenFraction(col("text")).as("f"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(f(1L) - 0.75) < 1e-9)
    assert(math.abs(f(2L) - 0.25) < 1e-9)
  }

  test("repetition gate rejects boilerplate, passes varied prose") {
    val df = Seq(
      (1L, "click here click here click here click here"),
      (2L, "the quick brown fox jumps over a lazy dog today")
    ).toDF("id", "text")
    val ok = df.select(col("id"), TextOps.repetitionOk(col("text")).as("ok"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(!ok(1L))
    assert(ok(2L))
  }

  test("PII scrub replaces urls, emails, ips, and long digit runs — in order") {
    val df = Seq(
      (1L, "mail me at bob.smith+x@corp.example.org please"),
      (2L, "see https://a.example.com/p?q=1#frag for details"),
      (3L, "server 192.168.1.250 answered"),
      (4L, "card 12345678901 expired, pin 1234 stays"),
      (5L, "login at http://h.io/u?user=a@b.co then mail a@b.co") // email inside URL → URL rule wins
    ).toDF("id", "text")
    val out = df.select(col("id"), TextOps.scrubPii(col("text")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "mail me at <EMAIL> please")
    assert(out(2L) == "see <URL> for details")
    assert(out(3L) == "server <IP> answered")
    assert(out(4L) == "card <NUM> expired, pin 1234 stays")
    assert(out(5L) == "login at <URL> then mail <EMAIL>")
  }

  test("scrub is a zero-shuffle codegen projection") {
    val df = Seq((1L, "x")).toDF("id", "text")
    val plan = df.select(TextOps.scrubPii(col("text")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("chunking windows overlap, cover every token, and skip empty docs") {
    // 10 tokens, maxTokens=4, overlap=2 → stride 2 → starts 0,2,4,6
    // (the window reaching the last token is the final one)
    val docs = Seq(
      (1L, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"),
      (2L, "a b c"),    // shorter than one window → single short chunk
      (3L, "   "),      // whitespace-only → no chunks
      (4L, "solo"),
      (5L, "u0 u1 u2 u3 u4")  // n=5: starts 0,2 → last chunk short
    ).toDF("doc_id", "text")
    val out = TextOps.chunkDocuments(docs, maxTokens = 4, overlap = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getInt(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(out == Seq(
      (1L, 0, "t0 t1 t2 t3", 4), (1L, 1, "t2 t3 t4 t5", 4),
      (1L, 2, "t4 t5 t6 t7", 4), (1L, 3, "t6 t7 t8 t9", 4),
      (2L, 0, "a b c", 3),
      (4L, 0, "solo", 1),
      (5L, 0, "u0 u1 u2 u3", 4), (5L, 1, "u2 u3 u4", 3)))
    // every token of doc 1 appears in some chunk, consecutive chunks share 2
    val c1 = out.filter(_._1 == 1L).map(_._3.split(" ").toSeq)
    c1.sliding(2).foreach { case Seq(a, b) => assert(a.takeRight(2) == b.take(2)) }
  }

  test("chunking is a zero-shuffle projection") {
    val docs = Seq((1L, "a b c d e f")).toDF("doc_id", "text")
    val plan = TextOps.chunkDocuments(docs, 4, 1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("dialogueStats: adjacent same-role pairs under stable turn order") {
    val turns = Seq(
      ("c1", 0, "user"), ("c1", 1, "bot"), ("c1", 2, "user"),
      ("c1", 3, "user"), ("c1", 4, "bot"),  // one u,u adjacency at (2,3)
      ("c2", 0, "user")
    ).toDF("conv_id", "turn_idx", "role")
    val out = TextOps.dialogueStats(turns)
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out("c1") === (("c1", 5L, 2L, 1L)))
    assert(out("c2") === (("c2", 1L, 1L, 0L)))
  }

  test("hashFeatures: portable buckets, counts per (doc, bucket)") {
    def tokHash(t: String): Long =
      t.foldLeft(7L)((a, c) => (a * 131 + c.toLong) % 1000000007L)
    val docs = Seq((1L, "ab ab cd"), (2L, "AB")).toDF("doc_id", "text")
    val out = TextOps.hashFeatures(docs, dim = 64)
      .as[(Long, Int, Long)].collect().toSet
    val bAb = (tokHash("ab") % 64).toInt; val bCd = (tokHash("cd") % 64).toInt
    assert(out === Set((1L, bAb, 2L), (1L, bCd, 1L), (2L, bAb, 1L))) // case-folded
    assert(out.forall { case (_, b, _) => b >= 0 && b < 64 })
  }

  test("assembleContext: previous-k turns rendered in order, short prefixes") {
    val turns = Seq(
      ("c1", 0, "user", "hi"), ("c1", 1, "bot", "hello"),
      ("c1", 2, "user", "how"), ("c1", 3, "bot", "fine"),
      ("c2", 0, "user", "solo")
    ).toDF("conv_id", "turn_idx", "role", "text")
    val out = TextOps.assembleContext(turns, k = 2)
      .select("conv_id", "turn_idx", "context")
      .as[(String, Int, String)].collect()
      .map { case (c, i, ctx) => (c, i) -> ctx }.toMap
    assert(out(("c1", 0)) === "")
    assert(out(("c1", 1)) === "user: hi")
    assert(out(("c1", 2)) === "user: hi\nbot: hello")
    assert(out(("c1", 3)) === "bot: hello\nuser: how") // frame slides past turn 0
    assert(out(("c2", 0)) === "")
  }

  test("winnow matches a brute-force reference and keeps the MOSS guarantee") {
    import spark.implicits._
    val mod = 1000000007L
    def tok(t: String): Long =
      t.codePoints.toArray.foldLeft(7L)((a, c) => (a * 131 + c) % mod)
    def gramHashes(text: String, k: Int): Seq[Long] = {
      val th = text.toLowerCase.trim.split("\\s+").toSeq.map(tok)
      if (th.length < k) Seq.empty
      else (0 to th.length - k).map(i =>
        th.slice(i, i + k).foldLeft(7L)((a, x) => (a * 131 + x) % mod))
    }
    def brute(text: String, k: Int, w: Int): Set[(Long, Int)] = {
      val g = gramHashes(text, k)
      if (g.isEmpty) Set.empty
      else (0 to math.max(g.length - w, 0)).map { s =>
        val win = g.slice(s, math.min(s + w, g.length))
        val m = win.min
        val p = s + win.lastIndexOf(m)  // rightmost tie wins
        (m, p)
      }.toSet
    }
    val textA = "the quick brown fox jumps over the lazy dog and runs far away home"
    val textB = "completely different words quick brown fox jumps over the lazy dog appears here"
    val textC = "tiny doc four tokens" // ng = 2 < w: one clamped window
    val docs = Seq((1L, textA), (2L, textB), (3L, textC), (4L, "below k"))
      .toDF("doc_id", "text")
    val out = TextOps.winnow(docs, k = 3, w = 4)
      .as[(Long, Long, Int)].collect()
      .groupBy(_._1).map { case (d, rs) => d -> rs.map(r => (r._2, r._3)).toSet }
    assert(out(1L) === brute(textA, 3, 4))
    assert(out(2L) === brute(textB, 3, 4))
    assert(out(3L) === brute(textC, 3, 4))
    assert(!out.contains(4L)) // shorter than k: no grams, no fingerprints
    // MOSS guarantee: the shared 8-token run (w+k-1 = 6 ≤ 8) forces a
    // common fingerprint VALUE between the two documents
    assert(out(1L).map(_._1).intersect(out(2L).map(_._1)).nonEmpty)
  }

  test("bpeTrain learns the classic greedy merges (hand-computed)") {
    import spark.implicits._
    val docs = Seq("low lower lowest low", "low").toDF("text")
    // word freqs: low:3, lower:1, lowest:1
    // r1: (l,o)=5 ties (o,w)=5 → lexicographic a → (l,o)
    // r2: (lo,w)=5 → (lo,w); r3: (low,e)=2 → (low,e)
    // r4: (lowe,r)=1 (lowe,s)=1 (s,t)=1 → (lowe,r)
    val merges = TextOps.bpeTrain(docs, numMerges = 4)
    assert(merges === Seq(("l", "o"), ("lo", "w"), ("low", "e"), ("lowe", "r")))
  }

  test("bpeTrain driver cutover and distributed path learn identical merges") {
    import spark.implicits._
    val docs = Seq("low lower lowest low", "newer newest new aaaa",
      "wider wide widest low").toDF("text")
    // localThreshold=0 forces the distributed path; default takes the
    // driver path — merge-for-merge equality across the cutover,
    // including the consumed-trailing-space overlap rule ("aaaa")
    val local = TextOps.bpeTrain(docs, numMerges = 12)
    val dist = TextOps.bpeTrain(docs, numMerges = 12, localThreshold = 0L)
    assert(local === dist)
  }

  test("bpeSegment applies merges in order; leftmost-non-overlap contract") {
    import spark.implicits._
    val merges = Seq(("l", "o"), ("lo", "w"), ("low", "e"), ("lowe", "r"))
    val seg = Seq("low lower lowest").toDF("text")
      .select(TextOps.bpeSegment(col("text"), merges).as("s"),
        TextOps.bpeTokenCount(col("text"), merges).as("n"))
      .as[(String, Int)].head()
    assert(seg === (("low\nlower\nlowe s t", 5)))
    // single-pass replace does NOT re-scan after a merge: "aaaa" → aa a a
    // (canonical BPE would give aa aa) — the documented portable contract
    val rep = Seq("aaaa").toDF("text")
      .select(TextOps.bpeSegment(col("text"), Seq(("a", "a"))).as("s"))
      .as[String].head()
    assert(rep === "aa a a")
    // trainer exhausts cleanly when fewer merges exist than asked
    val tiny = TextOps.bpeTrain(Seq("ab").toDF("text"), numMerges = 10)
    assert(tiny === Seq(("a", "b")))
    // a literal "|" word survives the newline word separator intact
    val pipe = Seq("a | b").toDF("text")
      .select(TextOps.bpeSegment(col("text"), Seq(("x", "y"))).as("s"),
        TextOps.bpeTokenCount(col("text"), Seq(("x", "y"))).as("n"))
      .as[(String, Int)].head()
    assert(pipe === (("a\n|\nb", 3)))
  }
}
