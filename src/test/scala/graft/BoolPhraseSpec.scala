package graft

import graft.index.BuildIndexJob
import graft.search.{BlockMaxWand, IndexSearch, Search}
import org.apache.spark.sql.functions._

/** Quoted phrases inside the boolean clause grammar
  * (`+"a b" c -d` through [[IndexSearch.searchClauses]]): parser pinning,
  * hand-auditable semantics, and a randomized equivalence against an
  * independent brute-force implementation of the pinned semantics. */
class BoolPhraseSpec extends SparkSpec {
  import spark.implicits._

  def tmp(): String = java.nio.file.Files.createTempDirectory("graftbp").toString
  def ts(i: Int) = new java.sql.Timestamp(1704067200000L + i * 1000L)

  def buildIdx(docs: Seq[Seq[String]], tag: String): IndexSearch.OpenIndex = {
    val turns = docs.zipWithIndex.map { case (toks, i) =>
      (f"c$i%03d", 0, "user", toks.mkString(" "), null.asInstanceOf[String], ts(i))
    }.toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
    val root = tmp()
    BuildIndexJob.run(spark, turns, root, tag,
      BuildIndexJob.Config(numShards = 4, blockSize = 4, storePositions = true))
    IndexSearch.open(spark, root)
  }

  def docsOf(res: org.apache.spark.sql.DataFrame, qid: Int): Seq[Long] =
    res.where(col("query_id") === qid).orderBy("rank")
      .select("doc_id").collect().map(_.getLong(0)).toSeq

  test("parser: quoted phrases with +/- prefixes, degenerate cases") {
    val c = Search.parseClauses("""+"block max" wand -deprecated -"hot path" "one" +"" x""")
    assert(c.mustPhrases == Seq(Seq("block", "max")))
    assert(c.notPhrases == Seq(Seq("hot", "path")))
    assert(c.not == Seq("deprecated"))
    // "one" (single token) degrades to a SHOULD term; +"" is a no-op
    assert(c.should.toSet == Set("wand", "one", "x"))
    assert(c.must.isEmpty && c.shouldPhrases.isEmpty)
    // must-over-should dedupe applies to phrases too
    val d = Search.parseClauses("""+"a b" "a b"""")
    assert(d.mustPhrases == Seq(Seq("a", "b")) && d.shouldPhrases.isEmpty)
  }

  test("semantics: must-phrase, phrase-only match, OOV elimination, not-phrase") {
    val idx = buildIdx(Seq(
      Seq("a", "b", "c"),       // 0: has "a b" and c
      Seq("a", "b", "x"),       // 1: has "a b", no c
      Seq("b", "a", "c"),       // 2: no "a b" (reversed), has c
      Seq("a", "x", "b", "c")), // 3: a and b present but not adjacent
      "sem")
    // +"a b" c : docs 0,1 (2,3 fail the must-phrase); doc 1 matches the
    // phrase but not the should term and still ranks
    assert(docsOf(IndexSearch.searchClauses(idx,
      Seq(1 -> "+\"a b\" c")), 1).toSet == Set(0L, 1L))
    // "a b" -c : phrase should, not-term excludes docs 0
    assert(docsOf(IndexSearch.searchClauses(idx,
      Seq(1 -> "\"a b\" -c")), 1) == Seq(1L))
    // -"a b" alone: pure negative matches nothing
    assert(IndexSearch.searchClauses(idx, Seq(1 -> "-\"a b\"")).count() == 0)
    // +"a zzzmissing" x : OOV must-phrase eliminates the query entirely
    assert(IndexSearch.searchClauses(idx,
      Seq(1 -> "+\"a zzzmissing\" x")).count() == 0)
    // not-phrase: a -"b c" — docs 0 ("a b c") and 3 ("a x b c") contain
    // the phrase "b c" and are excluded; 1 ("a b x") and 2 ("b a c") are not
    assert(docsOf(IndexSearch.searchClauses(idx,
      Seq(1 -> "a -\"b c\"")), 1).toSet == Set(1L, 2L))
  }

  test("phrase-less batches keep the historical terms-only plan's answers") {
    val idx = buildIdx(Seq(
      Seq("a", "b", "c"), Seq("a", "x", "x"), Seq("b", "c", "c")), "plain")
    val got = IndexSearch.searchClauses(idx, Seq(1 -> "+a b", 2 -> "a -c"))
      .orderBy("query_id", "rank").collect().toSeq
    val want = IndexSearch.searchBoolean(idx, Seq(1 -> "+a b", 2 -> "a -c"))
      .orderBy("query_id", "rank").collect().toSeq
    assert(got == want && got.nonEmpty)
  }

  test("multi-fragment highlighting: greedy non-overlapping snippets") {
    val idx = buildIdx(Seq(
      // matches at 0-based 0 and 12 — far apart → two ±2 fragments
      Seq("hit", "x", "x", "x", "x", "x", "x", "x", "x", "x", "x", "x", "hit", "y"),
      // matches at 0 and 2 — inside one ±2 window → one fragment
      Seq("hit", "x", "hit", "x")), "frag")
    def snips(fragments: Int) =
      IndexSearch.searchHighlight(idx, Seq(1 -> "hit"), window = 2,
        fragments = fragments)
        .collect().map(r => r.getLong(2) -> r.getString(4)).toMap
    val two = snips(2)
    assert(two(0L) == "hit x x x x ... x x hit y", s"got '${two(0L)}'")
    assert(two(1L) == "hit x hit x", s"got '${two(1L)}'")
    // fragments = 1 keeps the historical single-snippet behavior
    assert(snips(1)(0L) == "hit x x x x")
  }

  /** Independent brute-force of the pinned boolean+phrase semantics from
    * raw token lists. `mm` is minimumNumberShouldMatch: each matched
    * should TERM and should PHRASE clause counts one. */
  def brute(docs: Seq[Seq[String]], query: String, k: Int,
            mm: Int = 0): Seq[(Long, Double)] = {
    val c = Search.parseClauses(query)
    val n = docs.size.toLong
    val avgdl = docs.map(_.size).sum.toDouble / n
    def df(t: String) = docs.count(_.contains(t)).toLong
    def idf(t: String) = math.log(1.0 + (n - df(t) + 0.5) / (df(t) + 0.5))
    def pf(toks: Seq[String], p: Seq[String]): Int =
      (0 to toks.size - p.size).count(i => p.indices.forall(j => toks(i + j) == p(j)))
    val hits = docs.zipWithIndex.flatMap { case (toks, d) =>
      val dl = toks.size
      val posTerms = c.must ++ c.should
      val posPhrases = c.mustPhrases ++ c.shouldPhrases
      val mustOk = c.must.forall(toks.contains) &&
        c.mustPhrases.forall(p => pf(toks, p) > 0)
      val notHit = c.not.exists(toks.contains) ||
        c.notPhrases.exists(p => pf(toks, p) > 0)
      val anyPos = posTerms.exists(toks.contains) ||
        posPhrases.exists(p => pf(toks, p) > 0)
      val shouldMatched = c.should.count(toks.contains) +
        c.shouldPhrases.count(p => pf(toks, p) > 0)
      if (!mustOk || notHit || !anyPos || shouldMatched < mm) None
      else {
        val tScore = posTerms.filter(toks.contains).map { t =>
          val tf = toks.count(_ == t)
          idf(t) * tf / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)) * c.boost(t)
        }.sum
        val pScore = posPhrases.map { p =>
          val f = pf(toks, p).toDouble
          if (f == 0) 0.0
          else p.map(idf).sum * f / (f + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)) *
            c.phraseBoost(p)
        }.sum
        Some((d.toLong, tScore + pScore))
      }
    }
    hits.sortBy { case (d, s) => (-BlockMaxWand.round(s, 7), d) }.take(k)
      .map { case (d, s) => (d, BlockMaxWand.round(s, 4)) }
  }

  test("passage-SCORED highlighting: densest passage wins, rendered in doc order") {
    // query 'apple bee': matches at 3 and the dense cluster 12,13,14.
    // window=1 candidate scores: p3→1, p12→2, p13→3, p14→2. Scored picks
    // 13 first, then 3 (|3−13| > 2); doc-order render = around-3, around-13.
    val idx = buildIdx(Seq(
      Seq("x", "x", "x", "apple", "x", "x", "x", "x", "x", "x", "x", "x",
        "apple", "bee", "apple", "x")), "hlsc")
    val got = IndexSearch.searchHighlightScored(idx, Seq(1 -> "apple bee"),
      window = 1, fragments = 2).collect()
    assert(got.length == 1)
    assert(got(0).getString(4) == "x apple x ... apple bee apple",
      s"got '${got(0).getString(4)}'")
    // first-match-order fragments pick 3 then 12 instead — the two
    // policies genuinely differ on this doc
    val plain = IndexSearch.searchHighlight(idx, Seq(1 -> "apple bee"),
      window = 1, fragments = 2).collect()(0).getString(4)
    assert(plain == "x apple x ... x apple bee", s"got '$plain'")
    // fragments beyond the available separated passages: no extras
    val three = IndexSearch.searchHighlightScored(idx, Seq(1 -> "apple bee"),
      window = 1, fragments = 3).collect()(0).getString(4)
    assert(three == "x apple x ... apple bee apple", s"got '$three'")
    intercept[IllegalArgumentException](IndexSearch.searchHighlightScored(
      idx, Seq(1 -> "apple"), fragments = 0))
  }

  test("mm: minimum-should-match over terms, phrases, and groups") {
    val idx = buildIdx(Seq(
      Seq("a", "b", "c"),  // 0: a,b,c
      Seq("a", "x", "x"),  // 1: a only
      Seq("a", "b", "x"),  // 2: a,b + phrase "a b"
      Seq("c", "x", "x")), // 3: c only
      "mm")
    // pure shoulds, mm=2: docs matching >= 2 of {a,b,c}
    assert(docsOf(IndexSearch.searchClauses(idx,
      Seq(1 -> "a b c"), mm = 2), 1).toSet == Set(0L, 2L))
    // must + shoulds, mm=1: doc 1 (must a, zero shoulds matched) drops
    assert(docsOf(IndexSearch.searchClauses(idx,
      Seq(1 -> "+a b c"), mm = 1), 1).toSet == Set(0L, 2L))
    // mm=0 keeps Lucene's default — must-only docs still match
    assert(docsOf(IndexSearch.searchClauses(idx,
      Seq(1 -> "+a b c"), mm = 0), 1).toSet == Set(0L, 1L, 2L))
    // mm > |should clauses| matches nothing (Lucene parity)
    assert(IndexSearch.searchClauses(idx, Seq(1 -> "a"), mm = 2).count() == 0)
    // a should PHRASE counts as one clause: "a b" (docs 0,2) + c → mm=2
    // keeps only doc 0 (phrase AND c); doc 2 has the phrase but no c
    assert(docsOf(IndexSearch.searchClauses(idx,
      Seq(1 -> "\"a b\" c"), mm = 2), 1) == Seq(0L))
    // a should GROUP counts once however many members match: b* expands
    // to {b}; group + c under mm=2 keeps doc 0 only
    assert(docsOf(IndexSearch.searchClauses(idx,
      Seq(1 -> "b* c"), mm = 2), 1) == Seq(0L))
    // a group member that is ALSO a plain should clause counts for both:
    // '?' expands to every single-letter term so the group matches all
    // docs; mm=2 then keeps exactly the docs that also match should 'c'
    assert(docsOf(IndexSearch.searchClauses(idx,
      Seq(1 -> "? c"), mm = 2), 1).toSet == Set(0L, 3L))
  }

  test("pf: phrase-boosted search ≡ the explicit clause rewrite") {
    val idx = buildIdx(Seq(
      Seq("a", "b", "c"), Seq("a", "b", "x"), Seq("b", "a", "c")), "pf")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("query_id", "rank").collect().toSeq
    val got = rows(IndexSearch.searchPhraseBoosted(idx, Seq(1 -> "a b")))
    val want = rows(IndexSearch.searchClauses(idx, Seq(1 -> "a b \"a b\"")))
    assert(got == want && got.nonEmpty)
    // the boost reorders: docs 0,1 carry the adjacent phrase and must
    // outrank doc 2 (same bag of terms, no adjacency)
    assert(docsOf(IndexSearch.searchPhraseBoosted(idx, Seq(1 -> "a b")), 1)
      .last == 2L)
    // single-token pf is a no-op (≡ plain search)
    val one = rows(IndexSearch.searchPhraseBoosted(idx, Seq(1 -> "c")))
    val plain = rows(IndexSearch.search(idx, Seq(1 -> "c")))
    assert(one == plain)
    // clause syntax is rejected — pf rewrites keywords, not the grammar
    intercept[IllegalArgumentException](
      IndexSearch.searchPhraseBoosted(idx, Seq(1 -> "+a b")))
    intercept[IllegalArgumentException](
      IndexSearch.searchPhraseBoosted(idx, Seq(1 -> "\"a b\"")))
  }

  test("parser: ^boost suffixes on terms, phrases, groups; pinned dedupe") {
    val c = Search.parseClauses("""spark^2 +dup^3 -x^9 "a b"^1.5 te*^4 roam~1^2""")
    assert(c.boost("spark") == 2.0 && c.boost("dup") == 3.0)
    assert(c.termBoosts.get("x").isEmpty) // not-clause boosts are ignored
    assert(c.phraseBoost(Seq("a", "b")) == 1.5)
    assert(c.groupBoost(Search.WildcardBody("te*")) == 4.0)
    assert(c.groupBoost(Search.FuzzyBody("roam", 1)) == 2.0)
    // same term listed twice: dedupe keeps the MAX boost
    assert(Search.parseClauses("batch^2 batch^3").boost("batch") == 3.0)
    assert(Search.parseClauses("+spark^2 spark^5").boost("spark") == 5.0)
    // boost-free clauses keep boost 1.0 and an empty map
    assert(Search.parseClauses("a b").termBoosts.isEmpty)
    // malformed boosts fail loudly
    intercept[IllegalArgumentException](Search.parseClauses("a^x"))
    intercept[IllegalArgumentException](Search.parseClauses("a^0"))
    intercept[IllegalArgumentException](Search.parseClauses("a^-1"))
    intercept[IllegalArgumentException](Search.parseClauses("^2 b"))
  }

  test("boosts: hand-audited reordering + group-of-one ≡ boosted term") {
    val idx = buildIdx(Seq(
      Seq("a", "b", "b"),  // 0: b-heavy
      Seq("a", "a", "b"),  // 1: a-heavy
      Seq("a", "x", "x")), // 2: a only
      "boost")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("query_id", "rank").collect().toSeq
    // boosting b^3 ranks the b-heavy doc 0 first; boosting a^5 overcomes
    // a's lower idf (df 3 vs 2) and ranks the a-heavy doc 1 first — the
    // match set never changes (hand math: idf(a)=.1335, idf(b)=.4700)
    assert(docsOf(IndexSearch.searchClauses(idx, Seq(1 -> "a b^3")), 1)
      .head == 0L)
    assert(docsOf(IndexSearch.searchClauses(idx, Seq(1 -> "a^5 b")), 1)
      .head == 1L)
    assert(docsOf(IndexSearch.searchClauses(idx, Seq(1 -> "a b^3")), 1).toSet ==
      docsOf(IndexSearch.searchClauses(idx, Seq(1 -> "a b")), 1).toSet)
    // a boosted single-member group scores exactly like the boosted term
    // (members score with their own idf × the group's boost)
    val got = rows(IndexSearch.searchClauses(idx, Seq(1 -> "a b*^3")))
    val want = rows(IndexSearch.searchClauses(idx, Seq(1 -> "a b^3")))
    assert(got == want && got.nonEmpty)
    // the inline corpus engine agrees with the index engine on term boosts
    // (same docs in the same key order → same dense doc ids)
    val corpus = Seq((0L, "a b b"), (1L, "a a b"), (2L, "a x x"))
      .toDF("doc_id", "text")
    val inline = Search.searchCorpusClauses(corpus, Seq(1 -> "a b^3"))
      .select("rank", "doc_id", "score").orderBy("rank").collect().toSeq
    val viaIdx = IndexSearch.searchClauses(idx, Seq(1 -> "a b^3"))
      .select("rank", "doc_id", "score").orderBy("rank").collect().toSeq
    assert(inline == viaIdx && inline.nonEmpty)
  }

  test("property: searchClauses with phrases ≡ brute force on random corpora") {
    val rnd = new scala.util.Random(37)
    val vocab = Vector("a", "b", "c", "d", "e")
    for (trial <- 0 until 2) {
      val docs: Seq[Seq[String]] = (0 until 20).map { _ =>
        Seq.fill(8 + rnd.nextInt(13))(vocab(rnd.nextInt(vocab.size)))
      }
      val idx = buildIdx(docs, s"bp$trial")
      def t() = vocab(rnd.nextInt(vocab.size))
      val queries = Seq(
        1 -> s"""+"${t()} ${t()}" ${t()}""",
        2 -> s""""${t()} ${t()} ${t()}" -${t()}""",
        3 -> s"""+${t()} -"${t()} ${t()}"""",
        4 -> s"""+"${t()} ${t()}" -"${t()} ${t()}"""",
        5 -> { val x = t(); s"""+"$x $x" ${t()}""" }, // duplicate-term phrase
        6 -> s"""+"${t()} ${t()}"^2 ${t()}^0.5""",    // ^boost on both kinds
        7 -> s"""${t()}^3 "${t()} ${t()}"^0.25 -${t()}""")
      val res = IndexSearch.searchClauses(idx, queries, k = 10)
      for ((qid, q) <- queries) {
        val want = brute(docs, q, 10)
        val got = res.where(col("query_id") === qid).orderBy("rank")
          .select("doc_id", "score").collect()
          .map(r => (r.getLong(0), r.getDouble(1))).toSeq
        assert(got == want, s"trial $trial q$qid '$q': got $got want $want")
      }
      // mm arm: same corpus, should-heavy term+phrase queries, mm = 1,2
      val mmQueries = Seq(
        1 -> s"${t()} ${t()} ${t()}",
        2 -> s"""+${t()} ${t()} "${t()} ${t()}"""",
        3 -> s"""${t()} "${t()} ${t()}" -${t()}""")
      for (mm <- 1 to 2) {
        val mmRes = IndexSearch.searchClauses(idx, mmQueries, k = 10, mm = mm)
        for ((qid, q) <- mmQueries) {
          val want = brute(docs, q, 10, mm = mm)
          val got = mmRes.where(col("query_id") === qid).orderBy("rank")
            .select("doc_id", "score").collect()
            .map(r => (r.getLong(0), r.getDouble(1))).toSeq
          assert(got == want, s"trial $trial mm=$mm q$qid '$q': got $got want $want")
        }
      }
    }
  }
}
