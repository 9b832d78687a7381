package graft

import graft.index.BuildIndexJob
import graft.search.{IndexSearch, MultiTerm}

/** Wildcard + fuzzy MultiTermQuery rewrites ([[MultiTerm]]): each must
  * equal the plain disjunctive engine over the hand/brute-expanded term
  * set (the scoring-boolean rewrite pinning), with loud failure on
  * over-broad expansion and malformed patterns. */
class MultiTermSpec extends SparkSpec {
  import spark.implicits._

  def tmp(): String = java.nio.file.Files.createTempDirectory("graftmt").toString
  def ts(i: Int) = new java.sql.Timestamp(1704067200000L + i * 1000L)

  lazy val idx: IndexSearch.OpenIndex = {
    val turns = Seq(
      ("c0", 0, "user", "apple ant bee", null.asInstanceOf[String], ts(0)),
      ("c1", 0, "user", "ant bee cat", null.asInstanceOf[String], ts(1)),
      ("c2", 0, "user", "bee cat dog", null.asInstanceOf[String], ts(2)),
      ("c3", 0, "user", "cat dog emu", null.asInstanceOf[String], ts(3)))
      .toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
    val root = tmp()
    BuildIndexJob.run(spark, turns, root, "mt", BuildIndexJob.Config(numShards = 4))
    IndexSearch.open(spark, root)
  }
  lazy val dict: Seq[String] =
    idx.dictionary.select("term").collect().map(_.getString(0)).toSeq.sorted

  private def sameAs(got: org.apache.spark.sql.DataFrame,
                     terms: String): Unit = {
    val want = IndexSearch.search(idx, Seq(1 -> terms))
      .orderBy("rank").collect().toSeq
    assert(got.orderBy("rank").collect().toSeq == want)
  }

  test("wildcard ≡ hand-expanded disjunction (inner/leading/single-char)") {
    // ?at → cat; mixed with a literal term
    sameAs(MultiTerm.searchWildcard(idx, Seq(1 -> "?at dog")), "cat dog")
    // a* as a wildcard ≡ the prefix engine's expansion {ant, apple}
    sameAs(MultiTerm.searchWildcard(idx, Seq(1 -> "a*")), "ant apple")
    // leading star pays a full dictionary scan but must still be exact
    sameAs(MultiTerm.searchWildcard(idx, Seq(1 -> "*t")), "ant cat")
    // inner star anchored on both ends
    sameAs(MultiTerm.searchWildcard(idx, Seq(1 -> "a*e")), "apple")
    // case folds before matching
    sameAs(MultiTerm.searchWildcard(idx, Seq(1 -> "D?G")), "dog")
    // nothing matches → that query is simply absent
    assert(MultiTerm.searchWildcard(idx, Seq(1 -> "zz?x")).count() == 0)
  }

  test("wildcard guards: maxExpansions + token alphabet") {
    val e = intercept[IllegalArgumentException](
      MultiTerm.searchWildcard(idx, Seq(1 -> "a*"), maxExpansions = 1))
    assert(e.getMessage.contains("maxExpansions"))
    val e2 = intercept[IllegalArgumentException](
      MultiTerm.searchWildcard(idx, Seq(1 -> "a%b*")))
    assert(e2.getMessage.contains("alphabet"))
  }

  /** Plain Levenshtein — the spec's independent brute twin. */
  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("fuzzy ≡ brute-expanded disjunction over the dictionary") {
    for ((stem, n) <- Seq(("aple", 1), ("be", 1), ("cat", 2), ("dog", 0))) {
      val expanded = dict.filter(t => lev(t, stem) <= n)
      val got = MultiTerm.searchFuzzy(idx, Seq(1 -> s"$stem~$n"))
        .orderBy("rank").collect().toSeq
      val want =
        if (expanded.isEmpty) Seq.empty
        else IndexSearch.search(idx, Seq(1 -> expanded.mkString(" ")))
          .orderBy("rank").collect().toSeq
      assert(got == want, s"stem $stem~$n expanded to $expanded")
    }
    // sanity on the interesting case: cat~2 multi-expands (ant is 2 edits)
    assert(dict.filter(t => lev(t, "cat") <= 2).toSet == Set("ant", "cat"))
    // bare ~ means maxEdits 2
    assert(MultiTerm.searchFuzzy(idx, Seq(1 -> "cat~")).collect().toSeq ==
      MultiTerm.searchFuzzy(idx, Seq(1 -> "cat~2")).collect().toSeq)
    // nothing within reach → empty
    assert(MultiTerm.searchFuzzy(idx, Seq(1 -> "zzzzzz~1")).count() == 0)
  }

  test("fuzzy guards: maxEdits bound + maxExpansions") {
    val e = intercept[IllegalArgumentException](
      MultiTerm.searchFuzzy(idx, Seq(1 -> "cat~3")))
    assert(e.getMessage.contains("maxEdits"))
    val e2 = intercept[IllegalArgumentException](
      MultiTerm.searchFuzzy(idx, Seq(1 -> "cat~2"), maxExpansions = 1))
    assert(e2.getMessage.contains("maxExpansions"))
  }

  // ---- multiterm GROUP clauses inside the boolean grammar ----
  // corpus: d0 "apple ant bee", d1 "ant bee cat", d2 "bee cat dog",
  // d3 "cat dog emu"

  private def docs(q: String): Seq[Long] =
    IndexSearch.searchClauses(idx, Seq(1 -> q)).orderBy("rank")
      .collect().map(_.getLong(2)).toSeq

  test("must group: +a* satisfied by ANY member, members score") {
    // a* → {ant, apple}: docs 0, 1; scoring terms {ant, apple, cat}
    val got = IndexSearch.searchClauses(idx, Seq(1 -> "+a* cat"))
      .orderBy("rank").collect().map(r => (r.getLong(2), r.getDouble(3))).toSeq
    val want = IndexSearch.search(idx, Seq(1 -> "ant apple cat"))
      .orderBy("rank").collect().map(r => (r.getLong(2), r.getDouble(3)))
      .filter(r => Seq(0L, 1L).contains(r._1)).toSeq
    assert(got == want)
  }

  test("not group and empty must expansion") {
    // cat matches d1,d2,d3; -d?g kills dog docs d2,d3
    assert(docs("cat -d?g") == Seq(1L))
    // a must group expanding to nothing eliminates the query
    assert(docs("+zzz* cat").isEmpty)
    // pure-negative group matches nothing
    assert(docs("-a*").isEmpty)
  }

  test("fuzzy group under must; dedupe against a plain clause") {
    // aple~1 → {apple}: doc 0 only; bee scores alongside
    assert(docs("+aple~1 bee") == Seq(0L))
    // a group member that is also a plain term scores ONCE: +cat c?t
    // must equal the plain +cat query exactly
    val got = IndexSearch.searchClauses(idx, Seq(1 -> "+cat c?t"))
      .collect().map(r => (r.getLong(2), r.getDouble(3))).toSet
    val want = IndexSearch.searchClauses(idx, Seq(1 -> "+cat"))
      .collect().map(r => (r.getLong(2), r.getDouble(3))).toSet
    assert(got == want)
  }

  test("phrase + multiterm group composition (positional index)") {
    val turns = Seq(
      ("c0", 0, "user", "apple ant bee", null.asInstanceOf[String], ts(0)),
      ("c1", 0, "user", "ant bee cat", null.asInstanceOf[String], ts(1)),
      ("c2", 0, "user", "bee cat dog", null.asInstanceOf[String], ts(2)),
      ("c3", 0, "user", "cat dog emu", null.asInstanceOf[String], ts(3)))
      .toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
    val root = tmp()
    BuildIndexJob.run(spark, turns, root, "mtp",
      BuildIndexJob.Config(numShards = 4, storePositions = true))
    val pidx = IndexSearch.open(spark, root)
    def pdocs(q: String): Seq[Long] =
      IndexSearch.searchClauses(pidx, Seq(1 -> q)).orderBy("rank")
        .collect().map(_.getLong(2)).toSeq
    // must phrase "ant bee" (docs 0,1) + should wildcard d?g (2,3):
    // phrase gates the result set, wildcard only scores
    assert(pdocs("+\"ant bee\" d?g") == Seq(0L, 1L))
    // must group d?g (docs 2,3) + should phrase: group gates
    assert(pdocs("\"ant bee\" +d?g").toSet == Set(2L, 3L))
    // both must: disjoint gates → empty
    assert(pdocs("+\"ant bee\" +d?g").isEmpty)
  }

  test("group clauses fail loudly on the terms-only engine paths") {
    val e = intercept[IllegalArgumentException](
      graft.search.Search.parseClauseQueries(spark, Seq(1 -> "+a* cat")))
    assert(e.getMessage.contains("terms-only"))
  }

  test("phonetic: Column code twin ≡ Scala twin; search ≡ code-expanded disjunction") {
    import graft.search.Phonetic
    // property: the two engine-side twins agree on random analyzer tokens
    val rnd = new scala.util.Random(42)
    val alpha = "abcdefghijklmnopqrstuvwxyz0123456789"
    val toks = Seq.tabulate(300)(_ =>
      (1 to (1 + rnd.nextInt(10))).map(_ => alpha(rnd.nextInt(alpha.length))).mkString) ++
      Seq("merge", "mirge", "window", "windoe", "stream", "stremm", "a", "7", "q2b")
    val got = toks.toDF("t")
      .select(Phonetic.codeCol(org.apache.spark.sql.functions.col("t")))
      .collect().map(_.getString(0)).toSeq
    assert(got == toks.map(Phonetic.codeOf), "codeCol ≡ codeOf")
    // sounds-like pairs group, different first letters do not (soundex)
    assert(Phonetic.codeOf("mirge") == Phonetic.codeOf("merge"))
    assert(Phonetic.codeOf("stremm") == Phonetic.codeOf("stream"))
    assert(Phonetic.codeOf("kat") != Phonetic.codeOf("cat"))
    // search ≡ the plain disjunctive engine over the code-expanded set
    val same = dict.filter(t => Phonetic.codeOf(t) == Phonetic.codeOf("caat"))
    assert(same == Seq("cat"), s"fixture code groups drifted: $same")
    sameAs(Phonetic.searchPhonetic(idx, Seq(1 -> "caat")), "cat")
    sameAs(Phonetic.searchPhonetic(idx, Seq(1 -> "doog ant")), "dog ant")
    assert(Phonetic.searchPhonetic(idx, Seq(1 -> "zzqx")).count() == 0)
    val e = intercept[IllegalArgumentException](
      Phonetic.searchPhonetic(idx, Seq(1 -> "cat"), maxExpansions = 0))
    assert(e.getMessage.contains("maxExpansions"))
  }

  test("span_first ≡ brute positional count with unfiltered term idf") {
    val turns = Seq(
      ("c0", 0, "user", "apple ant bee", null.asInstanceOf[String], ts(0)),
      ("c1", 0, "user", "ant bee cat", null.asInstanceOf[String], ts(1)),
      ("c2", 0, "user", "bee cat dog", null.asInstanceOf[String], ts(2)),
      ("c3", 0, "user", "cat dog emu", null.asInstanceOf[String], ts(3)),
      ("c4", 0, "user", "ant ant bee ant", null.asInstanceOf[String], ts(4)))
    val texts = turns.map(_._4.split(" ").toSeq) // key order = doc_id order
    val root = tmp()
    BuildIndexJob.run(spark, turns.toDF("conv_id", "turn_idx", "role", "text", "tool", "ts"),
      root, "sf", BuildIndexJob.Config(numShards = 4, storePositions = true))
    val pidx = IndexSearch.open(spark, root)
    val qs = Seq((1, "bee", 2), (2, "ant", 1), (3, "ant", 4), (4, "zzz", 3))
    val got = IndexSearch.searchSpanFirst(pidx, qs)
      .orderBy("query_id", "rank").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).toSeq
    val n = texts.size
    val avgdl = texts.map(_.size).sum.toDouble / n
    val brute = qs.flatMap { case (qid, term, end) =>
      val df = texts.count(_.contains(term)).toLong
      texts.zipWithIndex
        .map { case (ts0, d) => (d.toLong, ts0.take(end).count(_ == term), ts0.size) }
        .filter(_._2 > 0)
        .map { case (d, tf, dl) =>
          (qid, d, graft.search.Bm25.score(tf, dl, df, n.toLong, avgdl)) }
        .sortBy { case (_, d, s) =>
          (-BigDecimal(s).setScale(7, BigDecimal.RoundingMode.HALF_UP), d) }
        .zipWithIndex
        .map { case ((q, d, s), i) => (q, i + 1, d,
          BigDecimal(s).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) }
    }
    assert(got == brute && got.nonEmpty, s"got=$got brute=$brute")
    // repeated occurrences inside the window count into freq: doc 4 has
    // ant at 0,1,3 — end=4 sees tf=3 and outranks the single-ant docs
    assert(got.filter(_._1 == 3).head._3 == 4L)
    // guards: multi-token query, bad end, non-positional index
    intercept[IllegalArgumentException](
      IndexSearch.searchSpanFirst(pidx, Seq((1, "ant bee", 2))))
    intercept[IllegalArgumentException](
      IndexSearch.searchSpanFirst(pidx, Seq((1, "ant", 0))))
    intercept[IllegalArgumentException](
      IndexSearch.searchSpanFirst(idx, Seq((1, "ant", 2))))
  }

  // ---- TermRangeQuery ----
  // dictionary (sorted): ant apple bee cat dog emu

  test("term range ≡ hand-expanded disjunction (inclusive/exclusive/mix)") {
    assert(dict == Seq("ant", "apple", "bee", "cat", "dog", "emu"))
    // inclusive endpoints
    sameAs(MultiTerm.searchTermRange(idx, Seq(1 -> "[ant TO cat]")),
      "ant apple bee cat")
    // exclusive endpoints
    sameAs(MultiTerm.searchTermRange(idx, Seq(1 -> "{ant TO cat}")),
      "apple bee")
    // half-open [lo TO hi} + a literal term rides along
    sameAs(MultiTerm.searchTermRange(idx, Seq(1 -> "[bee TO cat} dog")),
      "bee dog")
    // case folds on endpoints; TO keyword is case-insensitive
    sameAs(MultiTerm.searchTermRange(idx, Seq(1 -> "[BEE to CAT]")),
      "bee cat")
    // reversed range matches nothing (Lucene semantics)
    assert(MultiTerm.searchTermRange(idx, Seq(1 -> "[cat TO ant]")).count() == 0)
    // non-range text falls through to plain analyzed terms
    val (terms, ranges) = MultiTerm.parseRangeQuery("cat dog")
    assert(terms == Seq("cat", "dog") && ranges.isEmpty)
  }

  test("term range guards: maxExpansions") {
    val e = intercept[IllegalArgumentException](
      MultiTerm.searchTermRange(idx, Seq(1 -> "[ant TO emu]"), maxExpansions = 2))
    assert(e.getMessage.contains("maxExpansions"))
  }

  test("regexp ≡ hand-expanded disjunction; whole-term anchoring") {
    // alternation expands to the branch terms
    sameAs(MultiTerm.searchRegexp(idx, Seq(1 -> "/(cat|dog)/")), "cat dog")
    // class + dot: whole-term anchored — 'a.t' must NOT match 'ant'
    // partially inside 'apple' etc.
    sameAs(MultiTerm.searchRegexp(idx, Seq(1 -> "/a.t/")), "ant")
    // suffix via .*; mixed with a literal term
    sameAs(MultiTerm.searchRegexp(idx, Seq(1 -> "/.*ee/ dog")), "bee dog")
    // 'e' alone must not match 'bee'/'emu' (anchoring), only a 1-char term
    assert(MultiTerm.searchRegexp(idx, Seq(1 -> "/e/")).count() == 0)
    // nothing matches → the query is absent
    assert(MultiTerm.searchRegexp(idx, Seq(1 -> "/zz+/")).count() == 0)
  }

  test("regexp guards: portable subset + maxExpansions") {
    val bad = intercept[IllegalArgumentException](
      MultiTerm.searchRegexp(idx, Seq(1 -> "/a(?=b)/"))) // lookahead
    assert(bad.getMessage.contains("portable"))
    val big = intercept[IllegalArgumentException](
      MultiTerm.searchRegexp(idx, Seq(1 -> "/.*/"), maxExpansions = 2))
    assert(big.getMessage.contains("maxExpansions"))
  }
}
