package graft

import graft.index.BuildIndexJob
import graft.search.{Elevation, IndexSearch, JoinQuery, MoreLikeThis, SpellCheck}

/** The round-5 Solr component batch — MoreLikeThis, pivot faceting, the
  * join query parser, spellcheck, and query elevation — each checked
  * against brute/hand-computed twins on a corpus small enough to verify
  * by eye. */
class SolrComponentsSpec extends SparkSpec {
  import spark.implicits._

  def tmp(): String = java.nio.file.Files.createTempDirectory("graftsc").toString
  def ts(i: Int) = new java.sql.Timestamp(1704067200000L + i * 1000L)

  // dense doc ids by (conv_id, turn_idx): c0/0→0, c0/1→1, c1/0→2,
  // c1/1→3, c2/0→4, c2/1→5
  lazy val idx: IndexSearch.OpenIndex = {
    val turns = Seq(
      ("c0", 0, "user", "apple ant bee", null.asInstanceOf[String], ts(0)),
      ("c0", 1, "assistant", "ant bee cat", "t1", ts(1)),
      ("c1", 0, "user", "bee cat dog", null.asInstanceOf[String], ts(2)),
      ("c1", 1, "assistant", "cat dog emu", "t1", ts(3)),
      ("c2", 0, "user", "emu fox goat", "t2", ts(4)),
      ("c2", 1, "assistant", "apple emu fox", null.asInstanceOf[String], ts(5)))
      .toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
    val root = tmp()
    BuildIndexJob.run(spark, turns, root, "sc", BuildIndexJob.Config(numShards = 4))
    IndexSearch.open(spark, root)
  }

  test("MLT: interesting terms ≡ brute tf×idf ranking; seed excluded") {
    // seed doc 0 = "apple ant bee": tf all 1; df apple=2 ant=2 bee=3 →
    // idf(2) > idf(3), term ASC inside the df-2 tie → ant, apple, bee
    val it = MoreLikeThis.interestingTerms(idx, Seq(1 -> 0L),
      maxQueryTerms = 10, minTf = 1, minDf = 1)
      .orderBy("mlt_rank").select("term").collect().map(_.getString(0)).toSeq
    assert(it == Seq("ant", "apple", "bee"))

    val got = MoreLikeThis.moreLikeThis(idx, Seq(1 -> 0L),
      k = 10, maxQueryTerms = 10, minTf = 1, minDf = 1)
      .orderBy("rank").collect().toSeq
    // ≡ the plain disjunction over those terms with the seed filtered out
    val want = IndexSearch.search(idx, Seq(1 -> "ant apple bee"))
      .orderBy("rank").collect().toSeq
      .filter(_.getLong(2) != 0L)
    assert(got.map(r => (r.getLong(2), r.getDouble(3))) ==
      want.map(r => (r.getLong(2), r.getDouble(3))))
    // ranks re-number contiguously after the exclusion
    assert(got.map(_.getInt(1)) == (1 to got.size))
    assert(!got.exists(_.getLong(2) == 0L))
  }

  test("MLT: mintf/mindf gates") {
    // every seed term appears once → minTf=2 empties the query
    assert(MoreLikeThis.moreLikeThis(idx, Seq(1 -> 0L),
      minTf = 2, minDf = 1).count() == 0)
    // minDf=3 keeps only bee (df 3)
    val it = MoreLikeThis.interestingTerms(idx, Seq(1 -> 0L),
      maxQueryTerms = 10, minTf = 1, minDf = 3)
      .select("term").collect().map(_.getString(0)).toSeq
    assert(it == Seq("bee"))
  }

  test("facet.pivot ≡ hand counts; NULL child at parent level only") {
    // "cat" matches docs 1, 2, 3: roles assistant(t1), user(null),
    // assistant(t1)
    val rows = IndexSearch.facetPivot(idx, Seq(1 -> "cat"), "role", "tool")
      .collect().map(r => (r.getInt(0), r.getString(1),
        Option(r.getString(2)), r.getLong(3))).toSet
    assert(rows == Set(
      (1, "assistant", None, 2L),
      (1, "user", None, 1L),
      (1, "assistant", Some("t1"), 2L)))
  }

  test("facet.pivot invariant: parent count = Σ children + null-child docs") {
    val df = IndexSearch.facetPivot(idx, Seq(1 -> "bee cat emu"), "role", "tool")
    val parents = df.where("child IS NULL").collect()
      .map(r => (r.getString(1), r.getLong(3))).toMap
    val childSums = df.where("child IS NOT NULL").collect()
      .groupBy(_.getString(1)).view.mapValues(_.map(_.getLong(3)).sum).toMap
    // every child sum is bounded by its parent count
    childSums.foreach { case (p, s) => assert(s <= parents(p)) }
    assert(parents.keySet.nonEmpty)
  }

  test("{!join}: conversation expansion of the match set, doc_id-ranked") {
    // "apple" matches docs 0 (c0) and 5 (c2) → all turns of c0 and c2
    val rows = JoinQuery.join(idx, Seq(1 -> "apple"), "conv_id", "conv_id")
      .orderBy("rank").collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getString(3))).toSeq
    assert(rows == Seq((1, 0L, "c0"), (2, 1L, "c0"), (3, 4L, "c2"), (4, 5L, "c2")))
    // top-k caps the expansion
    assert(JoinQuery.join(idx, Seq(1 -> "apple"), "conv_id", "conv_id", k = 3)
      .count() == 3)
  }

  /** Plain Levenshtein — independent brute twin. */
  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("spellcheck ≡ brute dictionary scan; present tokens suggest nothing") {
    val dict = idx.dictionary.select("term", "df").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val got = SpellCheck.suggest(idx, Seq(1 -> "aple", 2 -> "apple", 3 -> "zzzzzz"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getInt(2),
        r.getString(3), r.getInt(4))).toSeq
    // "apple" is in the dictionary → no rows for request 2; "zzzzzz" is
    // beyond 2 edits from everything → no rows for request 3
    assert(!got.exists(_._1 == 2) && !got.exists(_._1 == 3))
    val brute = dict.filter { case (t, _) => lev(t, "aple") <= 2 }
      .map { case (t, df) => (t, lev(t, "aple"), df) }
      .sortBy { case (t, d, df) => (d, -df, t) }
    assert(got.filter(_._1 == 1).map(r => (r._4, r._5)) ==
      brute.map(b => (b._1, b._2)))
    // ranks are 1..n in the pinned (distance, df DESC, term) order
    assert(got.filter(_._1 == 1).map(_._3) == (1 to brute.size))
  }

  test("elevation: curated order first, organic tail excluded+renumbered") {
    // "cat" matches docs 1, 2, 3; elevate 3 then 0 (0 unmatched → NULL
    // score, forceElevation shape)
    val got = Elevation.search(idx, Seq(1 -> "cat"), Map(1 -> Seq(3L, 0L)))
      .orderBy("rank").collect()
    assert(got.map(_.getLong(2)).toSeq.take(2) == Seq(3L, 0L))
    assert(got.map(_.getBoolean(4)).toSeq.take(2) == Seq(true, true))
    assert(got(1).isNullAt(3)) // unmatched elevated doc: NULL score
    val organic = got.drop(2)
    assert(organic.forall(!_.getBoolean(4)))
    assert(organic.map(_.getLong(2)).toSet == Set(1L, 2L)) // 3 excluded
    assert(got.map(_.getInt(1)).toSeq == (1 to got.length))
    // organic tail keeps the score ordering of the plain engine
    val plain = IndexSearch.search(idx, Seq(1 -> "cat")).orderBy("rank")
      .collect().map(_.getLong(2)).toSeq.filterNot(Seq(3L, 0L).contains)
    assert(organic.map(_.getLong(2)).toSeq == plain)
  }

  test("elevation guards: duplicates and over-k lists fail loudly") {
    val e = intercept[IllegalArgumentException](
      Elevation.search(idx, Seq(1 -> "cat"), Map(1 -> Seq(3L, 3L))))
    assert(e.getMessage.contains("duplicates"))
    val e2 = intercept[IllegalArgumentException](
      Elevation.search(idx, Seq(1 -> "cat"), Map(1 -> Seq(1L, 2L, 3L)), k = 2))
    assert(e2.getMessage.contains("exceeds"))
  }

  test("cursorMark: cursor pages tile the full ranking, no overlap/gap") {
    val q = Seq(1 -> "bee cat emu") // matches all 6 docs
    val all = IndexSearch.search(idx, q, k = 10).orderBy("rank")
      .collect().map(_.getLong(2)).toSeq
    val p1 = IndexSearch.search(idx, q, k = 2).orderBy("rank")
      .collect().map(_.getLong(2)).toSeq
    val c1 = IndexSearch.pageCursor(idx, q, 2)
    val p2 = IndexSearch.searchAfter(idx, q, c1, k = 2).orderBy("rank")
      .collect().map(_.getLong(2)).toSeq
    val c2 = IndexSearch.pageCursor(idx, q, 4)
    val p3 = IndexSearch.searchAfter(idx, q, c2, k = 10).orderBy("rank")
      .collect().map(_.getLong(2)).toSeq
    assert(p1 ++ p2 ++ p3 == all)
    // page-relative ranks restart at 1
    assert(IndexSearch.searchAfter(idx, q, c1, k = 2).orderBy("rank")
      .collect().map(_.getInt(1)).toSeq == Seq(1, 2))
    // cursor past the last hit → empty page
    val cEnd = IndexSearch.pageCursor(idx, q, 100)
    assert(IndexSearch.searchAfter(idx, q, cEnd, k = 10).count() == 0)
  }

  test("bf boost ≡ brute re-rank of score + recip(dl)") {
    import org.apache.spark.sql.functions.{col, lit}
    val q = Seq(1 -> "cat dog")
    val dl = idx.io.read(spark, idx.paths.docs)
      .select("doc_id", "dl").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val plain = IndexSearch.search(idx, q, k = 10).collect()
      .map(r => r.getLong(2) -> r.getDouble(3)).toMap
    val got = IndexSearch.searchBoosted(idx, q,
      lit(100.0) / (col("dl") + lit(10.0)), k = 10)
      .orderBy("rank").collect()
      .map(r => (r.getLong(2), r.getDouble(3))).toSeq
    // same match set, each score lifted by its recip term, order by the
    // boosted value (rounded-4 outputs → compare to 3 decimals)
    val brute = plain.map { case (d, s) => (d, s + 100.0 / (dl(d) + 10.0)) }
      .toSeq.sortBy { case (d, s) => (-math.round(s * 1e7), d) }
    assert(got.map(_._1) == brute.map(_._1))
    got.zip(brute).foreach { case ((_, gs), (_, bs)) =>
      assert(math.abs(gs - bs) < 1e-3) }
  }

  test("FunctionQuery: parse/render twins, arity guards, engine parity") {
    import graft.search.FunctionQuery
    import org.apache.spark.sql.functions.{col, lit}
    // the canonical bf shape parses and both renders evaluate it
    val ast = FunctionQuery.parse("recip(dl,1,100,10)")
    assert(ast == FunctionQuery.Call("recip", Seq(
      FunctionQuery.Field("dl"), FunctionQuery.Num(1), FunctionQuery.Num(100),
      FunctionQuery.Num(10))))
    assert(FunctionQuery.toSql(ast, f => s"dl.$f") ==
      "(CAST(100.0 AS DOUBLE)/((CAST(1.0 AS DOUBLE)*dl.dl)+CAST(10.0 AS DOUBLE)))")
    // nested composition with whitespace tolerance
    val nested = FunctionQuery.parse("sum( recip(dl,1,100,10), product(0.5, sqrt(dl)) )")
    assert(FunctionQuery.toColumn(nested) != null)
    // parser guards fail loudly
    intercept[IllegalArgumentException](FunctionQuery.parse("nope(dl)"))
    intercept[IllegalArgumentException](FunctionQuery.parse("recip(dl,1,100)"))
    intercept[IllegalArgumentException](FunctionQuery.parse("sum(dl)"))
    intercept[IllegalArgumentException](FunctionQuery.parse("recip(dl,1,100,10) x"))
    intercept[IllegalArgumentException](FunctionQuery.parse("recip(dl,1,100,"))
    // searchBoosted with the parsed Column ≡ the hand-built Column
    val q = Seq(1 -> "cat dog")
    val viaFn = IndexSearch.searchBoosted(idx, q,
      FunctionQuery.toColumn(FunctionQuery.parse("recip(dl,1,100,10)")), k = 10)
      .orderBy("rank").collect().map(r => (r.getLong(2), r.getDouble(3))).toSeq
    val viaCol = IndexSearch.searchBoosted(idx, q,
      lit(100.0) / (lit(1.0) * col("dl") + lit(10.0)), k = 10)
      .orderBy("rank").collect().map(r => (r.getLong(2), r.getDouble(3))).toSeq
    assert(viaFn == viaCol && viaFn.nonEmpty)
  }

  test("TermsComponent: prefix enumeration in index (term ASC) order") {
    val got = graft.search.Suggest.terms(idx, Seq(1 -> "a", 2 -> "e"), n = 10)
      .orderBy("query_id", "rank").collect()
      .map(r => (r.getInt(0), r.getString(2), r.getLong(3))).toSeq
    val dict = idx.dictionary.select("term", "df").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val want = Seq("a" -> 1, "e" -> 2).flatMap { case (p, qid) =>
      dict.filter(_._1.startsWith(p)).sortBy(_._1)
        .map(t => (qid, t._1, t._2))
    }.sortBy(r => (r._1, r._2))
    assert(got == want)
    // limit truncates in term order
    assert(graft.search.Suggest.terms(idx, Seq(1 -> "a"), n = 1)
      .collect().map(_.getString(2)).toSeq == Seq("ant"))
  }

  test("elevation with no curated docs ≡ the plain engine") {
    val got = Elevation.search(idx, Seq(1 -> "cat"), Map.empty)
      .orderBy("rank").collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    val want = IndexSearch.search(idx, Seq(1 -> "cat")).orderBy("rank")
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == want)
  }

  test("LTR features: ranks ≡ explain; per-feature hand audit on doc 2") {
    val q = Seq(1 -> "bee cat zebra") // zebra unmatched → coverage < 1
    val feats = IndexSearch.ltrFeatures(idx, q).orderBy("rank").collect()
    val expl = IndexSearch.explain(idx, q).collect()
    // candidate set + ranking identical to the explain (= every BM25) path
    assert(feats.map(r => (r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq ==
      expl.map(r => (r.getInt(1), r.getLong(2), r.getDouble(8)))
        .distinct.sortBy(_._1).toSeq)
    // doc 2 = "bee cat dog": both query terms match once, dl 3, role user
    val d2 = feats.find(_.getLong(2) == 2L).get
    assert(d2.getLong(4) == 2L, "f_tf_sum: bee+cat once each")
    assert(d2.getInt(5) == 2, "f_matched")
    assert(d2.getDouble(6) == 0.6667, "f_coverage = 2/3 (zebra unmatched)")
    val idfs = expl.filter(_.getLong(2) == 2L).map(_.getDouble(6))
    assert(d2.getDouble(7) == idfs.max, "f_idf_max ≡ explain's idf column")
    assert(d2.getLong(8) == 3L, "f_dl")
    assert(d2.getInt(9) == 1, "f_is_user: c1/0 is a user turn")
    // assistant turn flags 0
    assert(feats.find(_.getLong(2) == 3L).get.getInt(9) == 0)
  }

  // corpus dfs: apple 2, ant 2, bee 3, cat 3, dog 2, emu 3, fox 2, goat 1
  // N = 6; cutoff 0.4·6 = 2.4 → low = {apple ant dog fox goat}

  test("CommonTermsQuery: high-df terms score but don't gate; all-high falls back") {
    // "apple bee": apple is the low backbone → only apple docs (0, 5)
    // qualify; bee still scores where matched — the ranked subset of the
    // plain disjunction restricted to apple docs, scores unchanged
    val got = IndexSearch.searchCommonTerms(idx, Seq(1 -> "apple bee"), 0.4)
      .orderBy("rank").collect()
      .map(r => (r.getLong(2), r.getDouble(3))).toSeq
    val full = IndexSearch.search(idx, Seq(1 -> "apple bee"))
      .orderBy("rank").collect()
      .map(r => (r.getLong(2), r.getDouble(3))).toSeq
    assert(got == full.filter(r => Seq(0L, 5L).contains(r._1)) && got.size == 2)
    // every term high-df → empty low clause → plain disjunction fallback
    val fb = IndexSearch.searchCommonTerms(idx, Seq(1 -> "bee cat emu"), 0.4)
      .orderBy("rank").collect().toSeq
    assert(fb == IndexSearch.search(idx, Seq(1 -> "bee cat emu"))
      .orderBy("rank").collect().toSeq && fb.nonEmpty)
    // OOV term is neither class: "zzz bee" ≡ search("bee")
    assert(IndexSearch.searchCommonTerms(idx, Seq(1 -> "zzz bee"), 0.4)
      .orderBy("rank").collect().toSeq ==
      IndexSearch.search(idx, Seq(1 -> "bee")).orderBy("rank").collect().toSeq)
    intercept[IllegalArgumentException](
      IndexSearch.searchCommonTerms(idx, Seq(1 -> "bee"), 0.0))
  }

  test("MaxP: doc order tracks each doc's best passage; ties, counts, guard") {
    import graft.search.Search
    import graft.ops.TextOps
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (0L, ("alpha beta " * 20).trim),                  // repeated hits
      (1L, "alpha " + ("filler " * 30).trim + " alpha beta beta gamma"),
      (2L, "gamma delta"),                              // no query terms
      (3L, "alpha solo"))
      .toDF("doc_id", "text")
    val q = Seq(1 -> "alpha beta")
    val got = Search.searchMaxP(docs, q, 16, 8, 10).collect()
      .map(r => (r.getLong(2), r.getInt(4), r.getInt(5))).toSeq
    // reference: full passage ranking; MaxP doc order = order of each
    // doc's FIRST (i.e. best) passage in that ranking
    val pc = TextOps.chunks(docs, 16, 8)
      .select((col("doc_id") * 1024 + col("chunk_idx")).as("doc_id"),
        col("chunk_text").as("text"))
    val prank = Search.searchCorpus(pc, q, k = 1000).orderBy("rank")
      .collect().map(r => r.getLong(2))
    val docOrder = prank.map(_ / 1024).distinct.toSeq
    assert(got.map(_._1) == docOrder)
    val bestIdx = prank.map(p => (p / 1024, (p % 1024).toInt)).toSeq
      .groupBy(_._1).map { case (d, ps) => d -> ps.head._2 }
    val counts = prank.groupBy(_ / 1024).map { case (d, ps) => d -> ps.length }
    got.foreach { case (d, bi, np) =>
      assert(bi == bestIdx(d) && np == counts(d), s"doc $d")
    }
    assert(!got.exists(_._1 == 2L)) // no-match doc absent
    // >= 1024 chunks in one doc must fail loudly (id packing would alias)
    val big = Seq((0L, ("tok " * 17000).trim)).toDF("doc_id", "text")
    intercept[Exception](Search.searchMaxP(big, q, 16, 16, 5).collect())
  }

  test("percolator: hand-audited boolean matrix incl. pure-negative; grammar guard") {
    import graft.search.Percolator
    val docs = Seq(
      (0L, "apple ant bee"), (1L, "ant bee cat"), (2L, "bee cat dog"),
      (3L, "cat dog emu"), (4L, "emu fox goat"), (5L, "apple emu fox"))
      .toDF("doc_id", "text")
    val got = Percolator.percolate(docs, Seq(
      "p1" -> "+ant -cat", "p2" -> "apple emu", "p3" -> "-bee",
      "p4" -> "+apple +fox")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3))).toSeq
    assert(got == Seq(
      (0L, "p1", 1, 0), (0L, "p2", 0, 1),
      (3L, "p2", 0, 1), (3L, "p3", 0, 0),
      (4L, "p2", 0, 1), (4L, "p3", 0, 0),
      (5L, "p2", 0, 2), (5L, "p3", 0, 0), (5L, "p4", 2, 0)))
    intercept[IllegalArgumentException](
      Percolator.percolate(docs, Seq("ph" -> "\"ant bee\"")))
    intercept[IllegalArgumentException](
      Percolator.percolate(docs, Seq("w" -> "an*")))
    intercept[IllegalArgumentException](
      Percolator.percolate(docs, Seq("a" -> "x", "a" -> "y")))
  }

  test("LTR rerank: linear model re-sorts ONLY the depth window; first_rank kept") {
    // "bee cat": BM25 order 1,2 (2 matched terms, tie → doc_id), 0, 3.
    // model = f_is_user → user turns (0, 2) outrank assistant (1, 3)
    val got = IndexSearch.ltrRerank(idx, Seq(1 -> "bee cat"),
      Seq("f_is_user" -> 1.0), k = 4, depth = 4).collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getDouble(3), r.getInt(4))).toSeq
    assert(got.map(_._2) == Seq(0L, 2L, 1L, 3L))
    assert(got.map(_._4) == Seq(3, 2, 1, 4)) // first-pass ranks ride along
    assert(got.map(_._3) == Seq(1.0, 1.0, 0.0, 0.0))
    // reRankDocs contract: depth=2 → doc 0 can never enter, whatever
    // the model says; within {1, 2} the user turn 2 wins
    val win = IndexSearch.ltrRerank(idx, Seq(1 -> "bee cat"),
      Seq("f_is_user" -> 1.0), k = 2, depth = 2).collect()
      .map(r => (r.getLong(2), r.getInt(4))).toSeq
    assert(win == Seq((2L, 2), (1L, 1)))
    intercept[IllegalArgumentException](IndexSearch.ltrRerank(idx,
      Seq(1 -> "bee"), Seq("f_dl" -> 1.0, "f_dl" -> 2.0)))
    intercept[IllegalArgumentException](IndexSearch.ltrRerank(idx,
      Seq(1 -> "bee"), Seq("f_dl" -> 1.0), k = 5, depth = 3))
  }

  test("realtime get: tlog wins on collision, uncommitted adds visible") {
    val pending = Seq(
      ("c0", 1, "assistant", "t9", "xx yy"),
      ("c9", 0, "user", "", "zz"))
    val keys = Seq(("c0", 1), ("c9", 0), ("c1", 0), ("cmissing", 0))
    val got = IndexSearch.getDocsRealtime(idx, pending, keys).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getString(3),
        r.getLong(4), r.getString(5))).toSeq
    assert(got == Seq(
      ("c0", 1, "assistant", "t9", 2L, "xx yy"),              // tlog wins
      ("c1", 0, "user", null.asInstanceOf[String], 3L, "bee cat dog"),
      ("c9", 0, "user", "", 1L, "zz")))                // uncommitted add
    intercept[IllegalArgumentException](IndexSearch.getDocsRealtime(idx,
      Seq(("a", 0, "r", "t", "x"), ("a", 0, "r", "t", "y")), keys))
  }

  test("group.query: membership filters, the MAIN query ranks, per-group numFound") {
    val scores = IndexSearch.search(idx, Seq(1 -> "bee")).collect()
      .map(r => r.getLong(2) -> r.getDouble(3)).toMap
    // main "bee" matches {0,1,2}; g_ant ∩ = {0,1} (tied score → doc_id),
    // g_dogemu ∩ = {2}, g_none matches nothing → absent
    val got = IndexSearch.searchGroupQueries(idx, Seq(1 -> "bee"),
      Seq("g_ant" -> "ant", "g_dogemu" -> "dog emu", "g_none" -> "zzz"),
      groupLimit = 2).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getInt(2), r.getLong(3),
        r.getDouble(4), r.getLong(5))).toSeq
    assert(got == Seq(
      (1, "g_ant", 1, 0L, scores(0L), 2L),
      (1, "g_ant", 2, 1L, scores(1L), 2L),
      (1, "g_dogemu", 1, 2L, scores(2L), 1L)))
    // groupLimit truncates but numFound still reports the full group
    val lim1 = IndexSearch.searchGroupQueries(idx, Seq(1 -> "bee"),
      Seq("g_ant" -> "ant"), groupLimit = 1).collect()
      .map(r => (r.getInt(2), r.getLong(3), r.getLong(5))).toSeq
    assert(lim1 == Seq((1, 0L, 2L)))
    intercept[IllegalArgumentException](
      IndexSearch.searchGroupQueries(idx, Seq(1 -> "bee"),
        Seq("a" -> "x", "a" -> "y")))
  }
}
