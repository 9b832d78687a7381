package graft

import graft.index.BuildIndexJob
import graft.search.{Facets, IndexSearch, SignificantTerms}
import org.apache.spark.sql.functions._

/** Round-5 request-surface batch 3: interval faceting, multi-select
  * (tag/ex) faceting, ReRank, collapse+expand, significantTerms, and
  * exact stats percentiles — hand-computed expectations on the shared
  * 5-doc corpus (dl = 3,3,3,7,9; avgdl = 5; N = 5). */
class SurfaceR5Spec extends SparkSpec {
  import spark.implicits._

  def tmp(): String = java.nio.file.Files.createTempDirectory("graftr5").toString
  def ts(i: Int) = new java.sql.Timestamp(1704067200000L + i * 1000L)

  lazy val idx: IndexSearch.OpenIndex = {
    val turns = Seq(
      ("c0", 0, "user", "apple ant bee", null.asInstanceOf[String], ts(0)),
      ("c0", 1, "assistant", "ant bee cat", "toolA", ts(1)),
      ("c1", 0, "user", "bee cat dog", null.asInstanceOf[String], ts(2)),
      ("c1", 1, "assistant", "cat dog emu fox gnu hen ibis", "toolB", ts(3)),
      ("c2", 0, "user", "dog emu fox gnu hen ibis jay kit lark", null.asInstanceOf[String], ts(4)))
      .toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
    val root = tmp()
    BuildIndexJob.run(spark, turns, root, "r5", BuildIndexJob.Config(numShards = 4))
    IndexSearch.open(spark, root)
  }

  test("Interval.parse pins Solr bracket syntax; malformed fails loudly") {
    val iv = Facets.Interval.parse("[0,59]")
    assert(iv == Facets.Interval("[0,59]", Some(0L), true, Some(59L), true))
    val open = Facets.Interval.parse("(29,*]")
    assert(open == Facets.Interval("(29,*]", Some(29L), false, None, true))
    assert(Facets.Interval.parse("[*,0)") ==
      Facets.Interval("[*,0)", None, true, Some(0L), false))
    intercept[IllegalArgumentException](Facets.Interval.parse("[0;59]"))
    intercept[IllegalArgumentException](Facets.Interval.parse("0,59"))
  }

  test("facetIntervals: overlapping sets both count; zero-filled spine") {
    // "bee" matches docs 0,1,2 (dl 3,3,3); query 2 matches nothing
    val sets = Seq("[0,3]", "(3,9]", "[3,3]", "[*,0)").map(Facets.Interval.parse)
    val rows = IndexSearch.facetIntervals(idx,
      Seq(1 -> "bee", 2 -> "zzz"), "dl", sets)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSet
    assert(rows == Set(
      (1, "[0,3]", 3L), (1, "(3,9]", 0L), (1, "[3,3]", 3L), (1, "[*,0)", 0L),
      (2, "[0,3]", 0L), (2, "(3,9]", 0L), (2, "[3,3]", 0L), (2, "[*,0)", 0L)))
  }

  test("facetMultiSelect: excluded tag lifts its filter for that facet only") {
    // "dog" matches docs 2,3,4 (roles user,assistant,user; tools
    // NULL,toolB,NULL). Filter rf: role = 'user'.
    //  - role facet excludes rf → counts the whole match set
    //  - tool facet applies rf → docs 2,4 remain, both NULL-tool → no rows
    val rows = IndexSearch.facetMultiSelect(idx, Seq(1 -> "dog"),
      Seq(("rf", col("role") === "user")),
      Seq(("role", Set("rf")), ("tool", Set.empty[String])))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSet
    assert(rows == Set(
      (1, "role", "user", 2L), (1, "role", "assistant", 1L)))
    // unknown excluded tag fails loudly (Solr silently no-ops — pinned)
    intercept[IllegalArgumentException] {
      IndexSearch.facetMultiSelect(idx, Seq(1 -> "dog"),
        Seq(("rf", col("role") === "user")), Seq(("role", Set("typo"))))
    }
  }

  test("searchReranked: head reshuffles within N, tail keeps first-pass order") {
    // "cat" matches docs 1,2 (dl 3, tied → doc_id order) then 3 (dl 7).
    // Rerank on "dog" (docs 2,3,4) with weight 10, N=2: doc 2 gains,
    // doc 1 does not → head flips to (2, 1); doc 3 stays rank 3 with its
    // first-pass score.
    val plain = IndexSearch.search(idx, Seq(1 -> "cat"), k = 3)
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(plain.map(_._2).toSeq == Seq(1L, 2L, 3L))
    val rr = IndexSearch.searchReranked(idx, Seq(1 -> "cat"), "dog",
      reRankDocs = 2, reRankWeight = 10.0, k = 3)
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(rr.map(_._2).toSeq == Seq(2L, 1L, 3L))
    // the boundary doc is bit-identical to the first pass
    assert(rr(2) == plain(2))
    // head docs are exactly the first-pass top-N set
    assert(rr.take(2).map(_._2).toSet == plain.take(2).map(_._2).toSet)
    // weight 0 degenerates to the first pass exactly
    val w0 = IndexSearch.searchReranked(idx, Seq(1 -> "cat"), "dog",
      reRankDocs = 2, reRankWeight = 0.0, k = 3)
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(w0.toSeq == plain.toSeq)
  }

  test("searchCollapsed: one head per group, expand excludes the head") {
    // "dog" matches docs 2,3,4; scores desc 2 > 3 > 4 (dl 3 < 7 < 9).
    // Groups: c1 = {2,3} head 2; c2 = {4} head 4. Expand: c1 → doc 3.
    val rows = IndexSearch.searchCollapsed(idx, Seq(1 -> "dog"), "conv_id",
      k = 5, expandRows = 2)
      .collect().map(r => (r.getInt(1), r.getString(2), r.getInt(3), r.getLong(4))).toSet
    assert(rows == Set(
      (1, "c1", 0, 2L), (2, "c2", 0, 4L), (1, "c1", 1, 3L)))
    // expandRows = 0 → heads only
    val heads = IndexSearch.searchCollapsed(idx, Seq(1 -> "dog"), "conv_id",
      k = 5, expandRows = 0)
      .collect().map(r => (r.getInt(1), r.getLong(4))).toSet
    assert(heads == Set((1, 2L), (2, 4L)))
  }

  test("significantTerms: hand-computed foreground lift, gates, tie-break") {
    // "bee" matches docs 0,1,2; fg_n = 3, N = 5.
    // lift = fg·5/(3·bg): ant 2/2 → 1.6667, apple 1/1 → 1.6667,
    // bee 3/3 → 1.6667, cat 2/3 → 1.1111, dog 1/3 → 0.5556.
    val rows = SignificantTerms.significantTerms(idx, Seq(1 -> "bee"),
      n = 10, minDf = 1L, minFgDf = 1L)
      .collect().map(r => (r.getInt(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(rows.map(_._2).toSeq == Seq("ant", "apple", "bee", "cat", "dog"))
    assert(rows.take(3).forall(_._5 == 1.6667))
    assert(rows(3) == ((4, "cat", 2L, 3L, 1.1111)))
    assert(rows(4) == ((5, "dog", 1L, 3L, 0.5556)))
    // minFgDf = 2 drops the fg-hapaxes (apple, dog)
    val gated = SignificantTerms.significantTerms(idx, Seq(1 -> "bee"),
      n = 10, minDf = 1L, minFgDf = 2L)
      .collect().map(_.getString(2)).toSet
    assert(gated == Set("ant", "bee", "cat"))
  }

  test("statsPercentiles: exact type-7 interpolation, NULL on empty spine") {
    // "dog" matched dl multiset {3,7,9}: p50 = 7, p90 = 7+0.8·2 = 8.6
    val rows = IndexSearch.statsPercentiles(idx,
      Seq(1 -> "dog", 2 -> "zzz"), "dl", Seq(50.0, 90.0))
      .collect().map(r => (r.getInt(0), r.getDouble(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
    assert(rows == Set(
      (1, 50.0, Some(7.0)), (1, 90.0, Some(8.6)),
      (2, 50.0, None), (2, 90.0, None)))
  }

  test("statsFacet: per-facet-value stats, observed buckets only") {
    // "dog" matches docs 2,3,4 — roles user(dl 3), assistant(dl 7),
    // user(dl 9); query 2 matches nothing → no buckets at all
    val rows = IndexSearch.statsFacet(idx,
      Seq(1 -> "dog", 2 -> "zzz"), "dl", "role")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getDouble(7))).toSet
    assert(rows == Set(
      (1, "user", 2L, 3L, 9L, 12L, 6.0),
      (1, "assistant", 1L, 7L, 7L, 7L, 7.0)))
  }

  test("groupedCounts: a group with two matched docs counts once") {
    val matched = Seq((1, 0L), (1, 1L), (1, 2L)).toDF("query_id", "doc_id")
    val attrs = Seq((0L, "x", "g1"), (1L, "x", "g1"), (2L, "x", "g2"),
      (3L, "x", "g3")).toDF("doc_id", "f", "g")
    val rows = Facets.groupedCounts(matched, attrs, "f", "g")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSet
    // 3 matched docs carry f=x but only 2 distinct groups
    assert(rows == Set((1, "x", 2L)))
  }

  test("facet.contains counts only values carrying the substring") {
    // "cat" matches docs 1,2,3 — tools toolA, NULL, toolB
    val both = IndexSearch.facetTop(idx, Seq(1 -> "cat"), "tool", 5,
      contains = Some("oo"))
      .collect().map(r => (r.getInt(1), r.getString(2), r.getLong(3))).toSet
    assert(both == Set((1, "toolA", 1L), (2, "toolB", 1L)))
    val one = IndexSearch.facetTop(idx, Seq(1 -> "cat"), "tool", 5,
      contains = Some("lA"))
      .collect().map(r => (r.getString(2))).toSet
    assert(one == Set("toolA"))
  }

  test("collate: rank-1 substitution per occurrence, kept tokens, hits") {
    import graft.search.SpellCheck
    // "bea" → bee (lev 1 beats hen's 2); in-dictionary and
    // candidate-less tokens keep themselves; duplicate occurrences both
    // substitute; hits = the corrected query's disjunctive match count
    val rows = SpellCheck.collate(idx, Seq(
        1 -> "bea dog", 2 -> "apple", 3 -> "zzzz", 4 -> "bea bea cat"),
      maxEdits = 2)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSet
    assert(rows == Set(
      (1, "bee dog", 5L),
      (2, "apple", 1L),
      (3, "zzzz", 0L),
      (4, "bee bee cat", 4L)))
  }

  test("termsRegex: partial match, (df DESC, term ASC) rank, no-match empty") {
    import graft.search.Suggest
    val rows = Suggest.termsRegex(idx,
      Seq(1 -> "^[ab]", 2 -> "u$", 3 -> "^zz"), n = 5)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2),
        r.getLong(3)))
    assert(rows.filter(_._1 == 1).toSeq ==
      Seq((1, 1, "bee", 3L), (1, 2, "ant", 2L), (1, 3, "apple", 1L)))
    // emu/gnu tie on df=2 → term ASC
    assert(rows.filter(_._1 == 2).map(r => (r._2, r._3)).toSeq ==
      Seq((1, "emu"), (2, "gnu")))
    assert(!rows.exists(_._1 == 3))
    // outside the portable subset fails loudly
    intercept[IllegalArgumentException](
      Suggest.termsRegex(idx, Seq(1 -> "a(?=b)"), 5))
  }
}
