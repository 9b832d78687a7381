package graft

import graft.index.BuildIndexJob
import graft.search.IndexSearch
import org.apache.spark.sql.functions._

/** Multi-field / facet.query / facet.range composition
  * ([[graft.search.Facets]] via the IndexSearch wrappers): single-field
  * equivalence with the historical facetCounts, NULL-exclusion, the
  * zero-filled spines, and out-of-range exclusion. */
class FacetSpec extends SparkSpec {
  import spark.implicits._

  def tmp(): String = java.nio.file.Files.createTempDirectory("graftfc").toString
  def ts(i: Int) = new java.sql.Timestamp(1704067200000L + i * 1000L)

  // doc_ids 0..4 in (conv_id, turn_idx) order; dl = 3,3,3,7,9
  lazy val idx: IndexSearch.OpenIndex = {
    val turns = Seq(
      ("c0", 0, "user", "apple ant bee", null.asInstanceOf[String], ts(0)),
      ("c0", 1, "assistant", "ant bee cat", "toolA", ts(1)),
      ("c1", 0, "user", "bee cat dog", null.asInstanceOf[String], ts(2)),
      ("c1", 1, "assistant", "cat dog emu fox gnu hen ibis", "toolB", ts(3)),
      ("c2", 0, "user", "dog emu fox gnu hen ibis jay kit lark", null.asInstanceOf[String], ts(4)))
      .toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
    val root = tmp()
    BuildIndexJob.run(spark, turns, root, "fc", BuildIndexJob.Config(numShards = 4))
    IndexSearch.open(spark, root)
  }

  test("single-field facetFields ≡ facetCounts with the field label") {
    val qs = Seq(1 -> "bee", 2 -> "dog")
    val got = IndexSearch.facetFields(idx, qs, Seq("role"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    val want = IndexSearch.facetCounts(idx, qs, "role")
      .collect().map(r => (r.getInt(0), "role", r.getString(1), r.getLong(2))).toSeq
    assert(got == want && got.nonEmpty)
  }

  test("multi-field request counts both fields from one match set; NULLs uncounted") {
    // bee matches docs 0,1,2 → roles user×2 + assistant×1; tools: only
    // doc 1 carries one (toolA) — the two NULL-tool matches are absent
    val rows = IndexSearch.facetFields(idx, Seq(1 -> "bee"), Seq("role", "tool"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSet
    assert(rows == Set(
      (1, "role", "assistant", 1L), (1, "role", "user", 2L),
      (1, "tool", "toolA", 1L)))
  }

  test("facet.mincount drops buckets below the threshold post-agg") {
    // bee matches docs 0,1,2 → role buckets user×2, assistant×1
    val qs = Seq(1 -> "bee")
    val all = IndexSearch.facetFields(idx, qs, Seq("role"))
      .collect().map(r => (r.getString(2), r.getLong(3))).toSet
    assert(all == Set(("user", 2L), ("assistant", 1L)))
    val pruned = IndexSearch.facetFields(idx, qs, Seq("role"), mincount = 2L)
      .collect().map(r => (r.getString(2), r.getLong(3))).toSet
    assert(pruned == Set(("user", 2L)))
    // mincount=0 keeps everything (the historical default, bit-identical)
    val zero = IndexSearch.facetFields(idx, qs, Seq("role"), mincount = 0L)
      .collect().map(r => (r.getString(2), r.getLong(3))).toSet
    assert(zero == all)
    intercept[IllegalArgumentException](
      IndexSearch.facetFields(idx, qs, Seq("role"), mincount = -1L))
  }

  test("facet.query zero-fills the (query × predicate) spine") {
    val named = Seq(
      "assist" -> (col("role") === "assistant"),
      "has_tool" -> col("tool").isNotNull,
      "long" -> (col("dl") >= 5))
    // query 2 matches nothing at all — its rows must still appear, zeroed
    val rows = IndexSearch.facetQueries(idx, Seq(1 -> "bee", 2 -> "zzz"), named)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    assert(rows == Seq(
      (1, "assist", 1L), (1, "has_tool", 1L), (1, "long", 0L),
      (2, "assist", 0L), (2, "has_tool", 0L), (2, "long", 0L)))
  }

  test("facet.range buckets with full spine, zero gaps, out-of-range excluded") {
    // dog matches docs 2 (dl 3), 3 (dl 7), 4 (dl 9); buckets [0,8) by 2 →
    // dl 3 → bucket 2, dl 7 → bucket 6, dl 9 outside [0,8) uncounted
    val rows = IndexSearch.facetRange(idx, Seq(1 -> "dog", 2 -> "zzz"),
        "dl", 0L, 8L, 2L)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows == Seq(
      (1, 0L, 0L), (1, 2L, 1L), (1, 4L, 0L), (1, 6L, 1L),
      (2, 0L, 0L), (2, 2L, 0L), (2, 4L, 0L), (2, 6L, 0L)))
  }

  test("jsonRange: metrics ride the buckets; empty buckets typed-NULL") {
    import graft.search.Facets
    val metrics = Seq(Facets.MetricSum("sum_turn", "turn_idx"),
      Facets.MetricAvg("avg_dl", "dl"))
    // dog matches docs 2 (dl 3, turn 0), 3 (dl 7, turn 1), 4 (dl 9, turn 0);
    // buckets [0,8) by 4 → dl 3 → bucket 0, dl 7 → bucket 4, dl 9 excluded
    val rows = IndexSearch.facetJsonRange(idx, Seq(1 -> "dog", 2 -> "zzz"),
        "dl", 0L, 8L, 4L, metrics)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) null else java.lang.Long.valueOf(r.getLong(3)),
        if (r.isNullAt(4)) null else java.lang.Double.valueOf(r.getDouble(4)))).toSeq
    assert(rows == Seq(
      (1, 0L, 1L, 0L, 3.0), (1, 4L, 1L, 1L, 7.0),
      (2, 0L, 0L, null, null), (2, 4L, 0L, null, null)))
    // duplicate metric names and degenerate ranges fail loudly
    intercept[IllegalArgumentException](IndexSearch.facetJsonRange(idx,
      Seq(1 -> "dog"), "dl", 0L, 8L, 4L,
      Seq(Facets.MetricSum("m", "dl"), Facets.MetricMax("m", "dl"))))
    intercept[IllegalArgumentException](IndexSearch.facetJsonRange(idx,
      Seq(1 -> "dog"), "dl", 8L, 0L, 4L, metrics))
  }

  test("responseStats: numFound + ngroups, zero-filled spine") {
    // bee → docs 0,1,2 over convs c0,c0,c1; zzz matches nothing;
    // lark → doc 4 (conv c2)
    val got = IndexSearch.responseStats(idx,
      Seq(1 -> "bee", 2 -> "zzz", 3 -> "lark"), "conv_id")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((1, 3L, 2L), (2, 0L, 0L), (3, 1L, 1L)))
  }
}
