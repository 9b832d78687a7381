package graft

import graft.search.MultiField
import org.apache.spark.sql.functions._

/** Solr qf multi-field scoring: per-field stats and boost ordering. */
class MultiFieldSpec extends SparkSpec {
  import spark.implicits._

  // fields crafted so "apple" scores IDENTICALLY in either field (same
  // tf/df/docCount, and dl/avgdl = 1 within each field) — any rank gap is
  // then purely the boost
  lazy val corpus = Seq(
    (0L, "apple pie", "pear tart plum cake"),    // apple in title only
    (1L, "pear tart", "apple pie plum cake"),    // apple in body only
    (2L, "plum cake", "pear tart banana split")) // no apple
    .toDF("doc_id", "title", "body")

  test("qf boost: title^2 outranks an identical body match") {
    val res = MultiField.searchFields(corpus,
      Seq("title" -> 2.0, "body" -> 1.0), Seq(1 -> "apple"))
      .orderBy("rank").collect()
    assert(res.map(_.getLong(2)).toSeq == Seq(0L, 1L))
    assert(res(0).getDouble(3) > res(1).getDouble(3))
  }

  test("qf boost ordering: flipping the boosts flips the ranking") {
    val res = MultiField.searchFields(corpus,
      Seq("title" -> 1.0, "body" -> 4.0), Seq(1 -> "apple"))
      .orderBy("rank").collect()
    assert(res.map(_.getLong(2)).toSeq == Seq(1L, 0L))
  }

  test("per-field docCount: a term matching both fields sums both scores") {
    val c = Seq(
      (0L, "apple", "apple plum"),
      (1L, "pear", "plum cake"))
      .toDF("doc_id", "title", "body")
    val both = MultiField.searchFields(c,
      Seq("title" -> 1.0, "body" -> 1.0), Seq(1 -> "apple"))
      .orderBy("rank").collect()
    val titleOnly = MultiField.searchFields(c,
      Seq("title" -> 1.0), Seq(1 -> "apple"))
      .orderBy("rank").collect()
    assert(both.head.getLong(2) == 0L && titleOnly.head.getLong(2) == 0L)
    assert(both.head.getDouble(3) > titleOnly.head.getDouble(3),
      "the body field's contribution must add on top of the title's")
  }

  test("BM25F: single field at weight 1 ≡ the single-field engine") {
    val single = graft.search.Search.searchCorpus(
      corpus.select(col("doc_id"), col("body").as("text")),
      Seq(1 -> "plum cake", 2 -> "apple"), 10).collect().toSeq
    val combined = MultiField.searchCombined(
      corpus, Seq("body" -> 1.0), Seq(1 -> "plum cake", 2 -> "apple"))
      .collect().toSeq
    assert(combined.map(r => (r.getInt(0), r.getInt(1), r.getLong(2))) ==
      single.map(r => (r.getInt(0), r.getInt(1), r.getLong(2))))
    assert(combined.map(_.getDouble(3)) == single.map(_.getDouble(3)),
      "weight-1 single-field BM25F must be BIT-identical to plain BM25")
  }

  test("BM25F: cross-field occurrences saturate together, not per field") {
    // 'apple' twice in doc 0 (once per field) vs twice in doc 1's body
    // alone: combined tf' = 2 in BOTH docs and dl' is equal, so BM25F
    // must TIE them (doc_id ASC breaks it) — while the qf-sum engine
    // scores doc 0 higher (two unsaturated per-field contributions)
    val c = Seq(
      (0L, "apple pear", "apple plum"),
      (1L, "pear plum", "apple apple"))
      .toDF("doc_id", "title", "body")
    val f = MultiField.searchCombined(c,
      Seq("title" -> 1.0, "body" -> 1.0), Seq(1 -> "apple"))
      .orderBy("rank").collect()
    assert(f.map(_.getLong(2)).toSeq == Seq(0L, 1L))
    assert(f(0).getDouble(3) == f(1).getDouble(3),
      "equal combined tf'/dl' must produce equal BM25F scores")
    val s = MultiField.searchFields(c,
      Seq("title" -> 1.0, "body" -> 1.0), Seq(1 -> "apple"))
      .orderBy("rank").collect()
    assert(s(0).getLong(2) == 0L && s(0).getDouble(3) > s(1).getDouble(3),
      "the qf-sum combiner must rank the field-spread doc strictly higher")
  }

  test("BM25F: field weight scales tf' (title^2 beats body tf 2)") {
    // doc 0: one title hit at w=2 → tf' = 2, dl' = 2·2+2 = 6
    // doc 1: two body hits at w=1 → tf' = 2, dl' = 2·2+2 = 6 — a tie by
    // construction; raising the title weight to 3 breaks it toward doc 0
    val c = Seq(
      (0L, "apple pear", "plum cake"),
      (1L, "pear plum", "apple apple"))
      .toDF("doc_id", "title", "body")
    val tie = MultiField.searchCombined(c,
      Seq("title" -> 2.0, "body" -> 1.0), Seq(1 -> "apple"))
      .orderBy("rank").collect()
    assert(tie(0).getDouble(3) == tie(1).getDouble(3))
    val broken = MultiField.searchCombined(c,
      Seq("title" -> 3.0, "body" -> 1.0), Seq(1 -> "apple"))
      .orderBy("rank").collect()
    assert(broken.head.getLong(2) == 0L &&
      broken(0).getDouble(3) > broken(1).getDouble(3))
  }
}
