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
}
