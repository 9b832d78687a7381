package graft

import graft.index.BuildIndexJob
import graft.search.IndexSearch
import org.apache.spark.sql.functions._

/** Prefix-query expansion ([[IndexSearch.searchPrefix]]) and
  * sort-by-stored-field results ([[IndexSearch.searchSorted]]). */
class PrefixSortSpec extends SparkSpec {
  import spark.implicits._

  def tmp(): String = java.nio.file.Files.createTempDirectory("graftps").toString
  def ts(i: Int) = new java.sql.Timestamp(1704067200000L + i * 1000L)

  // ts ties between docs 0 and 1 exercise the doc_id tie-break in sorting
  lazy val idx: IndexSearch.OpenIndex = {
    val turns = Seq(
      ("c0", 0, "user", "apple ant bee", null.asInstanceOf[String], ts(5)),
      ("c1", 0, "user", "ant bee cat", null.asInstanceOf[String], ts(5)),
      ("c2", 0, "user", "bee cat dog", null.asInstanceOf[String], ts(9)),
      ("c3", 0, "user", "cat dog emu", null.asInstanceOf[String], ts(1)))
      .toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
    val root = tmp()
    BuildIndexJob.run(spark, turns, root, "ps", BuildIndexJob.Config(numShards = 4))
    IndexSearch.open(spark, root)
  }

  test("prefix expands against the dictionary ≡ the hand-expanded disjunction") {
    // a* → {ant, apple}; the scoring-boolean rewrite must equal the plain
    // disjunctive query over the expanded terms (each with its own idf)
    val got = IndexSearch.searchPrefix(idx, Seq(1 -> "a* dog"))
      .orderBy("rank").collect().toSeq
    val want = IndexSearch.search(idx, Seq(1 -> "ant apple dog"))
      .orderBy("rank").collect().toSeq
    assert(got == want && got.nonEmpty)
    // prefix matching nothing contributes nothing; no terms at all → empty
    assert(IndexSearch.searchPrefix(idx, Seq(1 -> "zz*")).count() == 0)
    // multi-token stem: "bee-ca*" → literal term 'bee' + prefix 'ca'
    val mixed = IndexSearch.searchPrefix(idx, Seq(1 -> "bee-ca*"))
      .orderBy("rank").collect().toSeq
    val mixedWant = IndexSearch.search(idx, Seq(1 -> "bee cat"))
      .orderBy("rank").collect().toSeq
    assert(mixed == mixedWant)
  }

  test("over-broad prefix fails loudly at maxExpansions (TooManyClauses analog)") {
    val e = intercept[IllegalArgumentException](
      IndexSearch.searchPrefix(idx, Seq(1 -> "a*"), maxExpansions = 1))
    assert(e.getMessage.contains("maxExpansions"))
  }

  test("searchSorted ranks by the stored field desc with doc_id tie-break") {
    val res = IndexSearch.searchSorted(idx, Seq(1 -> "bee"),
      Seq(col("ts").desc), 10).orderBy("rank").collect()
    // bee matches docs 0,1,2; ts desc → doc 2 (ts 9) first, then the
    // ts-tied pair 0,1 in doc_id order
    assert(res.map(_.getLong(2)).toSeq == Seq(2L, 0L, 1L))
    // scores still reported and equal to the score-ranked engine's values
    val byScore = IndexSearch.search(idx, Seq(1 -> "bee")).collect()
      .map(r => r.getLong(2) -> r.getDouble(3)).toMap
    assert(res.forall(r => byScore(r.getLong(2)) == r.getDouble(3)))
  }

  test("fl field list: ranking ≡ plain search, stored + pseudo fields carried") {
    val qs = Seq(1 -> "bee cat", 2 -> "ant")
    val fl = IndexSearch.searchFields(idx, qs,
      fields = Seq("role", "dl"), pseudo = Seq("dl2" -> "product(dl,2)"))
      .orderBy("query_id", "rank").collect()
    val plain = IndexSearch.search(idx, qs)
      .orderBy("query_id", "rank").collect()
    // same ranking and scores, response shaped with the extra columns
    assert(fl.map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSeq ==
      plain.map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSeq)
    assert(fl.map(_.getAs[Double]("score")).toSeq ==
      plain.map(_.getAs[Double]("score")).toSeq)
    assert(fl.forall(r => r.getAs[String]("role") == "user" &&
      r.getAs[Double]("dl2") == 2.0 * r.getAs[Int]("dl")))
  }

  test("pseudo-relevance feedback mines top-hit terms and widens the match set") {
    // corpus: 0=apple ant bee, 1=ant bee cat, 2=bee cat dog, 3=cat dog emu.
    // "bee" feedback docs = {0,1,2}; expansion weights (tf/dl): ant=2/3,
    // cat=2/3, apple=1/3, dog=1/3 → top-2 = {ant, cat} (term-asc tie on
    // the rounded weight). cat pulls doc 3 into the final match set.
    def docsOf(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.collect().map(_.getLong(2)).toSet
    val plain = docsOf(IndexSearch.search(idx, Seq(1 -> "bee")))
    assert(plain == Set(0L, 1L, 2L))
    val fb2 = docsOf(IndexSearch.searchFeedback(idx, Seq(1 -> "bee"),
      fbDocs = 3, fbTerms = 2))
    assert(fb2 == Set(0L, 1L, 2L, 3L), s"expansion must reach doc 3: $fb2")
    // fbTerms=1 keeps only 'ant' (tie broken by term ASC) — doc 3 stays out
    val fb1 = docsOf(IndexSearch.searchFeedback(idx, Seq(1 -> "bee"),
      fbDocs = 3, fbTerms = 1))
    assert(fb1 == Set(0L, 1L, 2L), s"ant-only expansion: $fb1")
    // a zero-match query expands nothing and stays empty
    assert(docsOf(IndexSearch.searchFeedback(idx, Seq(1 -> "zzznope"))).isEmpty)
  }
}
