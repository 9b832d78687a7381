package graft

import graft.index.BuildIndexJob
import graft.search.{IndexSearch, Similarities}
import graft.sources.Transcripts

class SimilarityModelSpec extends SparkSpec {

  private def fixtureIndex(): IndexSearch.OpenIndex = {
    val root = java.nio.file.Files.createTempDirectory("graftsim").toString
    BuildIndexJob.run(spark, Transcripts.synthetic(spark, 300), root, "sim1",
      BuildIndexJob.Config(numShards = 8, blockSize = 16, saltTarget = 64))
    IndexSearch.open(spark, root)
  }

  test("LMDirichlet ranking ≡ driver-side recompute from raw postings") {
    val idx = fixtureIndex()
    val queries = Seq(1 -> "w1 w3 w17", 2 -> "zzzrareone", 3 -> "w1 w2 w3")
    val mu = 2000.0
    // independent expectation straight from the decoded scoring relation
    val rel = spark.read.parquet(s"${idx.paths.root}/postings")
    val posts = graft.index.PostingBlocks.decodePostings(
        rel.join(idx.dictionary.select("term", "cf"), "term"))
      .select("term", "doc_id", "tf", "dl", "cf").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getInt(3), r.getLong(4)))
    val total = idx.stats.totalTokens
    def lmScore(tf: Int, dl: Int, cf: Long): Double = {
      val p = (cf + 1.0) / (total + 1.0)
      val s = math.log(1.0 + tf / (mu * p)) + math.log(mu / (dl + mu))
      math.max(0.0, s)
    }
    val got = IndexSearch.searchSim(idx, queries, Similarities.LMDirichlet(mu))
      .orderBy("query_id", "rank").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    val want = queries.flatMap { case (qid, text) =>
      val terms = graft.analysis.Analyzer.tokenize(text).distinct.toSet
      val byDoc = posts.filter(p => terms(p._1)).groupBy(_._2)
        .map { case (d, ps) => d -> ps.map(p => lmScore(p._3, p._4, p._5)).sum }
      byDoc.toSeq
        .sortBy { case (d, s) =>
          (-graft.search.BlockMaxWand.round(s, graft.search.Bm25.RankScale), d) }
        .take(10).zipWithIndex
        .map { case ((d, s), i) =>
          (qid, i + 1, d, graft.search.BlockMaxWand.round(s, graft.search.Bm25.OutScale)) }
    }
    assert(got == want)
    // the clamp is exercised: some (term, doc) in the fixture must go
    // negative pre-clamp (hot short term in a long doc), else the test
    // wouldn't distinguish clamped from unclamped
    assert(posts.exists { p =>
      val pr = (p._5 + 1.0) / (total + 1.0)
      math.log(1.0 + p._3 / (mu * pr)) + math.log(mu / (p._4 + mu)) < 0.0
    }, "fixture must contain a negative pre-clamp LM term score")
  }

  test("ClassicTfIdf ranking ≡ driver-side recompute; differs from BM25") {
    val idx = fixtureIndex()
    val queries = Seq(1 -> "w1 w3 w17", 2 -> "w2 w5")
    val rel = spark.read.parquet(s"${idx.paths.root}/postings")
    val posts = graft.index.PostingBlocks.decodePostings(
        rel.join(idx.dictionary.select("term", "df"), "term"))
      .select("term", "doc_id", "tf", "dl", "df").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getInt(3), r.getLong(4)))
    val n = idx.stats.nDocs
    def tfidf(tf: Int, dl: Int, df: Long): Double = {
      val idf = 1.0 + math.log((n + 1.0) / (df + 1.0))
      math.sqrt(tf.toDouble) * (idf * idf) / math.sqrt(dl.toDouble)
    }
    val got = IndexSearch.searchSim(idx, queries, Similarities.ClassicTfIdf)
      .orderBy("query_id", "rank").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    val want = queries.flatMap { case (qid, text) =>
      val terms = graft.analysis.Analyzer.tokenize(text).distinct.toSet
      val byDoc = posts.filter(p => terms(p._1)).groupBy(_._2)
        .map { case (d, ps) => d -> ps.map(p => tfidf(p._3, p._4, p._5)).sum }
      byDoc.toSeq
        .sortBy { case (d, s) =>
          (-graft.search.BlockMaxWand.round(s, graft.search.Bm25.RankScale), d) }
        .take(10).zipWithIndex
        .map { case ((d, s), i) =>
          (qid, i + 1, d, graft.search.BlockMaxWand.round(s, graft.search.Bm25.OutScale)) }
    }
    assert(got == want)
    // sanity: the model is actually different from BM25 on this corpus
    val bm = IndexSearch.search(idx, queries)
      .orderBy("query_id", "rank").collect().map(r => r.getDouble(3)).toSeq
    val cl = got.map(_._4)
    assert(bm != cl, "ClassicTfIdf must not reproduce BM25 scores")
  }
}
