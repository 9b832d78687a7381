package graft

import graft.index.BuildIndexJob
import graft.search.{IndexSearch, Search}
import graft.sources.{QuerySet, Transcripts}

/** Frozen top-k regression fixtures (SURVEY.md §5.4, FIXTURES.md §C/§E):
  * the seed-42 synthetic corpus must keep returning exactly these results
  * across engine revisions — any analyzer, scoring, ranking, codec, or
  * doc-id change that perturbs them is a behavioral break, not a
  * refactor. Two layers: a small in-code table (readable diff at review
  * time) and the on-disk artifacts under fixtures/ (50-query §C set +
  * golden top-10 parquet, regenerated only by an intentional
  * `runMain graft.Freeze`). */
class GoldenSpec extends SparkSpec {

  lazy val root: String = {
    val r = java.nio.file.Files.createTempDirectory("graftgold").toString
    BuildIndexJob.run(spark, Transcripts.synthetic(spark, 200), r, "g",
      BuildIndexJob.Config(numShards = 8, blockSize = 32))
    r
  }

  def rows(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("query_id", "rank").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq

  val queries = Seq(1 -> "w1 w3 w17", 2 -> "zzzrareone",
    3 -> "w7 w70 w700", 4 -> "w2 w4")

  // (query_id, rank, doc_id, score) frozen 2026-08-16 (round 1)
  val golden = Seq(
    (1, 1, 746L, 1.0658),
    (1, 2, 811L, 1.0587),
    (1, 3, 1142L, 1.0279),
    (1, 4, 1534L, 1.0173),
    (1, 5, 355L, 1.0158),
    (2, 1, 0L, 2.9554),
    (3, 1, 1542L, 3.2086),
    (3, 2, 1551L, 2.7465),
    (3, 3, 81L, 2.733),
    (3, 4, 1658L, 2.656),
    (3, 5, 67L, 2.632),
    (4, 1, 819L, 0.3758),
    (4, 2, 1344L, 0.364),
    (4, 3, 33L, 0.3636),
    (4, 4, 952L, 0.3557),
    (4, 5, 447L, 0.3513))

  test("golden top-k: WAND and exhaustive both reproduce the frozen results") {
    val idx = IndexSearch.open(spark, root)
    assert(rows(IndexSearch.searchWand(idx, queries, 5)) == golden, "WAND")
    assert(rows(IndexSearch.search(idx, queries, 5)) == golden, "exhaustive")
    val corpus = spark.read.parquet(s"$root/docs").select("doc_id", "text")
    assert(rows(Search.searchCorpus(corpus, queries, 5)) == golden, "inline")
  }

  test("fixtures/: frozen 50-query set ≡ generator; engine reproduces golden parquet") {
    val qPath = "fixtures/queries_seed42.parquet"
    val gPath = "fixtures/golden/topk_seed42.parquet"
    assert(new java.io.File(qPath).exists, s"missing artifact $qPath — run graft.Freeze")
    assert(new java.io.File(gPath).exists, s"missing artifact $gPath — run graft.Freeze")
    val fromDisk = spark.read.parquet(qPath).orderBy("query_id")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(fromDisk == QuerySet.reference,
      "queries_seed42.parquet drifted from QuerySet.reference")
    val want = rows(spark.read.parquet(gPath))
    val idx = IndexSearch.open(spark, root)
    assert(rows(IndexSearch.search(idx, QuerySet.reference, 10)) == want,
      "exhaustive vs golden parquet")
    assert(rows(IndexSearch.searchWand(idx, QuerySet.reference, 10)) == want,
      "WAND vs golden parquet")
    assert(want.nonEmpty)
  }
}
