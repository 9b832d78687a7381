package graft

import graft.index.BuildIndexJob
import graft.search.{IndexSearch, QueryResultCache}
import graft.sources.{Fs, Transcripts}

class QueryResultCacheSpec extends SparkSpec {

  private def fixtureIndex(): IndexSearch.OpenIndex = {
    val root = java.nio.file.Files.createTempDirectory("graftqrc").toString
    BuildIndexJob.run(spark, Transcripts.synthetic(spark, 300), root, "qrc1",
      BuildIndexJob.Config(numShards = 8, blockSize = 16, saltTarget = 64))
    IndexSearch.open(spark, root)
  }

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("query_id", "rank").collect().toSeq

  test("pages ≡ searchWand; window warmed once; round-up discipline") {
    val idx = fixtureIndex()
    val queries = Seq(1 -> "w1 w3 w17", 2 -> "w1 w2 w3 w4 w5", 3 -> "w2")

    // page 1 (need 5 → window 20): warms the entry
    val entry20 = QueryResultCache.entryPath(idx, queries, 20)
    assert(!Fs.exists(spark, s"$entry20/_SUCCESS"))
    val p1 = rows(QueryResultCache.search(idx, queries, k = 5))
    assert(Fs.exists(spark, s"$entry20/_SUCCESS"), "window-20 entry published")
    assert(p1 == rows(IndexSearch.searchWand(idx, queries, k = 5)))
    assert(p1.nonEmpty)

    // page 2 (need 10 → same window 20): served from cache, no rewrite
    val m1 = Fs.mtime(spark, entry20)
    val p2 = rows(QueryResultCache.search(idx, queries, k = 5, start = 5))
    assert(p2 == rows(IndexSearch.searchWand(idx, queries, k = 5, start = 5)))
    assert(Fs.mtime(spark, entry20) == m1, "page hit must not rewrite the window")

    // pages tile: window rows 1..10 = p1 ++ p2 per query
    val tiled = (p1 ++ p2).sortBy(r => (r.getInt(0), r.getInt(1)))
    val direct = rows(IndexSearch.searchWand(idx, queries, k = 10))
    assert(tiled == direct)

    // need 25 rounds UP to window 40 — a DIFFERENT entry
    val entry40 = QueryResultCache.entryPath(idx, queries, 40)
    assert(entry40 != entry20)
    val deep = rows(QueryResultCache.search(idx, queries, k = 5, start = 20))
    assert(Fs.exists(spark, s"$entry40/_SUCCESS"), "window-40 entry published")
    assert(deep == rows(IndexSearch.searchWand(idx, queries, k = 5, start = 20)))

    // a different batch gets a different key
    assert(QueryResultCache.entryPath(idx, Seq(1 -> "w1"), 20) != entry20)
  }
}
