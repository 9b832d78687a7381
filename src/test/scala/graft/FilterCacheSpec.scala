package graft

import graft.index.BuildIndexJob
import graft.search.{FilterCache, FilterQuery, IndexSearch}
import graft.sources.{Fs, Transcripts}
import org.apache.spark.sql.functions.col

class FilterCacheSpec extends SparkSpec {

  private def fixtureIndex(): IndexSearch.OpenIndex = {
    val root = java.nio.file.Files.createTempDirectory("graftfc").toString
    BuildIndexJob.run(spark, Transcripts.synthetic(spark, 300), root, "fc1",
      BuildIndexJob.Config(numShards = 8, blockSize = 16, saltTarget = 64))
    IndexSearch.open(spark, root)
  }

  test("docSet: populate-once, serve-from-cache, _SUCCESS discipline") {
    val idx = fixtureIndex()
    val fq = "role:user"
    val entry = FilterCache.entryPath(idx, fq)
    assert(!Fs.exists(spark, s"$entry/_SUCCESS"), "cache starts cold")

    val first = FilterCache.docSet(idx, fq).collect().map(_.getLong(0)).sorted
    assert(Fs.exists(spark, s"$entry/_SUCCESS"), "entry published")
    assert(Fs.readString(spark, s"$entry/_fq") == fq, "_fq sidecar")
    // cached DocSet ≡ a fresh predicate evaluation over the attrs scan
    val fresh = idx.io.read(spark, idx.paths.docs)
      .where(FilterQuery.parse(fq)).select("doc_id")
      .collect().map(_.getLong(0)).sorted
    assert(first.toSeq == fresh.toSeq)
    assert(first.nonEmpty)

    // second use must NOT recompute: the entry's bytes stay untouched
    val m1 = Fs.mtime(spark, entry)
    val second = FilterCache.docSet(idx, fq).collect().map(_.getLong(0)).sorted
    assert(second.toSeq == first.toSeq)
    assert(Fs.mtime(spark, entry) == m1, "warm hit must not rewrite the entry")

    // a torn entry (no _SUCCESS — crashed writer) is treated as absent
    Fs.delete(spark, s"$entry/_SUCCESS")
    val healed = FilterCache.docSet(idx, fq).collect().map(_.getLong(0)).sorted
    assert(healed.toSeq == first.toSeq)
    assert(Fs.exists(spark, s"$entry/_SUCCESS"), "entry republished")
  }

  test("searchFiltered through the cache ≡ the predicate fq engine") {
    val idx = fixtureIndex()
    val queries = Seq(1 -> "w1 w3 w17", 2 -> "w2 w5", 3 -> "qqqnotthere")
    val direct = IndexSearch.searchFiltered(idx, queries, col("role") === "user")
      .orderBy("query_id", "rank").collect().toSeq
    val cold = FilterCache.searchFiltered(idx, queries, "role:user")
      .orderBy("query_id", "rank").collect().toSeq
    val warm = FilterCache.searchFiltered(idx, queries, "role:user")
      .orderBy("query_id", "rank").collect().toSeq
    assert(cold == direct)
    assert(warm == direct)
    assert(direct.nonEmpty)
    // distinct fq strings get distinct entries
    assert(FilterCache.entryPath(idx, "role:user") !=
      FilterCache.entryPath(idx, "role:assistant"))
    val other = FilterCache.searchFiltered(idx, queries, "role:assistant")
      .orderBy("query_id", "rank").collect().toSeq
    val otherDirect = IndexSearch.searchFiltered(idx, queries,
      col("role") === "assistant")
      .orderBy("query_id", "rank").collect().toSeq
    assert(other == otherDirect)
  }
}
