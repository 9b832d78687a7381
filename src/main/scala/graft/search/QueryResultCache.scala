package graft.search

import graft.sources.Fs
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Solr queryResultCache: ranked result PAGES served from a cached
  * ordered window. Solr caches, per (query, sort), the top
  * `queryResultWindowSize`-rounded doc-id list so that paging through
  * results (`start=`) hits the cache instead of re-running the search;
  * a request whose `start+rows` exceeds the cached window re-fetches a
  * LARGER window (rounded UP to the next windowSize multiple — Solr's
  * exact round-up discipline) and replaces nothing, since the bigger
  * window is a different key.
  *
  * Spark translation mirrors [[FilterCache]]: windows are parquet under
  * `<root>/queryresultcache/<md5(key)>/`, keyed by the canonical query
  * batch + the rounded window size; entries are immutable per index
  * root, so merges/compactions invalidate by unreachability. The cached
  * window carries ABSOLUTE ranks from the block-max WAND engine, so any
  * page inside the window is a rank predicate on a tiny cached relation
  * — O(window), never a posting traversal.
  */
object QueryResultCache {

  /** Canonical cache key: the query batch in query_id order plus the
    * rounded window — ranks depend on the whole batch's text, nothing
    * else (scores are corpus-determined, and the corpus is the root). */
  def fingerprint(queries: Seq[(Int, String)], window: Int): String = {
    val canon = queries.sortBy(_._1)
      .map { case (id, t) => s"$id:${t.trim}" }.mkString("|") +
      s"|w=$window"
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(canon.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  def entryPath(idx: IndexSearch.OpenIndex, queries: Seq[(Int, String)],
                window: Int): String =
    s"${idx.paths.root}/queryresultcache/${fingerprint(queries, window)}"

  /** Page (start, k] of the batch's BM25 ranking through the cache.
    * The fetched window is `start+k` rounded up to a `windowSize`
    * multiple; any later page inside the same rounded window is served
    * from the cached relation without touching the index. Output is
    * identical to `IndexSearch.searchWand(idx, queries, k, start=start)`
    * (the cached window IS that engine's output at the window size). */
  def search(idx: IndexSearch.OpenIndex, queries: Seq[(Int, String)],
             k: Int = 10, start: Int = 0,
             windowSize: Int = 20): DataFrame = {
    require(k > 0 && start >= 0 && windowSize > 0)
    val need = start + k
    val window = ((need + windowSize - 1) / windowSize) * windowSize
    val spark = idx.spark
    val path = entryPath(idx, queries, window)
    if (!Fs.exists(spark, s"$path/_SUCCESS")) {
      IndexSearch.searchWand(idx, queries, k = window)
        .write.mode("overwrite").parquet(path)
    }
    spark.read.parquet(path)
      .where(col("rank") > start && col("rank") <= need)
      .orderBy("query_id", "rank")
  }
}
