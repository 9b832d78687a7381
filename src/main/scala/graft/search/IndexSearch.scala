package graft.search

import graft.index.{BuildIndexJob, PostingBlocks}
import graft.index.BuildIndexJob.IndexPaths
import graft.index.IndexBuild.Stats
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Query path over the PERSISTED index (SURVEY.md §3.2):
  *
  *  1. analyze queries with the same Analyzer;
  *  2. broadcast-join query terms with the dictionary (df, shard,
  *     max_score) — unknown terms drop out (Solr semantics);
  *  3. scan `postings/` pruned to only the shards the query terms hash to
  *     (partition pruning on the shard directory column);
  *  4. decode blocks (codegen'd varint expressions) → score → top-k.
  *
  * Must return exactly what [[Search.searchCorpus]] returns on the same
  * corpus — the IndexRoundtripSpec property.
  */
object IndexSearch {

  final case class OpenIndex(paths: IndexPaths, dictionary: DataFrame,
                             stats: Stats, spark: SparkSession)

  def open(spark: SparkSession, root: String): OpenIndex = {
    val p = IndexPaths(root)
    OpenIndex(p, spark.read.parquet(p.dictionary),
      BuildIndexJob.readStats(spark, p), spark)
  }

  def search(idx: OpenIndex, queries: Seq[(Int, String)], k: Int = 10,
             conjunctive: Boolean = false): DataFrame = {
    val spark = idx.spark
    val qt = Search.queryTerms(Search.queryFrame(spark, queries))
    // tiny join: |distinct query terms| rows
    val qd = qt.join(idx.dictionary, "term")
      .select("query_id", "term", "df", "shard")
    // driver boundary: the set of shards the query touches (≤ |q| ints)
    val shards = qd.select("shard").distinct().collect().map(_.getInt(0)).toSeq
    if (shards.isEmpty) {
      return Search.rank(
        qd.select(col("query_id"), lit(0L).as("doc_id"),
          lit(0.0).as("_score")).limit(0), k)
    }
    val blocks = spark.read.parquet(idx.paths.postings)
      .where(col("shard").isin(shards: _*))
      .join(broadcast(qd.select("query_id", "term", "df")), Seq("term"))
    val postings = PostingBlocks.decodePostings(blocks)
    val scored = postings
      .withColumn("_s", Bm25.termScore(col("tf"), col("dl"), col("df"),
        lit(idx.stats.nDocs), lit(idx.stats.avgdl)))
      .groupBy("query_id", "doc_id")
      .agg(sum(col("_s")).as("_score"), count(lit(1)).as("_n_matched"))
    val filtered =
      if (!conjunctive) scored
      else {
        val nq = qd.groupBy("query_id").agg(count(lit(1)).as("_n_q"))
        scored.join(broadcast(nq), "query_id")
          .where(col("_n_matched") === col("_n_q"))
      }
    Search.rank(filtered, k)
  }
}
