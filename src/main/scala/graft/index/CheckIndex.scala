package graft.index

import graft.search.IndexSearch
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Lucene CheckIndex analog: a one-row integrity report over a persisted
  * index, recomputed from the PHYSICAL artifacts. Every posting block is
  * DECODED (the same codegen'd varint/delta-gap path queries use — nothing
  * is trusted from block metadata) and cross-checked against the
  * dictionary, the docs sidecar, and the broadcast stats row:
  *
  *   - `postings_match` — Σ decoded posting entries ≡ Σ dictionary df,
  *     Σ decoded tf ≡ Σ dictionary cf, distinct posting terms ≡ dictionary
  *     size (no dangling or missing posting lists)
  *   - `docs_dense` — doc ids are exactly 0..n_docs−1 (the two-phase
  *     dense-id invariant every rank tie-break depends on)
  *   - `norms_match` — every decoded (doc_id, dl) norm pair exists in the
  *     docs sidecar and Σ dl ≡ Σ cf (total-token identity)
  *   - `stats_ok` — the stats row agrees with the recount
  *
  * Scale shape: two full scans (docs is a 2-column pruned projection;
  * postings decode is block-parallel) feeding map-side partial aggregates
  * to ONE row each, plus one ≤ n_docs-row distinct-norms anti-join — the
  * classic offline fsck jobs a 10^12-turn index runs after every build.
  * CheckIndex is deliberately exhaustive; it is a verification tool, not a
  * query path.
  */
object CheckIndex {

  def run(idx: IndexSearch.OpenIndex): DataFrame = {
    val spark = idx.spark
    val dictAgg = idx.dictionary.agg(
      count(lit(1)).as("n_terms"),
      sum("df").cast("long").as("total_df"),
      sum("cf").cast("long").as("total_cf"))
    val docs = idx.io.read(spark, idx.paths.docs).select("doc_id", "dl")
    val docsAgg = docs.agg(
      count(lit(1)).as("n_docs"),
      max("doc_id").cast("long").as("max_doc"),
      sum("dl").cast("long").as("dl_sum"))
    val decoded = PostingBlocks.decodePostings(
      idx.io.read(spark, idx.paths.postings)
        .select("term", "doc_gaps", "tfs", "dls"))
    val postAgg = decoded.agg(
      countDistinct("term").as("postings_terms"),
      count(lit(1)).as("postings_df"),
      sum("tf").cast("long").as("postings_cf"))
    // decoded norms are ≤ n_docs distinct (doc_id, dl) pairs; any pair the
    // docs sidecar doesn't carry is a corrupt norm stream
    val normBad = decoded.select("doc_id", "dl").distinct()
      .join(docs, Seq("doc_id", "dl"), "left_anti")
      .agg(count(lit(1)).as("_norm_bad"))
    dictAgg.crossJoin(docsAgg).crossJoin(postAgg).crossJoin(normBad)
      .select(
        col("n_terms"), col("total_df"), col("total_cf"),
        col("postings_terms"), col("postings_df"), col("postings_cf"),
        col("n_docs"), col("max_doc"), col("dl_sum"),
        (col("postings_df") === col("total_df") &&
          col("postings_cf") === col("total_cf") &&
          col("postings_terms") === col("n_terms")).as("postings_match"),
        (col("n_docs") === col("max_doc") + 1).as("docs_dense"),
        (col("_norm_bad") === 0 &&
          col("dl_sum") === col("total_cf")).as("norms_match"),
        (lit(idx.stats.nDocs) === col("n_docs") &&
          lit(idx.stats.totalTokens) === col("total_cf")).as("stats_ok"))
      .withColumn("ok", col("postings_match") && col("docs_dense") &&
        col("norms_match") && col("stats_ok"))
  }
}
