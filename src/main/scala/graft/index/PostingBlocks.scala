package graft.index

import graft.index.IndexBuild.Stats
import graft.search.Bm25
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Posting-list physical layout (SURVEY.md §4.2): per (shard, term), doc-id
  * sorted postings split into fixed-size blocks (default 128 — Lucene's
  * postings block size [PUB]), each block stored as
  *
  *   (shard, term, block_id, first_doc, doc_gaps:binary, tfs:binary,
  *    dls:binary, block_max_score:double, block_len:int)
  *
  * doc_gaps is delta-gap + varint compressed; first_doc duplicates the
  * block's first id so block-max WAND can seek without decoding.
  * block_max_score is the max BM25 term score within the block (Block-Max
  * WAND, Ding & Suel SIGIR 2011 [PUB]); dl rides inside the block so
  * query-time scoring never joins the docs table.
  */
object PostingBlocks {

  final val DefaultBlockSize = 128

  def shardOf(termCol: org.apache.spark.sql.Column, numShards: Int) =
    pmod(xxhash64(termCol), lit(numShards)).cast("int")

  /** Build encoded blocks from the scoring relation.
    * @param tfdl (term, doc_id, tf, dl) — one row per posting
    * @param dict (term, df) — term-keyed; join reuses the groupBy exchange
    */
  def build(tfdl: DataFrame, dict: DataFrame, stats: Stats,
            numShards: Int, blockSize: Int = DefaultBlockSize): DataFrame = {
    val bs = blockSize
    val plists = tfdl
      .join(dict.select("term", "df"), "term")
      .groupBy("term")
      .agg(
        // collect_list order is nondeterministic — always sort before encode
        sort_array(collect_list(struct(col("doc_id"), col("tf"), col("dl"))))
          .as("plist"),
        first(col("df")).as("df"))
    val nBlocks = ceil(size(col("plist")) / lit(bs.toDouble)).cast("int")
    plists
      .select(col("term"), col("df"),
        posexplode(transform(sequence(lit(0), nBlocks - 1),
          i => slice(col("plist"), i * bs + 1, lit(bs))))
          .as(Seq("block_id", "block")))
      .select(
        shardOf(col("term"), numShards).as("shard"),
        col("term"), col("block_id"),
        element_at(col("block"), 1).getField("doc_id").as("first_doc"),
        codec.varintDeltaEncode(transform(col("block"), x => x.getField("doc_id")))
          .as("doc_gaps"),
        codec.varintEncode(transform(col("block"), x => x.getField("tf").cast("long")))
          .as("tfs"),
        codec.varintEncode(transform(col("block"), x => x.getField("dl").cast("long")))
          .as("dls"),
        array_max(transform(col("block"), x => Bm25.termScore(
          x.getField("tf"), x.getField("dl"), col("df"),
          lit(stats.nDocs), lit(stats.avgdl)))).as("block_max_score"),
        size(col("block")).as("block_len"))
  }

  /** Inverse of [[build]]: decode blocks back to posting rows
    * (term, doc_id, tf, dl). Codegen'd expressions throughout. */
  def decodePostings(blocks: DataFrame): DataFrame = {
    val keep = blocks.columns.filter(c =>
      c != "doc_gaps" && c != "tfs" && c != "dls" &&
        c != "first_doc" && c != "block_id" && c != "block_len" &&
        c != "block_max_score")
    blocks
      .select(keep.map(col) :+
        explode(arrays_zip(
          codec.varintDeltaDecode(col("doc_gaps")).as("doc_id"),
          codec.varintDecode(col("tfs")).as("tf"),
          codec.varintDecode(col("dls")).as("dl"))).as("_p"): _*)
      .select(keep.map(col) :+
        col("_p.doc_id").as("doc_id") :+
        col("_p.tf").cast("int").as("tf") :+
        col("_p.dl").cast("int").as("dl"): _*)
  }
}
