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

  /** Postings per salt group before a hot term is split (SURVEY.md §4.3).
    * A Zipf head term ("the") can hold a constant fraction of ALL postings;
    * without splitting, one task owns it. */
  final val DefaultSaltTarget = 1 << 18

  /** Build encoded blocks from the scoring relation — the scale path.
    *
    * Hot-term salting by DOC-ID RANGE: a term with df > target splits into
    * ceil(df / target) groups keyed by floor(doc_id·buckets/N). Range (not
    * hash) salting makes the groups' doc ranges disjoint and ordered, so
    * each group emits its own sorted blocks and no k-way re-merge is ever
    * needed — global posting order across a term's blocks follows from
    * `first_doc`. Cold terms get bucket count 1 (identical to unsalted).
    *
    * Posting assembly is the [[PostingListAgg]] typed aggregate (primitive
    * buffers, map-side partial agg, blocks encoded at eval) rather than
    * collect_list + sort_array. [[buildSimple]] keeps the naive layout as
    * the property-test twin: both must decode to identical postings.
    *
    * @param tfdl (term, doc_id, tf, dl) — one row per posting
    * @param dict (term, df) — term-keyed; join reuses the groupBy exchange
    */
  def build(tfdl: DataFrame, dict: DataFrame, stats: Stats,
            numShards: Int, blockSize: Int = DefaultBlockSize,
            saltTarget: Int = DefaultSaltTarget): DataFrame = {
    val buckets = ceil(col("df").cast("double") / saltTarget).cast("int")
    val salt = floor(col("doc_id").cast("double") * buckets /
      lit(math.max(stats.nDocs, 1L).toDouble)).cast("int")
    tfdl
      .join(dict.select("term", "df"), "term")
      .groupBy(col("term"), salt.as("_salt"))
      .agg(PostingListAgg.blocks(col("doc_id"), col("tf"), col("dl"),
        col("df"), blockSize, stats.nDocs, stats.avgdl).as("_blocks"))
      .select(col("term"),
        posexplode(col("_blocks")).as(Seq("block_id", "_b")))
      .select(
        shardOf(col("term"), numShards).as("shard"),
        col("term"), col("block_id"),
        col("_b.first_doc").as("first_doc"),
        col("_b.last_doc").as("last_doc"),
        col("_b.doc_gaps").as("doc_gaps"),
        col("_b.tfs").as("tfs"),
        col("_b.dls").as("dls"),
        col("_b.block_max_score").as("block_max_score"),
        col("_b.block_len").as("block_len"))
  }

  /** Naive single-group layout via collect_list — the correctness twin of
    * [[build]] (kept for the salted ≡ unsalted property test; do not use
    * at scale: one task per term). */
  def buildSimple(tfdl: DataFrame, dict: DataFrame, stats: Stats,
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
        element_at(col("block"), -1).getField("doc_id").as("last_doc"),
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
        c != "first_doc" && c != "last_doc" && c != "block_id" &&
        c != "block_len" && c != "block_max_score")
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
