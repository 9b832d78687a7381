package graft

import graft.index.{BuildIndexJob, IndexBuild, PostingBlocks}
import graft.search.Bm25
import graft.index.IndexBuild.Stats
import graft.sources.Transcripts
import org.apache.spark.sql.functions._

class PostingAggSpec extends SparkSpec {

  lazy val (tfdl, dict, stats) = {
    val t = Transcripts.synthetic(spark, 200)
    val corpus = IndexBuild.assignDocIds(IndexBuild.ingest(t))
      .select("doc_id", "text")
    val occ = IndexBuild.termOccurrences(corpus)
    val tf = IndexBuild.termFrequencies(occ)
    val dl = IndexBuild.docLengths(occ)
    val tfdl = IndexBuild.tfWithDl(tf, dl)
      // multiple input partitions so partial agg + serialize/merge really run
      .repartition(7).cache()
    (tfdl, IndexBuild.dictionary(tf).cache(), IndexBuild.stats(dl))
  }

  def decoded(blocks: org.apache.spark.sql.DataFrame) =
    PostingBlocks.decodePostings(blocks)
      .select("term", "doc_id", "tf", "dl")

  test("salted sort-streamed build ≡ E5 aggregate build ≡ naive build") {
    // saltTarget=32 forces every hot term through multi-group salting
    val sorted = PostingBlocks.build(tfdl, dict, stats, 8, blockSize = 16,
      saltTarget = 32)
    val agg = PostingBlocks.buildAgg(tfdl, dict, stats, 8, blockSize = 16,
      saltTarget = 32)
    val simple = PostingBlocks.buildSimple(tfdl, dict, stats, 8, blockSize = 16)
    for ((a, b, name) <- Seq((sorted, simple, "sorted-vs-simple"),
                             (sorted, agg, "sorted-vs-agg"))) {
      assert(decoded(a).exceptAll(decoded(b)).count() == 0, name)
      assert(decoded(b).exceptAll(decoded(a)).count() == 0, name)
    }
    // identical BLOCK layout (not just postings): same keys + metadata
    val layout = (df: org.apache.spark.sql.DataFrame) => df.select(
      "term", "first_doc", "last_doc", "block_max_score", "block_len")
    assert(layout(sorted).exceptAll(layout(agg)).count() == 0)
    assert(decoded(sorted).count() == tfdl.count())
  }

  test("streamBlocks edge: blockSize=1 and group boundaries lose no blocks") {
    import graft.index.PostingBlocks.{PostingRow, streamBlocks}
    val rows = Seq(
      PostingRow("a", 0, 1L, 1, 10, 2L), PostingRow("a", 0, 5L, 2, 10, 2L),
      PostingRow("a", 1, 9L, 1, 10, 2L), PostingRow("b", 0, 3L, 1, 10, 1L))
    val out = streamBlocks(rows.iterator, 1, 100L, 10.0).toSeq
    assert(out.size == 4)
    assert(out.map(b => (b.term, b.block_id, b.first_doc)) ==
      Seq(("a", 0, 1L), ("a", 1, 5L), ("a", 0, 9L), ("b", 0, 3L)))
    val two = streamBlocks(rows.iterator, 2, 100L, 10.0).toSeq
    assert(two.map(b => (b.term, b.block_id, b.first_doc, b.block_len)) ==
      Seq(("a", 0, 1L, 2), ("a", 0, 9L, 1), ("b", 0, 3L, 1)))
  }

  test("salting actually splits hot terms into multiple groups") {
    val fancy = PostingBlocks.build(tfdl, dict, stats, 8, blockSize = 16,
      saltTarget = 32)
    val hottest = dict.orderBy(col("df").desc).head()
    val term = hottest.getString(0)
    val groups = fancy.where(col("term") === term)
      .select(countDistinct(col("first_doc"))).head() // ≥ blocks; weak proxy
    val firstDocs = fancy.where(col("term") === term)
      .select("first_doc", "block_len").collect()
    assert(firstDocs.length > 1, "hot term should span multiple blocks")
    // blocks are globally ordered and non-overlapping by doc range
    val sorted = firstDocs.map(_.getLong(0)).sorted
    assert(sorted.distinct.length == sorted.length)
  }

  test("per-block max score matches recomputation from decoded postings") {
    val blocks = PostingBlocks.build(tfdl, dict, stats, 8, blockSize = 16,
      saltTarget = 32).cache()
    val recomputed = PostingBlocks.decodePostings(
        blocks.select(col("term"), col("first_doc").as("fd"),
          col("doc_gaps"), col("tfs"), col("dls")))
      .join(dict.select("term", "df"), "term")
      .groupBy("term", "fd")
      .agg(max(Bm25.termScore(col("tf"), col("dl"), col("df"),
        lit(stats.nDocs), lit(stats.avgdl))).as("want"))
    val got = blocks.select(col("term"), col("first_doc").as("fd"),
      col("block_max_score").as("got"))
    val joined = got.join(recomputed, Seq("term", "fd"))
    assert(joined.where(abs(col("got") - col("want")) > 1e-12).count() == 0)
    assert(joined.count() == blocks.count())
    blocks.unpersist()
  }

  test("block sizes respect the configured block size") {
    val blocks = PostingBlocks.build(tfdl, dict, stats, 8, blockSize = 16,
      saltTarget = 32)
    assert(blocks.where(col("block_len") > 16 || col("block_len") < 1).count() == 0)
  }
}
