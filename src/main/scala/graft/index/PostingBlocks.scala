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

  /** Per-term count of top block-max scores persisted in `blockmeta/`
    * ([[topBlockMaxes]]): enough for any top-k ≤ 16 query to derive its
    * WAND θ seed from the broadcast dictionary alone (k-th largest block
    * max of a term lower-bounds the final k-th best score — k
    * doc-disjoint blocks each achieve their max from that term alone). */
  final val TopBlockMaxes = 16

  def shardOf(termCol: org.apache.spark.sql.Column, numShards: Int) =
    pmod(xxhash64(termCol), lit(numShards)).cast("int")

  /** Postings per salt group before a hot term is split (SURVEY.md §4.3).
    * A Zipf head term ("the") can hold a constant fraction of ALL postings;
    * without splitting, one task owns it. */
  final val DefaultSaltTarget = 1 << 18

  /** One posting row entering the streaming block builder. `positions` is
    * the doc's ascending token positions of the term (null when the index
    * is built without positional postings — the default). */
  final case class PostingRow(term: String, salt: Int, doc_id: Long,
                              tf: Int, dl: Int, df: Long,
                              positions: Array[Long] = null)

  /** One encoded block leaving it. `poss` is the nested-varint positions
    * stream aligned with the block's postings (null when positions are
    * not stored). */
  final case class BlockRow(term: String, block_id: Int, first_doc: Long,
                            last_doc: Long, doc_gaps: Array[Byte],
                            tfs: Array[Byte], dls: Array[Byte],
                            block_max_score: Double, block_len: Int,
                            poss: Array[Byte] = null)

  /** Build encoded blocks from the scoring relation — the scale path.
    *
    * Hot-term salting by DOC-ID RANGE: a term with df > target splits into
    * ceil(df / target) groups keyed by floor(doc_id·buckets/N). Range (not
    * hash) salting makes the groups' doc ranges disjoint and ordered, so
    * each group emits its own sorted blocks and no k-way re-merge is ever
    * needed — global posting order across a term's blocks follows from
    * `first_doc`. Cold terms get bucket count 1 (identical to unsalted).
    *
    * Assembly is SORT-STREAMED (the classic MapReduce index-build shape):
    * one shuffle keyed on (term, salt), Spark's spillable sort orders each
    * partition by (term, salt, doc_id), and a single streaming pass emits
    * an encoded block every `blockSize` postings — O(blockSize) memory per
    * task regardless of term hotness. An aggregate-based assembly
    * ([[buildAgg]], the E5 TypedImperativeAggregate) is kept as a twin:
    * posting keys are unique, so its partial phase buffers the entire
    * input per task — measurably GC-bound at tens of millions of postings.
    *
    * @param tfdl (term, doc_id, tf, dl) — one row per posting
    * @param dict (term, df) — term-keyed broadcastable stats
    */
  def build(tfdl: DataFrame, dict: DataFrame, stats: Stats,
            numShards: Int, blockSize: Int = DefaultBlockSize,
            saltTarget: Int = DefaultSaltTarget): DataFrame = {
    val spark = tfdl.sparkSession
    import spark.implicits._
    val buckets = ceil(col("df").cast("double") / saltTarget).cast("int")
    val salt = floor(col("doc_id").cast("double") * buckets /
      lit(math.max(stats.nDocs, 1L).toDouble)).cast("int")
    val (n, avg, bs) = (stats.nDocs, stats.avgdl, blockSize)
    val withPositions =
      if (tfdl.columns.contains("positions")) tfdl
      else tfdl.withColumn("positions", lit(null).cast("array<bigint>"))
    withPositions
      .join(dict.select("term", "df"), "term")
      .withColumn("salt", salt)
      .select(col("term"), col("salt"), col("doc_id"), col("tf"), col("dl"),
        col("df"), col("positions"))
      .repartition(col("term"), col("salt"))
      .sortWithinPartitions("term", "salt", "doc_id")
      .as[PostingRow]
      .mapPartitions(rows => streamBlocks(rows, bs, n, avg))
      .toDF()
      .withColumn("shard", shardOf(col("term"), numShards))
      .select("shard", "term", "block_id", "first_doc", "last_doc",
        "doc_gaps", "tfs", "dls", "block_max_score", "block_len", "poss")
  }

  /** Single-pass block emitter over (term, salt, doc_id)-sorted postings. */
  def streamBlocks(rows: Iterator[PostingRow], blockSize: Int,
                   nDocs: Long, avgdl: Double): Iterator[BlockRow] =
    new Iterator[BlockRow] {
      import org.apache.spark.sql.catalyst.util.GenericArrayData
      private val ids = new Array[Long](blockSize)
      private val tfs = new Array[Long](blockSize)
      private val dls = new Array[Long](blockSize)
      private val poss = new Array[Array[Long]](blockSize)
      private var fill = 0
      private var curTerm: String = _
      private var curSalt = 0
      private var curDf = 0L
      private var blockId = 0
      // queue, not a single slot: a group-change flush and a block-full
      // flush can both fire while consuming one row (blockSize == 1)
      private val pending = scala.collection.mutable.Queue.empty[BlockRow]

      private def flush(): Unit = {
        var maxScore = Double.NegativeInfinity
        var i = 0
        while (i < fill) {
          val s = graft.search.Bm25.score(tfs(i).toInt, dls(i).toInt, curDf, nDocs, avgdl)
          if (s > maxScore) maxScore = s
          i += 1
        }
        def enc(a: Array[Long], delta: Boolean) = {
          val trimmed = java.util.Arrays.copyOf(a, fill)
          if (delta) VarintCodec.encodeDelta(new GenericArrayData(trimmed))
          else VarintCodec.encode(new GenericArrayData(trimmed))
        }
        // positions are all-or-nothing per build (a positional build sets
        // them on every row); encode only when present
        val posBytes =
          if (poss(0) == null) null
          else VarintCodec.encodeNested(new GenericArrayData(
            java.util.Arrays.copyOf(poss, fill).map(new GenericArrayData(_): Any)))
        pending.enqueue(BlockRow(curTerm, blockId, ids(0), ids(fill - 1),
          enc(ids, delta = true), enc(tfs, delta = false), enc(dls, delta = false),
          maxScore, fill, posBytes))
        blockId += 1
        fill = 0
      }

      private def advance(): Unit = {
        while (pending.isEmpty && rows.hasNext) {
          val r = rows.next()
          if (fill > 0 && (r.term != curTerm || r.salt != curSalt)) flush()
          if (fill == 0 && (r.term != curTerm || r.salt != curSalt)) blockId = 0
          curTerm = r.term; curSalt = r.salt; curDf = r.df
          ids(fill) = r.doc_id; tfs(fill) = r.tf.toLong; dls(fill) = r.dl.toLong
          poss(fill) = r.positions
          fill += 1
          if (fill == blockSize) flush()
        }
        if (pending.isEmpty && fill > 0) flush()
      }

      override def hasNext: Boolean = { advance(); pending.nonEmpty }
      override def next(): BlockRow = {
        advance()
        pending.dequeue()
      }
    }

  /** E5 aggregate-based assembly (TypedImperativeAggregate) — property-test
    * twin of [[build]]; prefer [[build]] at scale (see its Scaladoc). */
  def buildAgg(tfdl: DataFrame, dict: DataFrame, stats: Stats,
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

  /** Per-term TOP-K block-max scores — (term, top_block_maxes:array<double>
    * descending, ≤ k entries) — computed scale-safely: a hot term can own
    * millions of blocks (df/blockSize), so a collect_list-per-term would
    * blow a task. Two phases instead: a per-partition bounded top-k
    * (fixed O(k) state per distinct term in the partition), then a final
    * per-term merge over ≤ partitions·k survivors. Metadata columns only —
    * no binary streams are read. */
  def topBlockMaxes(blocksMeta: DataFrame, k: Int = TopBlockMaxes): DataFrame = {
    val spark = blocksMeta.sparkSession
    import spark.implicits._
    val partials = blocksMeta
      .select(col("term"), col("block_max_score").cast("double"))
      .as[(String, Double)]
      .mapPartitions { it =>
        val heaps = scala.collection.mutable.HashMap
          .empty[String, java.util.PriorityQueue[java.lang.Double]]
        it.foreach { case (t, s) =>
          val q = heaps.getOrElseUpdate(t,
            new java.util.PriorityQueue[java.lang.Double](k + 1)) // min-heap
          if (q.size < k) q.add(s)
          else if (q.peek() < s) { q.poll(); q.add(s) }
        }
        heaps.iterator.map { case (t, q) =>
          (t, q.toArray(Array.empty[java.lang.Double]).map(_.doubleValue()))
        }
      }
    partials.toDF("term", "_part")
      .select(col("term"), explode(col("_part")).as("_s"))
      .groupBy("term")
      .agg(slice(reverse(array_sort(collect_list(col("_s")))), 1, k)
        .as("top_block_maxes"))
  }

  /** Shared decode scaffolding: explode the zipped per-block streams back
    * to one row per posting, carrying every non-block column through. */
  private def decodeWith(blocks: DataFrame, withPositions: Boolean): DataFrame = {
    val keep = blocks.columns.filter(c =>
      c != "doc_gaps" && c != "tfs" && c != "dls" && c != "poss" &&
        c != "first_doc" && c != "last_doc" && c != "block_id" &&
        c != "block_len" && c != "block_max_score")
    val streams = Seq(
      codec.varintDeltaDecode(col("doc_gaps")).as("doc_id"),
      codec.varintDecode(col("tfs")).as("tf"),
      codec.varintDecode(col("dls")).as("dl")) ++
      (if (withPositions)
        Seq(codec.varintNestedDecode(col("poss")).as("positions"))
      else Nil)
    val out = Seq(
      col("_p.doc_id").as("doc_id"),
      col("_p.tf").cast("int").as("tf"),
      col("_p.dl").cast("int").as("dl")) ++
      (if (withPositions) Seq(col("_p.positions").as("positions")) else Nil)
    blocks
      .select(keep.map(col) :+ explode(arrays_zip(streams: _*)).as("_p"): _*)
      .select(keep.map(col) ++ out: _*)
  }

  /** Inverse of [[build]]: decode blocks back to posting rows
    * (term, doc_id, tf, dl). Codegen'd expressions throughout. */
  def decodePostings(blocks: DataFrame): DataFrame =
    decodeWith(blocks, withPositions = false)

  /** Positional decode: like [[decodePostings]] plus the nested positions
    * stream — (…, doc_id, tf, dl, positions:array<long>). Requires blocks
    * built with positional postings (`poss` non-null). */
  def decodePostingsWithPositions(blocks: DataFrame): DataFrame =
    decodeWith(blocks, withPositions = true)
}
