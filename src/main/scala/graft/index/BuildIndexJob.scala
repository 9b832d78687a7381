package graft.index

import graft.analysis.Analyzer
import graft.index.IndexBuild.Stats
import graft.search.Bm25
import graft.sources.{Fs, ParquetTableIO, TableIO}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The spark-submit batch job (SURVEY.md §3.1): transcripts → persisted
  * inverted index, as a sequence of checkpoint-resumable stages. Each
  * stage reads only previously-persisted artifacts and is guarded by a
  * `_stage_done/<stage>` marker — a restarted job skips completed stages
  * (BASELINE.json north_rule: "resumable from checkpoint with
  * per-partition lineage + metrics"). Markers/manifests go through the
  * Hadoop FileSystem API so the index root may live on any cluster
  * filesystem; artifact reads/writes go through [[graft.sources.TableIO]]
  * so the parquet emulation can be swapped for Iceberg wholesale.
  *
  * Stages and artifacts:
  *   1. docs      → `docs/`      (doc_id, conv_id, turn_idx, role, tool,
  *                                ts, dl, text) — stored fields + norms
  *   2. tf        → `tfdl/`      (term, doc_id, tf, dl) — the
  *                                materialized scoring relation
  *   3. dict      → `dictionary/` (term, shard, df, cf, max_score)
  *                  `stats/`      (n_docs, total_tokens, avgdl, build_id)
  *   4. postings  → `postings/`  encoded blocks partitioned by shard
  *
  * Every stage appends per-partition lineage rows to `lineage/`:
  * (stage, partition_id, output_rows, checksum, build_id, wall_ms).
  */
object BuildIndexJob {

  final case class Config(
      numShards: Int = 32,
      blockSize: Int = PostingBlocks.DefaultBlockSize,
      saltTarget: Int = PostingBlocks.DefaultSaltTarget,
      io: TableIO = ParquetTableIO,
      // rows per key-hash bucket of a segment's keymeta sidecar
      // ([[SegmentedIndex]]): bucket count scales with segment size, so a
      // small batch's append prunes its old-metadata read to O(batch)
      // buckets regardless of how big older segments have grown
      keymetaBucketRows: Long = 1L << 18,
      // keep token positions through the tf stage and store a per-block
      // nested-varint positions stream alongside the postings (enables
      // phrase queries, [[graft.search.IndexSearch.searchPhrase]]). OFF by
      // default: ~doubles posting storage and the tf-stage shuffle, which
      // a deployment without phrase search shouldn't pay (Lucene's
      // omitTermFreqAndPositions trade, flag-inverted)
      storePositions: Boolean = false)

  final case class IndexPaths(root: String) {
    val docs = s"$root/docs"
    val tfdl = s"$root/tfdl"
    val dictionary = s"$root/dictionary"
    val stats = s"$root/stats"
    val postings = s"$root/postings"
    val blockmeta = s"$root/blockmeta"
    val positionalMarker = s"$root/_positional"
    val lineage = s"$root/lineage"
    val staging = s"$root/_staging"
    def marker(stage: String) = s"$root/_stage_done/$stage"
  }

  /** Per-run async lane for the lineage → marker tail of each stage
    * (guide §2.6 — overlap independent jobs): a stage's lineage
    * aggregation reads only that stage's just-persisted artifact, and no
    * later stage reads `lineage/` or the marker, so the tail can execute
    * while the NEXT stage's artifact jobs run. Ordering WITHIN a stage is
    * preserved (marker only after its lineage lands — the resume
    * invariant "marker ⇒ lineage present" survives any crash), and
    * [[run]]/[[runFromTf]] join every lane before returning, so callers
    * still observe a fully-materialized index incl. lineage. One worker:
    * tails execute in stage order, keeping marker appearance monotonic. */
  private[index] final class AsyncTail {
    private val pool = java.util.concurrent.Executors.newSingleThreadExecutor()
    private val pending =
      scala.collection.mutable.ArrayBuffer.empty[java.util.concurrent.Future[_]]
    def submit(body: () => Unit): Unit =
      pending += pool.submit(new Runnable { override def run(): Unit = body() })
    def join(): Unit =
      try pending.foreach(_.get())
      finally pool.shutdown()
  }

  def run(spark: SparkSession, transcripts: DataFrame, root: String,
          buildId: String, cfg: Config = Config()): IndexPaths = {
    val p = IndexPaths(root)
    val io = cfg.io
    val tail = new AsyncTail
    try {
      runStages(spark, transcripts, p, buildId, cfg, tail)
      runFromTfStages(spark, p, buildId, cfg, tail)
    } finally tail.join()
    p
  }

  private def runStages(spark: SparkSession, transcripts: DataFrame,
                        p: IndexPaths, buildId: String, cfg: Config,
                        tail: AsyncTail): Unit = {
    val io = cfg.io
    stage(spark, p, "docs", tail) { t0 =>
      val ingested = IndexBuild.ingest(transcripts)
      val docs = IndexBuild
        .assignDocIds(ingested, stagingDir = s"${p.staging}/docids")
        .withColumn("dl", Analyzer.docLen(col("text")))
        .select("doc_id", "conv_id", "turn_idx", "role", "tool", "ts", "dl", "text")
      // collection stats ride the docs write as observed metrics — the
      // dict stage previously re-aggregated the whole docs artifact for
      // them (one full column-pruned pass per build, saved here; guide
      // §1.2). avgdl = total/n_docs in ONE double division — identical to
      // Spark's avg() on integral input (whose partial sums over ints are
      // exact in double). Written BEFORE the stage marker: marker ⇒ stats
      // present, so a resumed dict stage can always just read it.
      val obs = org.apache.spark.sql.Observation()
      io.write(docs.observe(obs,
          count(when(col("dl") > 0, 1)).as("n"),
          sum(when(col("dl") > 0, col("dl").cast("long"))).as("t")),
        p.docs, snapshotId = buildId)
      val nDocs = Option(obs.get.getOrElse("n", null)).fold(0L)(_.asInstanceOf[Long])
      val total = Option(obs.get.getOrElse("t", null)).fold(0L)(_.asInstanceOf[Long])
      import spark.implicits._
      io.write(Seq((nDocs, total,
          if (nDocs == 0) 0.0 else total.toDouble / nDocs, buildId))
        .toDF("n_docs", "total_tokens", "avgdl", "build_id"), p.stats,
        snapshotId = buildId)
      Fs.delete(spark, s"${p.staging}/docids")
      // checksum over (key, dl) — dl is derived from text, so it catches
      // content drift without re-reading the text column (which would be
      // a second full-corpus scan just for lineage)
      lineage(spark, p, "docs", buildId, t0, tail = tail, perPartition =
        io.read(spark, p.docs).groupBy(pmod(col("doc_id"), lit(64)).cast("int").as("partition_id"))
          .agg(count(lit(1)).as("output_rows"),
            bit_xor(xxhash64(col("conv_id"), col("turn_idx"), col("dl"))).as("checksum")))
    }

    stage(spark, p, "tf", tail) { t0 =>
      val docs = io.read(spark, p.docs)
      // dl carried through the aggregate key (functionally dependent on
      // doc_id) — no join back to docs needed. tfdl is an INTERNAL
      // artifact (dict re-aggregates by term; the postings stage
      // re-shuffles by (term, salt)), so it is written straight out of the
      // aggregation exchange: no pre-write repartition, no shard
      // partitioning — the round-1 extra shuffle here bought nothing
      // downstream. Only `postings/` (query-facing) is shard-partitioned.
      val tfdl =
        if (!cfg.storePositions)
          docs
            .select(col("doc_id"), col("dl"), explode(Analyzer.tokens(col("text"))).as("term"))
            .groupBy("term", "doc_id", "dl")
            .agg(count(lit(1)).cast("int").as("tf"))
            .select("term", "doc_id", "tf", "dl")
        else
          // positional variant (A3 with positions kept): posexplode gives
          // the token index; the sorted per-(term, doc) position list rides
          // the same aggregate (no extra shuffle) and feeds the per-block
          // positions stream
          docs
            .select(col("doc_id"), col("dl"),
              posexplode(Analyzer.tokens(col("text"))).as(Seq("_pos", "term")))
            .groupBy("term", "doc_id", "dl")
            .agg(count(lit(1)).cast("int").as("tf"),
              sort_array(collect_list(col("_pos").cast("long"))).as("positions"))
            .select("term", "doc_id", "tf", "dl", "positions")
      io.write(tfdl, p.tfdl, snapshotId = buildId)
      lineage(spark, p, "tf", buildId, t0, tail = tail, perPartition =
        io.read(spark, p.tfdl)
          .groupBy(pmod(xxhash64(col("term")), lit(64)).cast("int").as("partition_id"))
          .agg(count(lit(1)).as("output_rows"),
            bit_xor(xxhash64(col("term"), col("doc_id"), col("tf"))).as("checksum")))
    }

  }

  /** The dict + postings stages, given already-persisted docs/tfdl
    * artifacts — shared by the batch job and [[IndexMerge]]. */
  def runFromTf(spark: SparkSession, p: IndexPaths, buildId: String,
                cfg: Config = Config()): Unit = {
    val tail = new AsyncTail
    try runFromTfStages(spark, p, buildId, cfg, tail)
    finally tail.join()
  }

  private def runFromTfStages(spark: SparkSession, p: IndexPaths,
                              buildId: String, cfg: Config,
                              tail: AsyncTail): Unit = {
    val io = cfg.io
    stage(spark, p, "dict", tail) { t0 =>
      // stats/ is written by the docs stage (observed metrics on the docs
      // write) or by [[IndexMerge.run]]'s docs write; compute-and-write
      // here only for a caller that persisted docs/tfdl through neither
      // (keeps runFromTf self-sufficient on bare artifacts)
      val stats =
        if (Fs.exists(spark, p.stats)) readStats(spark, p, io)
        else {
          val docs = io.read(spark, p.docs)
          val st = docs.where(col("dl") > 0).agg(
            count(lit(1)).as("n_docs"),
            sum(col("dl").cast("long")).as("total_tokens"),
            avg(col("dl")).as("avgdl")).head()
          val s = Stats(st.getLong(0), st.getLong(1), st.getDouble(2))
          import spark.implicits._
          io.write(Seq((s.nDocs, s.totalTokens, s.avgdl, buildId))
            .toDF("n_docs", "total_tokens", "avgdl", "build_id"), p.stats,
            snapshotId = buildId)
          s
        }
      val tfdl = io.read(spark, p.tfdl)
      // One pass: df/cf plus an UPPER BOUND on the term's best score,
      // score(max_tf, min_dl) — BM25 is monotone ↑tf, ↓dl, so this bounds
      // every posting. WAND derives exact per-term bounds from block
      // maxes at query time; the dictionary bound is advisory, and the
      // bound form saves a tfdl self-join + second aggregation here.
      val dict = tfdl.groupBy("term").agg(
          count(lit(1)).as("df"),
          sum(col("tf").cast("long")).as("cf"),
          max(col("tf")).as("_max_tf"),
          min(col("dl")).as("_min_dl"))
        .withColumn("shard", PostingBlocks.shardOf(col("term"), cfg.numShards))
        .withColumn("max_score", Bm25.termScore(col("_max_tf"), col("_min_dl"),
          col("df"), lit(stats.nDocs), lit(stats.avgdl)))
        .select("term", "shard", "df", "cf", "max_score")
      io.write(dict, p.dictionary, snapshotId = buildId)
      lineage(spark, p, "dict", buildId, t0, tail = tail, perPartition =
        io.read(spark, p.dictionary).groupBy(col("shard").as("partition_id"))
          .agg(count(lit(1)).as("output_rows"),
            bit_xor(xxhash64(col("term"), col("df"), col("cf"))).as("checksum")))
    }

    stage(spark, p, "postings", tail) { t0 =>
      val tfdl = io.read(spark, p.tfdl)
      val dict = io.read(spark, p.dictionary)
      val stats = readStats(spark, p, cfg.io)
      val tfdlCols = Seq("term", "doc_id", "tf", "dl") ++
        (if (tfdl.columns.contains("positions")) Seq("positions") else Nil)
      val blocks = PostingBlocks.build(
        tfdl.select(tfdlCols.map(col): _*), dict, stats,
        cfg.numShards, cfg.blockSize, cfg.saltTarget)
        .repartition(cfg.numShards * 4, col("shard"),
          pmod(xxhash64(col("term")), lit(4)))
      io.write(blocks, p.postings, partitionBy = Seq("shard"), snapshotId = buildId)
      // ONE cached metadata-only scan of what was just written feeds both
      // the blockmeta sidecar and the lineage rows (round-4 ran two
      // separate postings scans here, and the lineage one hashed the
      // doc_gaps BINARY column — a full payload re-read just for a
      // checksum; (term, first_doc, last_doc, block_len) catches layout
      // and content drift without touching the streams, the same trade
      // the docs-stage lineage makes with dl)
      val meta = io.read(spark, p.postings)
        .select("shard", "term", "first_doc", "last_doc", "block_len",
          "block_max_score").cache()
      // per-term top block maxes: lets query time derive the WAND θ
      // seed from the broadcast dictionary with ZERO extra Spark jobs
      // per batch
      io.write(PostingBlocks.topBlockMaxes(
          meta.select("term", "block_max_score")),
        p.blockmeta, snapshotId = buildId)
      // phrase-capability marker: lets searchPhrase fail fast (or
      // proceed) without sampling data
      if (cfg.storePositions)
        Fs.writeString(spark, p.positionalMarker, "true")
      // the lineage agg reuses the cached meta; the async tail owns the
      // unpersist (it is the last consumer — the marker thunk queued by
      // stage() runs after this one on the same single-worker lane)
      val wallMs = (System.nanoTime() - t0) / 1000000
      tail.submit { () =>
        try lineageWrite(p, "postings", buildId, wallMs,
          meta.groupBy(col("shard").as("partition_id"))
            .agg(count(lit(1)).as("output_rows"),
              bit_xor(xxhash64(col("term"), col("first_doc"), col("last_doc"),
                col("block_len"))).as("checksum")))
        finally meta.unpersist()
      }
    }
  }

  def readStats(spark: SparkSession, p: IndexPaths,
                io: TableIO = ParquetTableIO): Stats = {
    val r = io.read(spark, p.stats).head()
    Stats(r.getAs[Long]("n_docs"), r.getAs[Long]("total_tokens"),
      r.getAs[Double]("avgdl"))
  }

  /** Run `body` unless this stage's done-marker exists; queue the marker
    * write on the async tail on success (AFTER the body's queued lineage —
    * single FIFO worker — so "marker ⇒ lineage present" holds across any
    * crash). The body receives the stage's start nanoTime (for lineage
    * wall_ms). Returns true if the stage executed. */
  private def stage(spark: SparkSession, p: IndexPaths, name: String,
                    tail: AsyncTail)(body: Long => Unit): Boolean = {
    val marker = p.marker(name)
    if (Fs.exists(spark, marker)) false
    else {
      val t0 = System.nanoTime()
      body(t0)
      System.err.println(f"[build] stage $name: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      tail.submit(() => Fs.writeString(spark, marker, "done"))
      true
    }
  }

  /** Queue the per-partition lineage append for a completed stage on the
    * async tail; wall_ms is the elapsed stage time at REGISTRATION (the
    * stage's artifact writes have executed — the async tail only overlaps
    * the lineage aggregation itself with the next stage). */
  private def lineage(spark: SparkSession, p: IndexPaths, stageName: String,
                      buildId: String, startedNanos: Long,
                      perPartition: DataFrame, tail: AsyncTail): Unit = {
    val wallMs = (System.nanoTime() - startedNanos) / 1000000
    tail.submit(() => lineageWrite(p, stageName, buildId, wallMs, perPartition))
  }

  private def lineageWrite(p: IndexPaths, stageName: String, buildId: String,
                           wallMs: Long, perPartition: DataFrame): Unit =
    perPartition
      .withColumn("stage", lit(stageName))
      .withColumn("build_id", lit(buildId))
      .withColumn("wall_ms", lit(wallMs))
      .select("stage", "partition_id", "output_rows", "checksum", "build_id", "wall_ms")
      .write.mode("append").parquet(p.lineage)
}
