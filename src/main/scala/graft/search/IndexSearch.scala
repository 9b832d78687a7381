package graft.search

import graft.index.{BuildIndexJob, PostingBlocks}
import graft.index.BuildIndexJob.IndexPaths
import graft.index.IndexBuild.Stats
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
                             stats: Stats, spark: SparkSession,
                             io: graft.sources.TableIO)

  /** One posting block routed to one (query, doc-range) group (WAND
    * input). A block spanning a range boundary is routed to EVERY range it
    * overlaps; the range-bounded traversal ignores its out-of-range
    * postings, so each doc is scored exactly once (in its own range). */
  final case class QBlockRow(query_id: Int, range_id: Int, term: String,
                             df: Long, first_doc: Long, last_doc: Long,
                             doc_gaps: Array[Byte], tfs: Array[Byte],
                             dls: Array[Byte], block_max_score: Double)

  final case class ResultRow(query_id: Int, rank: Int, doc_id: Long,
                             score: Double)

  /** Docs per WAND range. Bounds one task's working set: a (query, range)
    * group materializes at most |query terms| × docsPerRange/blockSize
    * encoded blocks, independent of corpus size — the property that lets a
    * hot single-term query scale past one task's memory at 10^12 docs. At
    * sandbox corpus sizes (≤ a few M docs) this yields one range, i.e. the
    * round-1 behavior, with zero extra overhead. */
  final val DefaultDocsPerRange: Long = 1L << 20

  def open(spark: SparkSession, root: String,
           io: graft.sources.TableIO = graft.sources.ParquetTableIO): OpenIndex = {
    val p = IndexPaths(root)
    OpenIndex(p, io.read(spark, p.dictionary),
      BuildIndexJob.readStats(spark, p, io), spark, io)
  }

  /** Decoded posting rows of the given (query_id, term) pairs, pruned to
    * the shards those terms hash to: (query_id, term, df, doc_id, tf, dl).
    * The shared scan under exhaustive scoring, filtering, faceting, and
    * NOT-exclusion. */
  private def matchedPostings(idx: OpenIndex, qt: DataFrame): DataFrame = {
    val spark = idx.spark
    // tiny join: |distinct query terms| rows
    val qd = qt.join(idx.dictionary, "term")
      .select("query_id", "term", "df", "shard")
    // driver boundary: the set of shards the query touches (≤ |q| ints)
    val shards = qd.select("shard").distinct().collect().map(_.getInt(0)).toSeq
    if (shards.isEmpty)
      return PostingBlocks.decodePostings(
        idx.io.read(spark, idx.paths.postings).limit(0)
          .join(broadcast(qd.select("query_id", "term", "df")), Seq("term")))
    val blocks = idx.io.read(spark, idx.paths.postings)
      .where(col("shard").isin(shards: _*))
      .join(broadcast(qd.select("query_id", "term", "df")), Seq("term"))
    PostingBlocks.decodePostings(blocks)
  }

  /** Pre-rank per-(query, doc) scores over the persisted index — the
    * index-side twin of [[Search.scoredDocs]]. */
  private def scoredDocs(idx: OpenIndex, qt: DataFrame,
                         conjunctive: Boolean): DataFrame = {
    val scored = matchedPostings(idx, qt)
      .withColumn("_s", Bm25.termScore(col("tf"), col("dl"), col("df"),
        lit(idx.stats.nDocs), lit(idx.stats.avgdl)))
      .groupBy("query_id", "doc_id")
      .agg(sum(col("_s")).as("_score"), count(lit(1)).as("_n_matched"))
    if (!conjunctive) scored
    else {
      // all analyzed query terms, pre-dictionary — Lucene MUST semantics
      // (out-of-vocabulary required term ⇒ no matches)
      val nq = qt.groupBy("query_id").agg(count(lit(1)).as("_n_q"))
      scored.join(broadcast(nq), "query_id")
        .where(col("_n_matched") === col("_n_q"))
    }
  }

  def search(idx: OpenIndex, queries: Seq[(Int, String)], k: Int = 10,
             conjunctive: Boolean = false): DataFrame = {
    val qt = Search.queryTerms(Search.queryFrame(idx.spark, queries))
    Search.rank(scoredDocs(idx, qt, conjunctive), k)
  }

  /** Boolean NOT over the persisted index (Solr `q=a -b`): the no-must
    * subset of the clause grammar — delegates to [[searchClauses]] (one
    * boolean engine path). A pure-negative query matches nothing. */
  def searchBoolean(idx: OpenIndex, queries: Seq[(Int, String)],
                    k: Int = 10): DataFrame =
    searchClauses(idx, queries, k)

  /** Full boolean clause grammar (`q=+a b -c`) over the persisted index —
    * same pinned semantics as [[Search.searchCorpusClauses]]: every must
    * term required (OOV must ⇒ no matches), not-terms anti-joined, score
    * over matching must+should terms. */
  def searchClauses(idx: OpenIndex, queries: Seq[(Int, String)],
                    k: Int = 10): DataFrame = {
    val spark = idx.spark
    import spark.implicits._
    val (qt, neg, nMust) = Search.parseClauseQueries(spark, queries)
    val scored = matchedPostings(idx, qt.select("query_id", "term"))
      .join(broadcast(qt), Seq("query_id", "term"))
      .withColumn("_s", Bm25.termScore(col("tf"), col("dl"), col("df"),
        lit(idx.stats.nDocs), lit(idx.stats.avgdl)))
      .groupBy("query_id", "doc_id")
      .agg(sum(col("_s")).as("_score"),
        count(when(col("_is_must"), lit(1))).as("_must_matched"))
    val nMustDf = nMust.toSeq.toDF("query_id", "_n_must")
    val negMatch = matchedPostings(idx, neg)
      .select("query_id", "doc_id").distinct()
    Search.rank(scored
      .join(broadcast(nMustDf), "query_id")
      .where(col("_must_matched") === col("_n_must"))
      .join(negMatch, Seq("query_id", "doc_id"), "left_anti"), k)
  }

  /** Solr `fq` over the persisted index: the predicate (over the stored
    * doc attributes in `docs/`) restricts RESULTS only — scores, df, and
    * avgdl remain those of the full corpus, exactly like
    * [[Search.searchCorpusFiltered]]. The docs scan is column-pruned to
    * (doc_id + the filter's columns) and left-semi-joined, so the filter
    * costs one key-join against an attribute projection, never a second
    * posting traversal. */
  def searchFiltered(idx: OpenIndex, queries: Seq[(Int, String)],
                     filter: org.apache.spark.sql.Column, k: Int = 10,
                     conjunctive: Boolean = false): DataFrame = {
    val qt = Search.queryTerms(Search.queryFrame(idx.spark, queries))
    val keep = idx.io.read(idx.spark, idx.paths.docs)
      .where(filter).select("doc_id")
    Search.rank(
      scoredDocs(idx, qt, conjunctive).join(keep, Seq("doc_id"), "left_semi"), k)
  }

  /** Solr `facet.field` over the persisted index's match set: per
    * (query, facet value) doc counts — every doc matching ≥1 query term
    * counts once. Facet values come from the persisted `docs/` attributes
    * (column-pruned scan). */
  def facetCounts(idx: OpenIndex, queries: Seq[(Int, String)],
                  facetCol: String): DataFrame = {
    val qt = Search.queryTerms(Search.queryFrame(idx.spark, queries))
    val matched = matchedPostings(idx, qt)
      .select("query_id", "doc_id").distinct()
    val attrs = idx.io.read(idx.spark, idx.paths.docs)
      .select(col("doc_id"), col(facetCol))
    matched.join(attrs, "doc_id")
      .groupBy("query_id", facetCol)
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("query_id", facetCol)
  }

  /** Exact (zero-slop) PHRASE search over positional postings — requires
    * an index built with `Config.storePositions`. Pinned semantics are
    * Lucene `PhraseQuery`'s documented scoring: the phrase acts as one
    * virtual term with
    *
    *   idf   = Σ_i idf(t_i)        (duplicate phrase terms counted again)
    *   tf    = pf, the exact phrase frequency in the doc
    *   score = idf · pf / (pf + k1·(1−b+b·dl/avgdl))
    *
    * and a doc matches iff pf ≥ 1. Plan shape: the postings scan prunes to
    * the phrase terms' shards, positions decode through the nested-varint
    * expression, the m relations equi-join on doc_id (m = phrase length,
    * small), and pf is a pure Column fold over the first term's position
    * list. A phrase containing an out-of-vocabulary term matches nothing
    * (Lucene semantics).
    *
    * `slop` ≥ 0 relaxes adjacency to an ORDERED proximity window (Solr
    * `"a b"~N`-style): a start position p₁ of t₁ counts toward pf iff
    * positions p₁ < p₂ < … < p_m of t₂..t_m exist with total displacement
    * (p_m − p₁) − (m−1) ≤ slop. Pinned divergence from Lucene: Lucene's
    * sloppy matching also admits OUT-of-order transpositions and scores
    * with sloppyFreq = Σ 1/(distance+1); this engine pins in-order-only
    * matching and pf = the count of valid start positions — deterministic
    * and oracle-expressible. slop = 0 is exactly the adjacency case. The
    * nested Column `exists` chain carries per-level bounds
    * p_i ≤ p₁ + (i−1) + slop, which is implied by the final bound and
    * ordering, so it prunes without changing the matched set. */
  def searchPhrase(idx: OpenIndex, phrases: Seq[(Int, String)],
                   k: Int = 10, slop: Int = 0): DataFrame = {
    val spark = idx.spark
    import spark.implicits._
    // fail fast on a non-positional index: poss = null would otherwise
    // null out the arrays_zip and SILENTLY return zero hits for phrases
    // the corpus contains (one sampled row; an empty index passes)
    val sample = idx.io.read(spark, idx.paths.postings)
      .select("poss").limit(1).collect()
    require(sample.isEmpty || !sample(0).isNullAt(0),
      "searchPhrase requires a positional index — rebuild with " +
        "Config(storePositions = true)")
    def empty = Seq.empty[ResultRow].toDF()
      .select(col("query_id"), col("rank"), col("doc_id"), col("score"))
    val perQuery = phrases.flatMap { case (qid, text) =>
      val terms = graft.analysis.Analyzer.tokenize(text)
      if (terms.isEmpty) None
      else {
        val distinctTerms = terms.distinct
        // driver boundary: ≤ |phrase| dictionary rows
        val dictRows = idx.dictionary
          .where(col("term").isInCollection(distinctTerms))
          .select("term", "df", "shard").collect()
          .map(r => r.getString(0) -> ((r.getLong(1), r.getInt(2)))).toMap
        if (distinctTerms.exists(t => !dictRows.contains(t))) None
        else {
          val idfSum = terms.map(t => Bm25.idfValue(dictRows(t)._1, idx.stats.nDocs)).sum
          val shards = distinctTerms.map(t => dictRows(t)._2).distinct
          val blocks = idx.io.read(spark, idx.paths.postings)
            .where(col("shard").isin(shards: _*) &&
              col("term").isInCollection(distinctTerms))
          val decoded = PostingBlocks.decodePostingsWithPositions(blocks)
          var joined = decoded.where(col("term") === terms.head)
            .select(col("doc_id"), col("dl"), col("positions").as("_p0"))
          for (i <- 1 until terms.size)
            joined = joined.join(
              decoded.where(col("term") === terms(i))
                .select(col("doc_id"), col("positions").as(s"_p$i")), "doc_id")
          def chain(i: Int, prev: Column, p1: Column): Column =
            if (i == terms.size) lit(true)
            else exists(col(s"_p$i"), pi =>
              pi > prev && pi <= p1 + lit(i + slop) && chain(i + 1, pi, p1))
          val pf = size(filter(col("_p0"), p1 => chain(1, p1, p1)))
          Some(joined
            .withColumn("_pf", pf)
            .where(col("_pf") > 0)
            .select(lit(qid).as("query_id"), col("doc_id"),
              (lit(idfSum) * col("_pf") /
                (col("_pf") + lit(Bm25.K1) * (lit(1.0) - lit(Bm25.B) +
                  lit(Bm25.B) * col("dl") / lit(idx.stats.avgdl)))).as("_score")))
        }
      }
    }
    if (perQuery.isEmpty) empty
    else Search.rank(perQuery.reduce(_ unionByName _), k)
  }

  /** A term's block spanning more ranges than this is treated as "global"
    * in the range-prune bound (its max adds to EVERY range's upper bound)
    * instead of being exploded per spanned range — bounding the prune
    * pass's own metadata fan-out the same way precise routing bounds the
    * block fan-out. */
  private final val GlobalSpanRanges = 64

  /** The θ-seed range prune runs only when the corpus spans at least this
    * many ranges: its seed-collect job and metadata-bound subplan are
    * fixed per-call costs, and below ~this fan-out they exceed anything
    * the prune can save (measured: at 4 ranges the extra jobs quartered
    * batch query throughput while pruning almost nothing). At the design
    * scale (10^6 ranges) the prune's per-call cost is unchanged while its
    * savings grow with the fan-out. */
  private final val MinRangesForPrune = 16L

  /** Candidate blocks for the WAND traversal, routed per (query, range),
    * plus the per-query θ seed. Exposed for WandSpec's block-count
    * assertion; `prune=false` disables the θ-seed range prune (routing
    * stays precise).
    *
    * ROUTING is precise (round-2 advice): a block ships only to ranges
    * that actually CONTAIN one of its postings — the doc ids are decoded
    * map-side (codegen'd varint expression, pre-shuffle) and distinct
    * range ids exploded, so a sparse term's block spanning the whole doc
    * space shuffles to ≤ block_len ranges, not nDocs/rangeSize.
    *
    * PRUNING (dictionary/block max-score at query time): θ_seed(q) = the
    * largest over q's terms of the k-th largest block_max_score of that
    * term — k distinct docs (blocks of one term are doc-disjoint) each
    * achieve their block's max from that term alone and other terms only
    * add, so θ_seed is a true lower bound on the final k-th best raw
    * score. A (query, range) group whose upper bound — Σ over terms of the
    * term's max block-max among blocks overlapping the range (span-based,
    * an over-estimate of the precise routing) — falls below θ_seed − Eps
    * cannot produce a global top-k doc and ships nothing. On a hot+rare
    * query the rare term's high seed erases the hot term's blocks
    * everywhere the rare term is absent. Both passes are metadata-only
    * (columnar scan of the pruned shards, no binary columns). Skipped when
    * the corpus has a single range (sandbox scale): zero extra jobs. */
  private[graft] def wandBlocks(idx: OpenIndex, queries: Seq[(Int, String)],
                                k: Int, docsPerRange: Long,
                                prune: Boolean = true)
      : Option[(org.apache.spark.sql.Dataset[QBlockRow], Map[Int, Double], Long)] = {
    val spark = idx.spark
    import spark.implicits._
    val qt = Search.queryTerms(Search.queryFrame(spark, queries))
    val qd = qt.join(idx.dictionary, "term")
      .select("query_id", "term", "df", "shard")
    val shards = qd.select("shard").distinct().collect().map(_.getInt(0)).toSeq
    if (shards.isEmpty) return None
    val rangeSize = math.max(1L, math.min(docsPerRange, idx.stats.nDocs))
    val nRanges = (idx.stats.nDocs + rangeSize - 1) / rangeSize
    val base = idx.io.read(spark, idx.paths.postings)
      .where(col("shard").isin(shards: _*))
      .join(broadcast(qd.select("query_id", "term", "df")), Seq("term"))
    // exact integer range id: (d - d mod rs) / rs — the numerator is an
    // exact multiple of rs, so the double division is exact (plain d / rs
    // can cross an integer boundary for huge doc ids)
    def rangeOf(c: Column): Column =
      ((c - pmod(c, lit(rangeSize))) / lit(rangeSize)).cast("int")
    // decode only blocks that actually SPAN a range boundary (rare: dense
    // terms' 128-posting blocks sit inside one 2^20-doc range) — the
    // common case routes with pure arithmetic, no decode
    val routed0 = base.withColumn("range_id",
      explode(when(rangeOf(col("first_doc")) === rangeOf(col("last_doc")),
          array(rangeOf(col("first_doc"))))
        .otherwise(array_distinct(transform(
          graft.index.codec.varintDeltaDecode(col("doc_gaps")), d => rangeOf(d))))))

    val (routed, seeds) =
      if (!prune || nRanges < MinRangesForPrune) (routed0, Map.empty[Int, Double])
      else {
        import org.apache.spark.sql.expressions.Window
        val wqt = Window.partitionBy("query_id", "term")
          .orderBy(col("block_max_score").desc)
        val seedMap = base.select("query_id", "term", "block_max_score")
          .withColumn("_r", row_number().over(wqt))
          .where(col("_r") === k) // k-th largest block max of the term
          .groupBy("query_id").agg(max("block_max_score").as("_seed"))
          .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
        if (seedMap.isEmpty) (routed0, seedMap)
        else {
          val meta = base.select(col("query_id"), col("term"),
            col("block_max_score"),
            rangeOf(col("first_doc")).as("_r0"), rangeOf(col("last_doc")).as("_r1"))
          val local = meta.where(col("_r1") - col("_r0") < lit(GlobalSpanRanges))
            .withColumn("range_id", explode(sequence(col("_r0"), col("_r1"))))
            .groupBy("query_id", "range_id", "term")
            .agg(max("block_max_score").as("_m"))
            .groupBy("query_id", "range_id").agg(sum("_m").as("_lb"))
          val global = meta.where(col("_r1") - col("_r0") >= lit(GlobalSpanRanges))
            .groupBy("query_id", "term").agg(max("block_max_score").as("_m"))
            .groupBy("query_id").agg(sum("_m").as("_gb"))
          val seedsDf = seedMap.toSeq.toDF("query_id", "_seed")
          // `local` scales with |queries| × populated ranges — at design
          // scale that is NOT broadcastable, so let Catalyst pick (it
          // auto-broadcasts when small); `global`/`seeds` are O(|queries|)
          val kept = routed0
            .join(local, Seq("query_id", "range_id"), "left")
            .join(broadcast(global), Seq("query_id"), "left")
            .join(broadcast(seedsDf), Seq("query_id"), "left")
            .where(coalesce(col("_lb"), lit(0.0)) + coalesce(col("_gb"), lit(0.0)) >=
              coalesce(col("_seed"), lit(Double.NegativeInfinity)) - lit(BlockMaxWand.Eps))
            .drop("_lb", "_gb", "_seed")
          (kept, seedMap)
        }
      }
    val ds = routed
      .select(col("query_id"), col("range_id"), col("term"), col("df"),
        col("first_doc"), col("last_doc"), col("doc_gaps"), col("tfs"),
        col("dls"), col("block_max_score"))
      .as[QBlockRow]
    Some((ds, seeds, rangeSize))
  }

  /** Block-max WAND fast path (disjunctive top-k). Same output as
    * [[search]] — the WandSpec property.
    *
    * Parallelism is across (query, doc-range) pairs, NOT one task per
    * query: the corpus doc-id space splits into fixed ranges of
    * `docsPerRange`, each candidate block routes PRECISELY to the ranges
    * containing its postings (see [[wandBlocks]]), the range-bounded WAND
    * traversal ([[BlockMaxWand.topKRange]]) produces that range's exact
    * top-k seeded with the per-query θ lower bound, and the per-range
    * top-k's rank-merge globally through the same pinned ordering
    * ([[Search.rank]] — a window over ≤ ranges×k candidate rows per
    * query). Exactness: BM25 is additive per doc, every doc lives in
    * exactly one range, and a doc in the global top-k is necessarily in
    * its range's top-k under the pinned order; the θ seed and the range
    * prune only ever discard docs provably below the final k-th score. */
  def searchWand(idx: OpenIndex, queries: Seq[(Int, String)], k: Int = 10,
                 docsPerRange: Long = DefaultDocsPerRange): DataFrame = {
    val spark = idx.spark
    import spark.implicits._
    val planned = wandBlocks(idx, queries, k, docsPerRange)
    if (planned.isEmpty)
      return Seq.empty[ResultRow].toDF()
        .select(col("query_id"), col("rank"), col("doc_id"), col("score"))
    val (blocks, seeds, rs) = planned.get
    val (nDocs, avgdl, kk) = (idx.stats.nDocs, idx.stats.avgdl, k)
    val candidates = blocks.groupByKey(r => (r.query_id, r.range_id))
      .flatMapGroups { (key: (Int, Int), rows: Iterator[QBlockRow]) =>
        val (qid, rid) = key
        // bounded by the range width: ≤ |terms| × rangeSize/blockSize blocks
        val byTerm = rows.toVector.groupBy(_.term)
        val terms = byTerm.valuesIterator.map { trs =>
          val sorted = trs.sortBy(_.first_doc)
          BlockMaxWand.TermPostings(sorted.head.df,
            sorted.map(r => BlockMaxWand.BlockRef(r.first_doc, r.last_doc,
              r.block_max_score, r.doc_gaps, r.tfs, r.dls)).toArray)
        }.toSeq
        val lo = rid.toLong * rs
        val seed = seeds.getOrElse(qid, Double.NegativeInfinity)
        BlockMaxWand.topKRange(terms, kk, nDocs, avgdl, lo, lo + rs, seed)
          .iterator.map { case (doc, s) => (qid, doc, s) }
      }
      .toDF("query_id", "doc_id", "_score")
    Search.rank(candidates, k)
  }
}
