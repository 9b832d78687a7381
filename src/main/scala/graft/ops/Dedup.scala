package graft.ops

import graft.analysis.Analyzer
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Near-duplicate detection operators: MinHash+LSH, SimHash, and n-gram
  * Jaccard. All hash functions derive from md5 so the DuckDB oracle can
  * reproduce them bit-for-bit (Spark xxhash64 has no DuckDB twin).
  *
  * Scale shape (the point of LSH): candidate generation is a self-join on
  * small band buckets — postings-style shuffles keyed on the bucket, never
  * an all-pairs product. The exact-Jaccard verify touches only candidate
  * pairs. HOT-BUCKET GUARD: docs are first collapsed into groups with
  * identical dedup keys (identical shingle SET for MinHash/Jaccard,
  * identical simhash value for SimHash) and the banded self-join runs over
  * one REPRESENTATIVE per group — a million-doc exact-dup cluster
  * contributes ONE row per band to candidate generation instead of making
  * one bucket quadratic. The (inherently quadratic) member-pair expansion
  * of verified group pairs is distributed: within-group pairs are
  * enumerated arithmetically (each member row emits its O(n) partners —
  * no single task ever OWNS O(n²) input rows) and cross-group expansion
  * salts the build side. Output is provably identical to the naive
  * all-docs banding because group members are interchangeable under the
  * respective metric.
  *
  * Cache lifecycle (self-contained — no caller contract): each pair
  * operator caches its corpus-derived relations only for the duration of
  * the call, materializes the small candidate/group frames to temp
  * parquet, and unpersists everything before returning; the returned plan
  * touches only the materialized relations (the
  * [[Similarity.cosinePairs]] idiom).
  */
object Dedup {

  final val NumHashes = 16
  final val BandRows = 4 // 4 bands × 4 rows
  final val SimhashBits = 60

  /** 32-bit hash of a term under hash-function index i, via md5 — the
    * oracle twin is ('0x' || substr(md5(t || '#' || i), 1, 8))::BIGINT. */
  def h32(term: Column, i: Column): Column =
    conv(substring(md5(concat(term, lit("#"), i.cast("string"))), 1, 8), 16, 10)
      .cast("long")

  /** Distinct (doc_id, term) pairs. */
  def docTerms(corpus: DataFrame): DataFrame =
    corpus.select(col("doc_id"), explode(Analyzer.tokens(col("text"))).as("term"))
      .distinct()

  /** MinHash signatures over a (doc_id, term) set relation:
    * (doc_id, sig: array<long> of NumHashes mins).
    *
    * Single pass: NumHashes parallel `min` aggregates over the un-inflated
    * relation (the previous explode(0..15) form multiplied every shingle
    * row 16× BEFORE the shuffle — pure shuffle-volume waste; the hash
    * evaluations are the same either way but now happen map-side). */
  def minhashSignatures(dt: DataFrame): DataFrame =
    dt.groupBy("doc_id").agg(
      array((0 until NumHashes).map(i =>
        min(h32(col("term"), lit(i)))): _*).as("sig"))

  /** LSH band buckets: (doc_id, band, bucket). */
  def bands(signatures: DataFrame): DataFrame =
    signatures.select(col("doc_id"),
        explode(sequence(lit(0), lit(NumHashes / BandRows - 1))).as("band"),
        col("sig"))
      .select(col("doc_id"), col("band"),
        md5(array_join(slice(col("sig"), col("band") * BandRows + 1, lit(BandRows)), ","))
          .as("bucket"))

  /** Salt factor for the cross-group member-pair expansion build side. */
  private final val ExpandSalts = 16

  /** Expand verified GROUP pairs into member DOC pairs.
    *
    * `repPairs` is (doc_a=rep ga, doc_b=rep gb, <metric>) with ga ≠ gb;
    * `members` is (doc_id, gid). Cross-group expansion joins members of ga
    * (distributed over the ga members) against members of gb with the
    * build side replicated over [[ExpandSalts]] salts, so two hot groups
    * split their |A|·|B| output across salts instead of one task. Pairs
    * WITHIN a group (metric = `withinValue`: jaccard 1.0 / hamming 0) are
    * enumerated arithmetically: member i (rank within group) emits its
    * partners j > i via an index join on (gid, j) — n distinct join keys
    * per group, so no task owns O(n²) input rows even for one huge
    * exact-dup cluster (DedupRecallSpec pins this). */
  private def expandGroupPairs(repPairs: DataFrame, members: DataFrame,
                               metric: String, withinValue: Column): DataFrame = {
    val mA = members.select(col("gid").as("ga"), col("doc_id").as("_da"))
    val mB = members.select(col("gid").as("gb"), col("doc_id").as("_db"))
      .withColumn("_salt",
        explode(sequence(lit(0), lit(ExpandSalts - 1))))
    val cross = repPairs
      .select(col("doc_a").as("ga"), col("doc_b").as("gb"), col(metric))
      .join(mA, "ga")
      .withColumn("_salt", pmod(xxhash64(col("_da")), lit(ExpandSalts)).cast("int"))
      .join(mB, Seq("gb", "_salt"))
      .select(least(col("_da"), col("_db")).as("doc_a"),
        greatest(col("_da"), col("_db")).as("doc_b"), col(metric))
    val idx = members.withColumn("_i",
      row_number().over(Window.partitionBy("gid").orderBy("doc_id")) - 1)
    val sizes = members.groupBy("gid").agg(count(lit(1)).as("_n"))
    val within = idx.join(sizes, "gid")
      .where(col("_i") < col("_n") - 1)
      // spread member rows across tasks BEFORE the explode so pair
      // GENERATION distributes too (the window above necessarily
      // co-located each group in one partition)
      .repartition(col("doc_id"))
      .withColumn("_j", explode(sequence(col("_i") + 1, col("_n") - 1)))
      .select(col("gid"), col("doc_id").as("doc_a"), col("_j"))
      .join(idx.select(col("gid"), col("_i").as("_j"), col("doc_id").as("doc_b")),
        Seq("gid", "_j"))
      .select(col("doc_a"), col("doc_b"), withinValue.as(metric))
    cross.unionByName(within)
  }

  /** (doc_id, gid) with gid = the group's smallest doc_id, grouping by the
    * given per-doc key column (identical key ⟺ same group). Two-phase
    * (groupBy min + join back) — the hot-group key only ever carries O(n)
    * rows through any one task. */
  private def groupByKey(perDoc: DataFrame, key: String): DataFrame = {
    val gids = perDoc.groupBy(key).agg(min("doc_id").as("gid"))
    perDoc.join(gids, key).select("doc_id", "gid")
  }

  /** MinHash+LSH near-dup pairs over 3-gram SHINGLE sets (shingles, not
    * token sets: a 31-term vocab makes token-set Jaccard useless — nearly
    * every doc pair collides). Docs collapse into identical-shingle-SET
    * groups (members are interchangeable under Jaccard); candidates are
    * REPRESENTATIVE pairs sharing ≥1 band bucket, verified with EXACT
    * shingle Jaccard at rep level, kept if ≥ threshold, then expanded to
    * member pairs (within-group pairs have jaccard exactly 1.0 ≥ any valid
    * threshold). Output: (doc_a, doc_b, jaccard) — jaccard rounded to 4 —
    * provably identical to banding all docs directly.
    *
    * Cache lifecycle: self-contained (see object doc). */
  def minhashPairs(corpus: DataFrame, threshold: Double = 0.7,
                   n: Int = 3): DataFrame = {
    require(threshold <= 1.0, s"jaccard threshold must be <= 1.0, got $threshold")
    val spark = corpus.sparkSession
    val sh = shingles(corpus, n).cache()
    var shReps: DataFrame = null
    try {
      val fps = sh.groupBy("doc_id").agg(
        md5(array_join(array_sort(collect_list(col("term"))), "\u0001")).as("_fp"))
      val membersPath = graft.TempDirs.create("graft_mh_members")
      groupByKey(fps, "_fp").write.mode("overwrite").parquet(membersPath)
      val members = spark.read.parquet(membersPath)
      val reps = members.where(col("doc_id") === col("gid")).select("doc_id")
      shReps = sh.join(reps, Seq("doc_id"), "left_semi").cache()
      val b = bands(minhashSignatures(shReps))
      val candPath = graft.TempDirs.create("graft_mh_cand")
      b.as("x").join(b.as("y"),
          col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
        .distinct()
        .write.mode("overwrite").parquet(candPath)
      val repPairsPath = graft.TempDirs.create("graft_mh_reppairs")
      withJaccard(spark.read.parquet(candPath), shReps)
        .where(col("jaccard") >= threshold)
        .write.mode("overwrite").parquet(repPairsPath)
      expandGroupPairs(spark.read.parquet(repPairsPath), members,
        "jaccard", lit(1.0))
        .orderBy("doc_a", "doc_b")
    } finally {
      sh.unpersist()
      if (shReps != null) shReps.unpersist()
    }
  }

  /** Exact Jaccard for given (doc_a, doc_b) pairs over distinct tokens.
    * The verify only ever touches docs that appear in a candidate pair —
    * the term relation is semi-join-pruned to them first, so the two
    * intersection joins and the size aggregation scale with the CANDIDATE
    * set, not the corpus (LSH's whole point carried through to the
    * verify). */
  def withJaccard(pairs: DataFrame, docTerms: DataFrame): DataFrame = {
    // the pair set feeds candDocs AND three joins below — callers pass a
    // MATERIALIZED (or cheap-to-recompute) pairs relation, so the repeated
    // subtree is a small parquet scan, not a re-run of the self-join
    val candDocs = pairs.select(col("doc_a").as("doc_id"))
      .unionByName(pairs.select(col("doc_b").as("doc_id"))).distinct()
    val dt = docTerms.join(candDocs, Seq("doc_id"), "left_semi")
    val sizes = dt.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val inter = pairs
      .join(dt.select(col("doc_id").as("doc_a"), col("term")), "doc_a")
      .join(dt.select(col("doc_id").as("doc_b"), col("term")),
        Seq("doc_b", "term"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("inter"))
    pairs
      .join(inter, Seq("doc_a", "doc_b"), "left")
      .na.fill(0L, Seq("inter"))
      .join(sizes.select(col("doc_id").as("doc_a"), col("sz").as("sza")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("sz").as("szb")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        round(col("inter").cast("double") /
          (col("sza") + col("szb") - col("inter")), 4).as("jaccard"))
  }

  /** 60-bit SimHash per doc, tf-weighted. (doc_id, simhash). */
  def simhash(corpus: DataFrame): DataFrame = {
    val tf = corpus
      .select(col("doc_id"), explode(Analyzer.tokens(col("text"))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .withColumn("h",
        conv(substring(md5(col("term")), 1, 15), 16, 10).cast("long"))
    // ONE hash aggregation with 60 conditional-sum columns. The previous
    // shape exploded every (doc, term) row 60× and paid TWO shuffles
    // (doc×60 rows, then doc); the per-bit weight sums are plain integer
    // sums, so folding them into 60 parallel aggregates of one
    // groupBy(doc_id) pass is bit-identical while shuffling 60× fewer
    // rows with full map-side partial aggregation (guide §2.3).
    val wsums = (0 until SimhashBits).map(j =>
      sum(when(expr(s"(shiftright(h, $j) & 1) = 1"), col("tf"))
        .otherwise(-col("tf"))).as(s"_w$j"))
    tf.groupBy("doc_id").agg(wsums.head, wsums.tail: _*)
      .select(col("doc_id"),
        (0 until SimhashBits).map(j =>
          when(col(s"_w$j") > 0, lit(1L << j)).otherwise(lit(0L)))
          .reduce(_ + _).as("simhash"))
      .orderBy("doc_id")
  }

  /** SimHash near-dup pairs: band on 4×15-bit chunks, then hamming ≤ maxDist.
    * Docs collapse into identical-simhash-VALUE groups (hamming depends on
    * the values alone, so members are interchangeable); banding and the
    * hamming check run over group representatives, then verified group
    * pairs expand to member pairs (within-group hamming is exactly 0).
    * Output (doc_a, doc_b, hamming) — identical to banding all docs.
    *
    * Recall contract (pigeonhole): with 4 bands, a pair differing in at
    * most 3 bits must leave at least one band identical, so every pair
    * with hamming ≤ 3 is found. maxDist > 3 would silently lose pairs
    * whose differing bits spread across all 4 bands — hence the require.
    * DedupRecallSpec property-tests this against brute-force hamming.
    *
    * Cache lifecycle: self-contained (see object doc). */
  def simhashPairs(corpus: DataFrame, maxDist: Int = 3): DataFrame = {
    val nBands = SimhashBits / 15 // 4 bands of 15 bits
    require(maxDist >= 0,
      s"maxDist must be non-negative (got $maxDist) — the identical-" +
        "signature group expansion always emits hamming-0 pairs")
    require(maxDist < nBands,
      s"simhash banding with $nBands bands only guarantees recall for " +
        s"hamming <= ${nBands - 1}; got maxDist=$maxDist")
    val spark = corpus.sparkSession
    val sg = simhash(corpus).cache()
    try {
      val membersPath = graft.TempDirs.create("graft_sh_members")
      groupByKey(sg, "simhash").write.mode("overwrite").parquet(membersPath)
      val members = spark.read.parquet(membersPath)
      val reps = sg.join(members.where(col("doc_id") === col("gid"))
        .select("doc_id"), Seq("doc_id"), "left_semi")
      val banded = reps.select(col("doc_id"), col("simhash"),
        explode(sequence(lit(0), lit(nBands - 1))).as("band"))
        .withColumn("chunk", expr("shiftright(simhash, band * 15) & 32767"))
      val repPairsPath = graft.TempDirs.create("graft_sh_reppairs")
      banded.as("x").join(banded.as("y"),
          col("x.band") === col("y.band") && col("x.chunk") === col("y.chunk") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
          col("x.simhash").as("sha"), col("y.simhash").as("shb"))
        .distinct()
        .withColumn("hamming",
          bit_count(col("sha").bitwiseXOR(col("shb"))).cast("int"))
        .where(col("hamming") <= maxDist)
        .select("doc_a", "doc_b", "hamming")
        .write.mode("overwrite").parquet(repPairsPath)
      expandGroupPairs(spark.read.parquet(repPairsPath), members,
        "hamming", lit(0).cast("int"))
        .orderBy("doc_a", "doc_b")
    } finally sg.unpersist()
  }

  /** Token n-gram (shingle) strings per doc, distinct. */
  def shingles(corpus: DataFrame, n: Int = 3): DataFrame = {
    val toks = Analyzer.tokens(col("text"))
    corpus.select(col("doc_id"), toks.as("_t"))
      .where(size(col("_t")) >= n)
      .select(col("doc_id"), explode(array_distinct(
        transform(sequence(lit(0), size(col("_t")) - n),
          i => concat_ws(" ", (0 until n).map(o => element_at(col("_t"), i + o + 1)): _*))))
        .as("term"))
  }

  /** Shingles with df above this are excluded from CANDIDATE generation
    * (not from the Jaccard verify): a shingle shared by hundreds of docs
    * is a stop-shingle — joining on it produces a quadratic pair blowup
    * while discriminating nothing. Standard prefix/stop filtering. */
  final val MaxCandidateShingleDf = 20L

  /** n-gram Jaccard near-dup pairs: candidates share ≥1 RARE shingle
    * (df ≤ [[MaxCandidateShingleDf]]); kept if exact shingle-set Jaccard
    * ≥ threshold. Output (doc_a, doc_b, jaccard). The df cap is this
    * family's hot-bucket guard: a stop-shingle shared by thousands of
    * docs never reaches the candidate self-join.
    *
    * Cache lifecycle: self-contained (see object doc) — candidates and
    * the candidate-pruned shingle relation are materialized, the shingle
    * cache is dropped, and the returned verify plan reads only the
    * materialized frames. */
  def ngramJaccardPairs(corpus: DataFrame, n: Int = 3,
                        threshold: Double = 0.3): DataFrame = {
    val spark = corpus.sparkSession
    val sh = shingles(corpus, n).cache()
    try {
      val dfs = sh.groupBy("term").agg(count(lit(1)).as("_df"))
      val shRare = sh.join(dfs.where(col("_df") <= MaxCandidateShingleDf)
        .select("term"), "term")
      // Candidate pair AND its shared-RARE-shingle count from ONE
      // aggregation over the self-join output. The previous shape
      // `.distinct()`ed the very same join output (equal shuffle cost),
      // threw the share-count away, and then re-derived the WHOLE
      // intersection in the verify by expanding every candidate pair
      // against all of doc_a's shingles — a |pairs| × shingles-per-doc
      // row blowup that dominated the operator (guide §1.2: the
      // distributed algorithm first).
      val candPath = graft.TempDirs.create("graft_ng_cand")
      shRare.as("x").join(shRare.as("y"),
          col("x.term") === col("y.term") && col("x.doc_id") < col("y.doc_id"))
        .groupBy(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("_inter_rare"))
        .write.mode("overwrite").parquet(candPath)
      val cand = spark.read.parquet(candPath)
      // Shared STOP shingles (df > cap) complete the EXACT intersection:
      // per-doc shingles are distinct, and every shared shingle is
      // exactly one of rare/stop, so inter = inter_rare + inter_stop.
      // The stop relation is ≤ stop-shingles-per-doc × |docs| rows —
      // never larger than the full shingle relation, so this pair of
      // joins is strictly cheaper than the old full re-expansion.
      val shStop = sh.join(dfs.where(col("_df") > MaxCandidateShingleDf)
        .select("term"), "term")
      val interStop = cand.select("doc_a", "doc_b")
        .join(shStop.select(col("doc_id").as("doc_a"), col("term")), "doc_a")
        .join(shStop.select(col("doc_id").as("doc_b"), col("term")),
          Seq("doc_b", "term"))
        .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("_inter_stop"))
      val candDocs = cand.select(col("doc_a").as("doc_id"))
        .unionByName(cand.select(col("doc_b").as("doc_id"))).distinct()
      val sizes = sh.join(candDocs, Seq("doc_id"), "left_semi")
        .groupBy("doc_id").agg(count(lit(1)).as("sz"))
      val outPath = graft.TempDirs.create("graft_ng_out")
      cand
        .join(interStop, Seq("doc_a", "doc_b"), "left")
        .na.fill(0L, Seq("_inter_stop"))
        .join(sizes.select(col("doc_id").as("doc_a"), col("sz").as("sza")), "doc_a")
        .join(sizes.select(col("doc_id").as("doc_b"), col("sz").as("szb")), "doc_b")
        .select(col("doc_a"), col("doc_b"),
          round((col("_inter_rare") + col("_inter_stop")).cast("double") /
            (col("sza") + col("szb") - col("_inter_rare") - col("_inter_stop")),
            4).as("jaccard"))
        .where(col("jaccard") >= threshold)
        .write.mode("overwrite").parquet(outPath)
      spark.read.parquet(outPath).orderBy("doc_a", "doc_b")
    } finally sh.unpersist()
  }

  /** Near-duplicate CLUSTERS from a pair relation — the step a real
    * training-data dedup pipeline runs AFTER [[minhashPairs]] (pairs
    * alone don't dedupe anything: keep/drop decisions need the transitive
    * closure): connected components by iterative min-label propagation,
    * output (doc_id, rep) where `rep` is the component's minimum doc_id —
    * the canonical "keep" representative; docs in no pair are absent
    * (singleton components are implicit).
    *
    * Scale shape: each round is ONE edge join + ONE min-aggregation,
    * materialized to temp parquet between rounds (truncated lineage —
    * iterative plans otherwise stack), with O(1) driver state (the
    * changed-count). Plain propagation converges in ≤ component-diameter
    * rounds; near-dup components are dense (similarity is near-
    * transitive), so diameters are small in practice. For adversarial
    * long-chain graphs the published fix is alternating large-star/
    * small-star (Kiveris et al., "Connected Components in MapReduce and
    * Beyond", SoCC 2014) — same per-round primitives, O(log² n) rounds;
    * `maxIters` FAILS LOUDLY rather than silently truncating, per the
    * no-silent-caps rule. */
  def components(pairs: DataFrame, maxIters: Int = 25): DataFrame = {
    val spark = pairs.sparkSession
    val edgesPath = graft.TempDirs.create("graft_cc_edges")
    pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionByName(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .distinct()
      .write.mode("overwrite").parquet(edgesPath)
    val edges = spark.read.parquet(edgesPath)
    var labelsPath = graft.TempDirs.create("graft_cc_l0")
    // convergence test piggybacks on each round's WRITE action via an
    // observed Σrep metric instead of a separate join+count job per round
    // (guide §1.2 — fewer passes): labels are non-increasing under
    // min-propagation and the key set is constant (symmetrized edges ⇒
    // every dst is already a labeled node), so ANY label change strictly
    // decreases Σrep. The true decrease is positive and < 2^64, so even a
    // wrapped 64-bit sum changes iff a label changed.
    def writeObserved(df: DataFrame, path: String): Long = {
      val obs = org.apache.spark.sql.Observation()
      df.observe(obs, sum(col("rep")).as("s"))
        .write.mode("overwrite").parquet(path)
      // null metric ⟺ empty frame
      Option(obs.get.getOrElse("s", null)).fold(0L)(_.asInstanceOf[Long])
    }
    var prevSum = writeObserved(
      edges.select(col("src").as("doc_id")).distinct()
        .withColumn("rep", col("doc_id")), labelsPath)
    var iter = 0
    var changed = true
    while (changed) {
      require(iter < maxIters,
        s"components did not converge in $maxIters rounds — a pathological " +
          "long-chain graph; raise maxIters or switch to large-star/small-star")
      val labels = spark.read.parquet(labelsPath)
      val next = labels
        .join(edges, labels("doc_id") === edges("src"))
        .select(edges("dst").as("doc_id"), labels("rep"))
        .unionByName(labels)
        .groupBy("doc_id").agg(min(col("rep")).as("rep"))
      val nextPath = graft.TempDirs.create(s"graft_cc_l${iter + 1}")
      val nextSum = writeObserved(next, nextPath)
      changed = nextSum != prevSum
      prevSum = nextSum
      labelsPath = nextPath
      iter += 1
    }
    spark.read.parquet(labelsPath).orderBy("doc_id")
  }

  /** Depth-bounded BFS over a near-dup pair relation — the Solr
    * `{!graph from=… to=… maxDepth=d}` traversal shape applied to the
    * decontamination-hardening step real pipelines run: eval-set
    * contamination propagates to near-duplicates of contaminated docs
    * TRANSITIVELY, but only to a bounded hop radius (unbounded closure is
    * [[components]]). Output (doc_id, depth) for every doc reachable from
    * a seed within `maxDepth` hops, depth = MINIMUM hop distance (BFS
    * invariant: a doc joins the visited set the first round it appears
    * and is anti-joined out of later frontiers). Seeds in no pair still
    * report depth 0 — killing a contaminated doc never depends on it
    * having near-dups.
    *
    * Scale shape: per round ONE frontier ⋈ edges join (frontier keys
    * only — no payload rides the loop) + ONE anti-join against visited,
    * each round materialized to temp parquet (truncated lineage, the
    * [[components]] idiom); driver state is the loop counter and a
    * frontier row count. Rounds are `maxDepth` — a caller CONSTANT, not
    * data-dependent. */
  def bfsExpand(pairs: DataFrame, seeds: DataFrame,
                maxDepth: Int): DataFrame = {
    require(maxDepth >= 0, s"maxDepth must be >= 0 (got $maxDepth)")
    val spark = pairs.sparkSession
    val edgesPath = graft.TempDirs.create("graft_bfs_edges")
    pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionByName(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .distinct()
      .write.mode("overwrite").parquet(edgesPath)
    val edges = spark.read.parquet(edgesPath)
    var visitedPath = graft.TempDirs.create("graft_bfs_v0")
    seeds.select(col("doc_id")).distinct()
      .withColumn("depth", lit(0))
      .write.mode("overwrite").parquet(visitedPath)
    var depth = 0
    var frontierRows = 1L
    while (depth < maxDepth && frontierRows > 0) {
      val visited = spark.read.parquet(visitedPath)
      val frontier = visited.where(col("depth") === depth)
      val next = frontier
        .join(edges, frontier("doc_id") === edges("src"))
        .select(edges("dst").as("doc_id")).distinct()
        .join(visited, Seq("doc_id"), "left_anti")
        .withColumn("depth", lit(depth + 1))
      val nextPath = graft.TempDirs.create(s"graft_bfs_v${depth + 1}")
      // O(1) driver state: the new-frontier row count rides the write
      // action as an observed metric (no separate read-back count job)
      val obs = org.apache.spark.sql.Observation()
      visited.unionByName(next)
        .observe(obs, sum(when(col("depth") === depth + 1, 1L).otherwise(0L))
          .as("f"))
        .write.mode("overwrite").parquet(nextPath)
      frontierRows =
        Option(obs.get.getOrElse("f", null)).fold(0L)(_.asInstanceOf[Long])
      visitedPath = nextPath
      depth += 1
    }
    spark.read.parquet(visitedPath).orderBy("doc_id")
  }

  /** PAGERANK over the (symmetrized) near-dup pair graph — the canonical
    * whole-corpus iterative graph computation (Page et al. 1999; the
    * Pregel/GraphX reference workload), here ranking CENTRALITY within
    * duplicate neighborhoods (a high-PR doc is the natural cluster
    * representative — an alternative keep-rule to [[components]]' min
    * id). Pinned semantics shared verbatim with the twin: nodes = docs
    * in ≥ 1 pair (symmetric graph ⇒ no dangling nodes), pr₀ = 1/N,
    * pr_{t+1} = (1−d)/N + d·Σ_in pr_t/deg, every iterate ROUNDED to
    * 9 dp (the kmeans per-iteration pinning — unordered cross-engine
    * sums must re-agree before the next round). Fixed `iters`, output
    * (doc_id, pr) ordered by doc_id.
    *
    * Scale shape: per round ONE edges ⋈ ranks join (ranks are 16-byte
    * rows) + ONE dst-keyed sum — the textbook map-reduce PageRank
    * round; degrees computed once; N is a 1-row collect; rounds are a
    * caller constant. Edges materialize once to temp parquet; the
    * 3-deep rank lineage needs no checkpointing at fixed small iters. */
  def pagerank(pairs: DataFrame, iters: Int, d: Double = 0.85): DataFrame = {
    require(iters >= 1 && iters <= 20, s"iters must be in [1,20] (got $iters)")
    require(d > 0 && d < 1, s"damping must be in (0,1) (got $d)")
    val spark = pairs.sparkSession
    val edgesPath = graft.TempDirs.create("graft_pr_edges")
    pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionByName(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .distinct()
      .write.mode("overwrite").parquet(edgesPath)
    val edges = spark.read.parquet(edgesPath)
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    val n = deg.count() // 1-row driver scalar
    var ranks = deg.select(col("src").as("doc_id"),
      round(lit(1.0) / n, 9).as("pr"))
    for (_ <- 1 to iters) {
      val contribs = edges
        .join(ranks.withColumnRenamed("doc_id", "src"), Seq("src"))
        .join(deg, Seq("src"))
        .select(col("dst").as("doc_id"), (col("pr") / col("deg")).as("_c"))
        .groupBy("doc_id").agg(sum(col("_c")).as("_in"))
      ranks = contribs.select(col("doc_id"),
        round(lit((1.0 - d) / n) + lit(d) * col("_in"), 9).as("pr"))
    }
    ranks.orderBy("doc_id")
  }

  /** FineWeb-style cluster keep rule: connected components over the
    * near-dup pair graph, then ONE representative per cluster kept by
    * QUALITY (the 4dp-pinned [[TextOps.quality]] score DESC, doc_id ASC
    * tie-break) instead of [[components]]' min-id rule — "keep the best
    * copy", the decision a production training-data dedup actually ends
    * with. `scores` must carry (doc_id, quality_score) for every doc in
    * `pairs`. Scale shape: the window partitions by cluster rep — work is
    * bounded by pair-graph membership, never the corpus. */
  def keepBestByQuality(pairs: DataFrame, scores: DataFrame): DataFrame = {
    val w = Window.partitionBy("rep")
      .orderBy(col("quality_score").desc, col("doc_id").asc)
    components(pairs)
      .join(scores.select("doc_id", "quality_score"), "doc_id")
      .withColumn("keep", row_number().over(w) === 1)
      .select("doc_id", "rep", "quality_score", "keep")
      .orderBy("doc_id")
  }

  /** BLOOM-FILTER INCREMENTAL DEDUP (the AllenAI dolma deduper shape
    * [PUB]: screen a NEW crawl batch against an already-processed corpus
    * through a Bloom filter, so incremental dedup never joins the new
    * batch against the full corpus): the existing corpus's exact-dup keys
    * ([[TextOps.fingerprints]] `fp`, md5 of the normalized token stream)
    * populate an `mBits`-bit filter via `kHashes` double-hashed probes
    * (Kirsch–Mitzenmacher: pᵢ = (h1 + i·h2) mod m, h1/h2 = the fp's
    * first/second 8 hex chars — exact integer arithmetic, so the DuckDB
    * twin reproduces every bit). Each incoming doc reports `bloom_hit`
    * (all k bits set — "maybe already seen"), `exact_dup` (true
    * membership), and `false_pos` (bloom_hit without membership — the
    * filter's false positives, surfaced rather than hidden; no false
    * NEGATIVES is the structural guarantee the spec asserts).
    *
    * Scale shape: training is ONE distinct-positions aggregate whose
    * result is ≤ mBits rows (the FILTER size, a constant — never
    * corpus-sized), collected once into mBits/64 long words and shipped
    * as a plan literal; probing is a pure map-only bit-test Column
    * expression over the new batch — screening costs one corpus pass to
    * train plus one batch scan, no corpus⋈batch join. The `exact_dup`
    * column joins true fingerprints only to EXHIBIT the FP rate in the
    * verified gate; production screening is the bloom verdict alone
    * (dolma's contract — novel docs are dropped at the published
    * (1−e^(−kn/m))^k rate, never duplicated). */
  def bloomDedup(corpus: DataFrame, incoming: DataFrame,
                 mBits: Int = 4096, kHashes: Int = 3): DataFrame = {
    require(mBits >= 64 && mBits % 64 == 0,
      s"mBits must be a positive multiple of 64 (got $mBits)")
    require(kHashes >= 1 && kHashes <= 8,
      s"kHashes must be in 1..8 (got $kHashes)")
    def hashed(c: DataFrame) = TextOps.fingerprints(c)
      .select(col("doc_id"), col("fp"),
        conv(substring(col("fp"), 1, 8), 16, 10).cast("long").as("_h1"),
        conv(substring(col("fp"), 9, 8), 16, 10).cast("long").as("_h2"))
    def pos(i: Int): Column =
      (col("_h1") + lit(i.toLong) * col("_h2")) % lit(mBits.toLong)
    val setBits = hashed(corpus)
      .select(explode(array((0 until kHashes).map(pos): _*)).as("p"))
      .distinct().collect().map(_.getLong(0))
    val words = new Array[Long](mBits / 64)
    setBits.foreach(p => words((p / 64).toInt) |= 1L << (p % 64).toInt)
    val probed = (0 until kHashes).foldLeft(
      hashed(incoming).withColumn("_words", typedLit(words.toSeq))) {
      (d, i) => d.withColumn(s"_p$i", pos(i)) }
    val hit = (0 until kHashes).map(i =>
      expr(s"(shiftright(element_at(_words, cast(_p$i / 64 as int) + 1), " +
        s"cast(_p$i % 64 as int)) & 1) = 1")).reduce(_ && _)
    val seen = TextOps.fingerprints(corpus)
      .select(col("fp")).distinct().withColumn("_seen", lit(1))
    // exact join = the cost the filter exists to avoid; gate-exhibit only
    probed.withColumn("bloom_hit", hit.cast("int"))
      .join(seen, Seq("fp"), "left")
      .select(col("doc_id"), col("bloom_hit"),
        coalesce(col("_seen"), lit(0)).as("exact_dup"),
        (col("bloom_hit") === 1 && coalesce(col("_seen"), lit(0)) === 0)
          .cast("int").as("false_pos"))
      .orderBy("doc_id")
  }
}
