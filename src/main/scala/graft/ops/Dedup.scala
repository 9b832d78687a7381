package graft.ops

import graft.analysis.Analyzer
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Near-duplicate detection operators: MinHash+LSH, SimHash, and n-gram
  * Jaccard. All hash functions derive from md5 so the DuckDB oracle can
  * reproduce them bit-for-bit (Spark xxhash64 has no DuckDB twin).
  *
  * Scale shape (the point of LSH): candidate generation is a self-join on
  * small band buckets — postings-style shuffles keyed on the bucket, never
  * an all-pairs product. The exact-Jaccard verify touches only candidate
  * pairs.
  *
  * Cache lifecycle: the `.cache()` calls below exist because each cached
  * frame feeds BOTH sides of a self-join (without it Spark executes the
  * subtree twice). They are scoped to one query execution; batch runners
  * that execute many registered queries in one JVM (Verify, Bench) call
  * `spark.catalog.clearCache()` between queries so cached relations don't
  * accumulate across unrelated queries.
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

  /** MinHash+LSH near-dup pairs over 3-gram SHINGLE sets (shingles, not
    * token sets: a 31-term vocab makes token-set Jaccard useless — nearly
    * every doc pair collides). Candidates (doc_a < doc_b) share ≥1 band
    * bucket; verified with EXACT shingle Jaccard; kept if ≥ threshold.
    * Output: (doc_a, doc_b, jaccard) — jaccard rounded to 4.
    *
    * CALLER CONTRACT (cache lifecycle): the returned frame's plan holds
    * `.cache()`d self-join inputs that stay resident after materialization
    * — callers executing many queries in one JVM must
    * `spark.catalog.clearCache()` (or unpersist) once the result is
    * consumed, as Verify/Bench do. */
  def minhashPairs(corpus: DataFrame, threshold: Double = 0.7,
                   n: Int = 3): DataFrame = {
    val sh = shingles(corpus, n).cache()
    val b = bands(minhashSignatures(sh)).cache()
    val cand = b.as("x").join(b.as("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    withJaccard(cand, sh)
      .where(col("jaccard") >= threshold)
      .orderBy("doc_a", "doc_b")
  }

  /** Exact Jaccard for given (doc_a, doc_b) pairs over distinct tokens.
    * The verify only ever touches docs that appear in a candidate pair —
    * the term relation is semi-join-pruned to them first, so the two
    * intersection joins and the size aggregation scale with the CANDIDATE
    * set, not the corpus (LSH's whole point carried through to the
    * verify). */
  def withJaccard(pairs0: DataFrame, docTerms: DataFrame): DataFrame = {
    // the pair set feeds candDocs AND three joins below — without the
    // cache the candidate self-join subtree would execute once per use
    val pairs = pairs0.cache()
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
    tf.select(col("doc_id"), col("tf"), col("h"),
        explode(sequence(lit(0), lit(SimhashBits - 1))).as("j"))
      .withColumn("w", expr("CASE WHEN (shiftright(h, j) & 1) = 1 THEN tf ELSE -tf END"))
      .groupBy("doc_id", "j").agg(sum("w").as("wsum"))
      .withColumn("bit",
        expr("CASE WHEN wsum > 0 THEN shiftleft(CAST(1 AS BIGINT), j) ELSE CAST(0 AS BIGINT) END"))
      .groupBy("doc_id").agg(sum("bit").as("simhash"))
      .orderBy("doc_id")
  }

  /** SimHash near-dup pairs: band on 4×15-bit chunks, then hamming ≤ maxDist.
    * Output (doc_a, doc_b, hamming).
    *
    * Recall contract (pigeonhole): with 4 bands, a pair differing in at
    * most 3 bits must leave at least one band identical, so every pair
    * with hamming ≤ 3 is found. maxDist > 3 would silently lose pairs
    * whose differing bits spread across all 4 bands — hence the require.
    * DedupRecallSpec property-tests this against brute-force hamming.
    *
    * CALLER CONTRACT: caches a self-join input; clearCache/unpersist after
    * consuming the result (see [[minhashPairs]]). */
  def simhashPairs(corpus: DataFrame, maxDist: Int = 3): DataFrame = {
    val bands = SimhashBits / 15 // 4 bands of 15 bits
    require(maxDist < bands,
      s"simhash banding with $bands bands only guarantees recall for " +
        s"hamming <= ${bands - 1}; got maxDist=$maxDist")
    val sh = simhash(corpus).cache()
    val banded = sh.select(col("doc_id"), col("simhash"),
      explode(sequence(lit(0), lit(3))).as("band"))
      .withColumn("chunk", expr("shiftright(simhash, band * 15) & 32767"))
    val cand = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.chunk") === col("y.chunk") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        col("x.simhash").as("sha"), col("y.simhash").as("shb"))
      .distinct()
    cand.withColumn("hamming",
        bit_count(col("sha").bitwiseXOR(col("shb"))).cast("int"))
      .where(col("hamming") <= maxDist)
      .select("doc_a", "doc_b", "hamming")
      .orderBy("doc_a", "doc_b")
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
    * ≥ threshold. Output (doc_a, doc_b, jaccard).
    *
    * CALLER CONTRACT: caches self-join inputs; clearCache/unpersist after
    * consuming the result (see [[minhashPairs]]). */
  def ngramJaccardPairs(corpus: DataFrame, n: Int = 3,
                        threshold: Double = 0.3): DataFrame = {
    val sh = shingles(corpus, n).cache()
    val rare = sh.groupBy("term").agg(count(lit(1)).as("_df"))
      .where(col("_df") <= MaxCandidateShingleDf).select("term")
    val shRare = sh.join(rare, "term")
    val cand = shRare.as("x").join(shRare.as("y"),
        col("x.term") === col("y.term") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    withJaccard(cand, sh)
      .where(col("jaccard") >= threshold)
      .orderBy("doc_a", "doc_b")
  }
}
