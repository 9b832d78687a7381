package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (array<float>): brute-force cosine top-k as the correctness baseline,
  * and an IVF variant (inverted file by cluster) as the scale path — probe
  * the nProbe closest clusters by centroid similarity, brute-force only
  * inside them. Cluster ids come from the `label` column (a pre-assigned
  * k-means-style partition, which is exactly what IVF assumes).
  *
  * All arithmetic is pure Column expressions: dot products via
  * zip_with + aggregate in double precision, mirrored verbatim in the
  * DuckDB oracle. At scale: query vectors broadcast; the scan is one pass;
  * IVF prunes to nProbe/k of the corpus (with cluster-partitioned storage
  * this becomes partition pruning, like the term shards).
  */
object Similarity {

  /** Native codegen'd dot (same sequential fold — bit-identical to the
    * zip_with+aggregate HOF form and DuckDB's list_reduce; see
    * [[graft.functions.DotProduct]] for why the HOF form is too slow on
    * pair-join hot paths). */
  def dot(a: Column, b: Column): Column =
    graft.functions.vectors.dotProduct(a, b)

  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Rank candidate (query_vec, vec_id, sim) rows into per-query top-k
    * with the pinned tie-break. */
  private def rank(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("query_vec")
      .orderBy(round(col("_sim"), 7).desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_vec"), col("rank").cast("int").as("rank"),
        col("vec_id"), round(col("_sim"), 4).as("sim"))
      .orderBy("query_vec", "rank")
  }

  /** Brute-force cosine top-k: every query vector against every corpus
    * vector (excluding itself). Queries are a tiny set → broadcast. */
  def bruteForceTopK(embeddings: DataFrame, queryIds: Seq[Long],
                     k: Int = 10): DataFrame = {
    val q = embeddings.where(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("query_vec"), col("embedding").as("qe"))
    val scored = embeddings.crossJoin(broadcast(q))
      .where(col("vec_id") =!= col("query_vec"))
      .withColumn("_sim", cosine(col("qe"), col("embedding")))
    rank(scored, k)
  }

  /** Embedding-cosine near-duplicate PAIRS — exact, with a provably
    * complete candidate bound (unlike probabilistic hyperplane LSH, which
    * has no recall guarantee — the simhash lesson):
    *
    *   cos(a,b) ≥ τ  ⟺  ‖â−b̂‖ ≤ eps = √(2−2τ) on unit vectors, and any
    *   coordinate projection is 1-Lipschitz: |â₀−b̂₀| ≤ ‖â−b̂‖.
    *
    * So banding the first unit-coordinate into eps-wide buckets and
    * joining same-or-adjacent buckets yields a candidate SUPERSET of all
    * qualifying pairs; exact cosine verification filters it. Prunes hard
    * at near-dup thresholds (τ→1 ⇒ eps→0 ⇒ narrow buckets) and degrades
    * gracefully toward all-pairs as τ falls (still correct — the
    * SimilaritySpec property pins candidates ⊇ truth and result ≡ brute
    * force). Each qualifying pair is emitted exactly once (the right side
    * explodes its 3 adjacent keys; a pair matches on exactly one).
    * Output: (vec_a, vec_b, cos) with vec_a < vec_b. */
  /** Salt count for the bucket join: at low thresholds eps is wide and few
    * distinct buckets exist, so the bare bucket key would funnel the join
    * through a handful of tasks. Salting the left side by hash(vec_id) and
    * replicating the right across all salts keeps the candidate set
    * identical while spreading it over Salts× more join keys. */
  private final val Salts = 32

  def cosinePairs(embeddings: DataFrame, threshold: Double): DataFrame = {
    val eps = math.sqrt(math.max(2.0 - 2.0 * threshold, 1e-12))
    val u = embeddings
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("e"))
      .withColumn("nrm", norm(col("e")))
      .withColumn("u", transform(col("e"), x => x / col("nrm")))
      .withColumn("b", floor(element_at(col("u"), 1) / eps).cast("long"))
      .select("vec_id", "u", "b")
    val left = u.select(col("vec_id").as("vec_a"), col("u").as("ua"), col("b"),
      pmod(xxhash64(col("vec_id")), lit(Salts)).as("_salt"))
    val right = u.select(col("vec_id").as("vec_b"), col("u").as("ub"),
        explode(array(col("b") - 1, col("b"), col("b") + 1)).as("b"))
      .withColumn("_salt", explode(sequence(lit(0), lit(Salts - 1))))
    left.join(right, Seq("b", "_salt"))
      .where(col("vec_a") < col("vec_b"))
      .withColumn("cos", dot(col("ua"), col("ub")))
      .where(round(col("cos"), 7) >= threshold)
      .select(col("vec_a"), col("vec_b"), round(col("cos"), 4).as("cos"))
      .orderBy("vec_a", "vec_b")
  }

  /** Candidate pairs only (pre-verification) — exposed for the
    * completeness/pruning property test. */
  def cosinePairCandidates(embeddings: DataFrame, threshold: Double): DataFrame = {
    val eps = math.sqrt(math.max(2.0 - 2.0 * threshold, 1e-12))
    val u = embeddings
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("e"))
      .withColumn("nrm", norm(col("e")))
      .withColumn("b", floor(element_at(transform(col("e"), x => x / col("nrm")), 1) / eps).cast("long"))
      .select("vec_id", "b")
    val left = u.select(col("vec_id").as("vec_a"), col("b"),
      pmod(xxhash64(col("vec_id")), lit(Salts)).as("_salt"))
    val right = u.select(col("vec_id").as("vec_b"),
        explode(array(col("b") - 1, col("b"), col("b") + 1)).as("b"))
      .withColumn("_salt", explode(sequence(lit(0), lit(Salts - 1))))
    left.join(right, Seq("b", "_salt")).where(col("vec_a") < col("vec_b"))
      .select("vec_a", "vec_b")
  }

  /** Per-label centroids: (label, centroid array<double>). */
  def centroids(embeddings: DataFrame): DataFrame =
    embeddings
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy("label", "pos").agg(avg(col("v").cast("double")).as("c"))
      .groupBy("label")
      .agg(transform(sort_array(collect_list(struct(col("pos"), col("c")))),
        x => x.getField("c")).as("centroid"))

  /** IVF top-k: probe the nProbe labels whose centroids are closest to the
    * query (by cosine, tie-break label asc), then brute-force within those
    * clusters only. */
  def ivfTopK(embeddings: DataFrame, queryIds: Seq[Long], k: Int = 10,
              nProbe: Int = 2): DataFrame = {
    val q = embeddings.where(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("query_vec"), col("embedding").as("qe"))
    val cent = centroids(embeddings)
    val probeW = Window.partitionBy("query_vec")
      .orderBy(round(col("_csim"), 9).desc, col("label").asc)
    val probes = q.crossJoin(broadcast(cent))
      .withColumn("_csim", cosine(col("qe"), col("centroid")))
      .withColumn("_r", row_number().over(probeW))
      .where(col("_r") <= nProbe)
      .select(col("query_vec"), col("qe"), col("label"))
    val scored = embeddings.join(broadcast(probes), Seq("label"))
      .where(col("vec_id") =!= col("query_vec"))
      .withColumn("_sim", cosine(col("qe"), col("embedding")))
    rank(scored, k)
  }
}
