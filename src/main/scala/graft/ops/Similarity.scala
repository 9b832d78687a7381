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

  /** Grid-banding plan for [[cosinePairs]]: which unit coordinates to band
    * (variance-ordered, spread-qualified), the bucket width, and the
    * adaptive salt count. Tiny driver state (≤ maxBandDims ints). */
  private final case class BandPlan(coords: Seq[Int], eps: Double, salts: Int)

  /** Unit-normalized view: (vec_id, u:array<double>). Feeds several
    * subtrees of one cosinePairs call, hence cached by the caller. */
  private def unitVectors(embeddings: DataFrame): DataFrame =
    embeddings
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("e"))
      .withColumn("nrm", norm(col("e")))
      .select(col("vec_id"), transform(col("e"), x => x / col("nrm")).as("u"))

  /** Choose the banding grid for a unit-vector corpus at distance `eps`.
    *
    * Coordinate selection is DATA-ADAPTIVE but completeness-safe: any
    * coordinate projection is 1-Lipschitz, so which coordinates we band
    * only affects pruning power, never recall. A coordinate earns a grid
    * dimension only if its corpus spread (max−min) covers ≥ 2·eps — below
    * that, same-or-adjacent buckets cover the whole corpus and the 3×
    * neighbor replication would buy nothing. Among qualifying coordinates
    * we take the `maxBandDims` highest-variance ones (deterministic
    * tie-break on index); with none qualifying we fall back to the single
    * highest-variance coordinate (low-threshold regime — the join is
    * inherently dense there and salting carries the parallelism).
    *
    * Salting is ADAPTIVE (round-2 used a fixed 32× replication): the salt
    * count shrinks as the distinct-cell count grows, targeting ~4 join
    * keys per core; many well-spread cells ⇒ salts = 1 ⇒ zero replication
    * beyond the 3^d neighbor keys.
    */
  private def planBands(u: DataFrame, eps: Double, maxBandDims: Int): BandPlan = {
    val spark = u.sparkSession
    // one cheap pass: per-coordinate variance + spread (dim rows out)
    val stats = u
      .select(posexplode(col("u")).as(Seq("pos", "v")))
      .groupBy("pos")
      .agg(var_pop(col("v")).as("var"), (max(col("v")) - min(col("v"))).as("spread"))
      .collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
    val byVar = stats.sortBy { case (pos, v, _) => (-v, pos) }
    // empty corpus: any plan works (no rows to band) — coordinate 0
    val qualified = byVar.filter(_._3 >= 2 * eps).take(maxBandDims).map(_._1)
    val coords =
      if (qualified.nonEmpty) qualified.toSeq
      else Seq(byVar.headOption.map(_._1).getOrElse(0))
    // distinct-cell count (tiny agg) → salt only when cells can't feed the
    // available parallelism on their own
    val cellCol = cellKey(col("u"), coords, eps, coords.map(_ => lit(0)))
    val nCells = u.select(cellCol.as("c")).distinct().count()
    val target = spark.sparkContext.defaultParallelism.toLong * 4
    val salts = math.max(1L, math.min(32L,
      (target + nCells - 1) / math.max(nCells, 1L))).toInt
    BandPlan(coords, eps, salts)
  }

  /** Grid-cell join key: per banded coordinate, floor(u[c]/eps) plus the
    * neighbor offset, concatenated to one string key. */
  private def cellKey(u: Column, coords: Seq[Int], eps: Double,
                      offsets: Seq[Column]): Column =
    concat_ws(":", coords.zip(offsets).map { case (c, off) =>
      (floor(element_at(u, c + 1) / eps).cast("long") + off).cast("string")
    }: _*)

  /** Candidate (vec_a, vec_b) pairs under the banding plan — ids and cell
    * keys only: the vector payload never rides the candidate shuffle (the
    * 3^d × salts replication applies to ~30-byte key rows, and the exact
    * verify re-joins vectors for candidate ids alone — the same
    * prune-then-verify shape as [[Dedup.withJaccard]]). Each qualifying
    * pair matches on exactly ONE join key (the left row's own cell and
    * salt), so no distinct() is needed. */
  private def candidates(u: DataFrame, plan: BandPlan): DataFrame = {
    val zero = plan.coords.map(_ => lit(0))
    val left = u.select(col("vec_id").as("vec_a"),
      cellKey(col("u"), plan.coords, plan.eps, zero).as("_cell"),
      pmod(xxhash64(col("vec_id")), lit(plan.salts)).as("_salt"))
    val offsets = plan.coords.foldLeft(Seq(Seq.empty[Int]))((acc, _) =>
      for (a <- acc; o <- Seq(-1, 0, 1)) yield a :+ o)
    val right = u.select(col("vec_id").as("vec_b"),
        explode(array(offsets.map(off =>
          cellKey(col("u"), plan.coords, plan.eps, off.map(lit(_)))): _*)).as("_cell"))
      .withColumn("_salt", explode(sequence(lit(0), lit(plan.salts - 1))))
    left.join(right, Seq("_cell", "_salt"))
      .where(col("vec_a") < col("vec_b"))
      .select("vec_a", "vec_b")
  }

  /** Embedding-cosine near-duplicate PAIRS — exact, with a provably
    * complete candidate bound (unlike probabilistic hyperplane LSH, which
    * has no recall guarantee — the simhash lesson):
    *
    *   cos(a,b) ≥ τ  ⟺  ‖â−b̂‖ ≤ eps = √(2−2τ) on unit vectors, and any
    *   coordinate projection is 1-Lipschitz: |â_c−b̂_c| ≤ ‖â−b̂‖ for every
    *   coordinate c.
    *
    * So a GRID over d banded coordinates (each floor(u[c]/eps), joined
    * same-or-adjacent per coordinate = 3^d neighbor cells) yields a
    * candidate SUPERSET of all qualifying pairs, and pruning MULTIPLIES
    * per coordinate (round 2 banded one raw coordinate — near-all-pairs at
    * realistic thresholds). Banded coordinates are the highest-variance
    * ones whose spread covers the grid (see [[planBands]]): real embedding
    * corpora concentrate variance in few directions, which is exactly
    * where a grid separates clusters. Exact cosine verification filters
    * the candidates, touching only candidate ids. Degrades gracefully
    * toward all-pairs as τ falls (still correct — SimilaritySpec pins
    * candidates ⊇ truth, result ≡ brute force, and <10% candidate volume
    * at τ=0.9 on a clustered corpus).
    *
    * CACHE LIFECYCLE (self-contained — no caller contract): ONE cached
    * normalize scan feeds the eager banding-plan jobs, both candidate
    * sides, AND the unit vectors of the candidate ids; candidates and
    * those (candidate-bounded) unit vectors are MATERIALIZED to temp
    * parquet and the cache dropped before returning, so nothing this
    * operator caches can leak into (or be evicted from under) a shared
    * session, and the returned verify plan touches only the small
    * materialized relations — never the corpus again.
    *
    * Output: (vec_a, vec_b, cos) with vec_a < vec_b. */
  def cosinePairs(embeddings: DataFrame, threshold: Double,
                  maxBandDims: Int = 4): DataFrame = {
    val (cand, uCand) = materializedCandidates(embeddings, threshold,
      maxBandDims, withUnitVectors = true)
    val ua = uCand.get.select(col("vec_id").as("vec_a"), col("u").as("ua"))
    val ub = uCand.get.select(col("vec_id").as("vec_b"), col("u").as("ub"))
    cand.join(ua, "vec_a").join(ub, "vec_b")
      .withColumn("cos", dot(col("ua"), col("ub")))
      .where(round(col("cos"), 7) >= threshold)
      .select(col("vec_a"), col("vec_b"), round(col("cos"), 4).as("cos"))
      .orderBy("vec_a", "vec_b")
  }

  /** Candidate (vec_a, vec_b) ids under the banding plan — plus, when
    * requested, the unit vectors of exactly the ids appearing in a
    * candidate pair — written eagerly to temp parquet off the ONE cached
    * unit-vector scan, which is dropped before returning. Shared by
    * [[cosinePairs]] and the property tests ([[cosinePairCandidates]]). */
  private def materializedCandidates(embeddings: DataFrame, threshold: Double,
                                     maxBandDims: Int, withUnitVectors: Boolean)
      : (DataFrame, Option[DataFrame]) = {
    val spark = embeddings.sparkSession
    val eps = math.sqrt(math.max(2.0 - 2.0 * threshold, 1e-12))
    val u = unitVectors(embeddings).cache()
    try {
      val plan = planBands(u, eps, maxBandDims)
      val path = graft.TempDirs.create("graft_cospairs")
      candidates(u, plan).write.mode("overwrite").parquet(path)
      val cand = spark.read.parquet(path)
      val uc =
        if (!withUnitVectors) None
        else {
          val ids = cand.select(col("vec_a").as("vec_id"))
            .unionByName(cand.select(col("vec_b").as("vec_id"))).distinct()
          val up = graft.TempDirs.create("graft_cosu")
          u.join(ids, Seq("vec_id"), "left_semi")
            .write.mode("overwrite").parquet(up)
          Some(spark.read.parquet(up))
        }
      (cand, uc)
    } finally u.unpersist()
  }

  /** Candidate pairs only (pre-verification) — exposed for the
    * completeness/pruning property tests. Same self-contained cache
    * lifecycle as [[cosinePairs]]. */
  def cosinePairCandidates(embeddings: DataFrame, threshold: Double,
                           maxBandDims: Int = 4): DataFrame =
    materializedCandidates(embeddings, threshold, maxBandDims,
      withUnitVectors = false)._1

  /** Per-label centroids: (label, centroid array<double>). */
  def centroids(embeddings: DataFrame): DataFrame =
    embeddings
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy("label", "pos").agg(avg(col("v").cast("double")).as("c"))
      .groupBy("label")
      .agg(transform(sort_array(collect_list(struct(col("pos"), col("c")))),
        x => x.getField("c")).as("centroid"))

  /** Deterministic Lloyd's k-means over the embedding column — the IVF
    * TRAINING operator ([[ivfTopK]] consumes its label column). Pinned,
    * oracle-expressible semantics:
    *
    *  - init: centroid j = the embedding of vec_id j (j < k), as doubles;
    *  - assignment: cosine similarity against the current centroids,
    *    ordered on round(sim, 9) DESC with ties to the LOWEST label;
    *  - update: per-coordinate mean over assigned vectors, ROUNDED to 6
    *    decimals (absorbs cross-engine FP sum-order noise in avg); a
    *    label that captured no vectors keeps its previous centroid;
    *  - a FIXED iteration count (no convergence test — determinism).
    *
    * Centroids are DRIVER state (k×d doubles — tiny), collected once per
    * iteration; the data relation is only ever scanned and the per-row
    * work is a broadcast cross join against k centroids — the classic
    * Lloyd shape that survives 100 TB (MLlib's layout [PUB]). Output:
    * (vec_id, label:int) under the FINAL centroids. */
  def kmeansLabels(embeddings: DataFrame, k: Int, iters: Int): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val e = embeddings.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("e"))
    var cent: Seq[(Int, Seq[Double])] = e.where(col("vec_id") < k)
      .select(col("vec_id").cast("int"), col("e")).collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toSeq)).toSeq.sortBy(_._1)
    require(cent.nonEmpty, "kmeans needs at least one seed vector (vec_id < k)")
    def assign(c: Seq[(Int, Seq[Double])]): DataFrame = {
      val cdf = c.toDF("label", "centroid")
      val w = Window.partitionBy("vec_id")
        .orderBy(round(col("_sim"), 9).desc, col("label").asc)
      e.crossJoin(broadcast(cdf))
        .withColumn("_sim", cosine(col("e"), col("centroid")))
        .withColumn("_r", row_number().over(w))
        .where(col("_r") === 1)
        .select(col("vec_id"), col("label"), col("e"))
    }
    for (_ <- 1 to iters) {
      val upd = assign(cent)
        .select(col("label"), posexplode(col("e")).as(Seq("pos", "v")))
        .groupBy("label", "pos").agg(round(avg(col("v")), 6).as("c"))
        .groupBy("label")
        .agg(transform(sort_array(collect_list(struct(col("pos"), col("c")))),
          x => x.getField("c")).as("centroid"))
        .collect().map(r => (r.getInt(0), r.getSeq[Double](1).toSeq)).toMap
      cent = cent.map { case (l, old) => (l, upd.getOrElse(l, old)) }
    }
    assign(cent).select(col("vec_id"), col("label")).orderBy("vec_id")
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup =
    * k-means clustering + WITHIN-CLUSTER pairwise cosine — never an
    * all-pairs corpus join. Two docs in the same cluster with cosine ≥
    * `threshold` are semantic duplicates; within each duplicate relation
    * we KEEP the doc closest to its cluster centroid and drop the rest.
    * Pinned deterministic rank (shared verbatim by the DuckDB twin):
    * per cluster, ORDER BY round(cosine(e, centroid), 9) DESC, vec_id
    * ASC; a doc is dropped iff SOME higher-ranked doc in its cluster has
    * round(cosine, 7) ≥ threshold — the paper's greedy keep-one-per-
    * ε-ball rule (we keep the most-central doc; the paper ablates
    * central vs anti-central and finds the choice immaterial).
    *
    * 100-TB shape: pair work is Σ|cluster|² with k chosen so clusters
    * stay bounded (the paper's own scale argument); the join shuffles on
    * `label` only, and the drop decision is a label-local window + join,
    * no global state.
    *
    * Output: (vec_id, label, keep) ordered by vec_id. */
  def semDedup(embeddings: DataFrame, k: Int, iters: Int,
               threshold: Double): DataFrame = {
    val e = embeddings.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("e"))
    val n = kmeansLabels(embeddings, k, iters).join(e, "vec_id")
    // final centroids recomputed from the final assignment; coordinates
    // rounded to 6 decimals — the same pinning kmeansLabels' update step
    // uses, so the engines' avg() orderings cannot skew the rank
    val cent = n.select(col("label"), posexplode(col("e")).as(Seq("pos", "v")))
      .groupBy("label", "pos").agg(round(avg(col("v")), 6).as("c"))
      .groupBy("label")
      .agg(transform(sort_array(collect_list(struct(col("pos"), col("c")))),
        x => x.getField("c")).as("centroid"))
    val rankW = Window.partitionBy("label")
      .orderBy(round(col("_csim"), 9).desc, col("vec_id").asc)
    val ranked = n.join(broadcast(cent), "label")
      .withColumn("_csim", cosine(col("e"), col("centroid")))
      .withColumn("r", row_number().over(rankW))
      .select(col("vec_id"), col("label"), col("e"), col("r"))
    val hi = ranked.select(col("label"), col("e").as("ye"), col("r").as("yr"))
    val dropped = ranked.join(hi, Seq("label"))
      .where(col("yr") < col("r") &&
        round(cosine(col("e"), col("ye")), 7) >= threshold)
      .select(col("vec_id")).distinct()
      .withColumn("_dropped", lit(true))
    ranked.join(dropped, Seq("vec_id"), "left")
      .select(col("vec_id"), col("label"), col("_dropped").isNull.as("keep"))
      .orderBy("vec_id")
  }

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

  /** MATRYOSHKA two-stage retrieval (Kusupati et al. NeurIPS 2022,
    * arXiv:2205.13147 — "adaptive retrieval with MRL embeddings"): stage
    * 1 shortlists per-query top-`shortlist` candidates by cosine over the
    * FIRST `dims` coordinates only (an MRL-trained embedding's prefix is
    * itself a valid embedding — the whole point of the paper); stage 2
    * re-ranks ONLY the shortlist with full-dimension cosine. Output is
    * the usual (query_vec, rank, vec_id, sim) with sim the FULL cosine.
    *
    * 100-TB shape: the corpus-wide pass touches `dims`/d of the vector
    * bytes (the paper's 64/768-style funnel — at scale stage 1 reads a
    * truncated column/index, here expressed as a slice the scan feeds);
    * stage 2's candidate set is queries×shortlist ids ONLY — the full
    * vectors are re-fetched by an id join against the corpus, so full
    * vectors never ride a corpus-wide shuffle. Shortlist boundary ties
    * are pinned (round(sim,7) DESC, vec_id ASC), making the candidate
    * SET itself deterministic cross-engine, not just the final ranks. */
  def mrlTopK(embeddings: DataFrame, queryIds: Seq[Long], k: Int = 10,
              dims: Int = 16, shortlist: Int = 40): DataFrame = {
    require(dims > 0, s"dims must be positive (got $dims)")
    require(shortlist >= k, s"shortlist ($shortlist) must be >= k ($k)")
    val q = embeddings.where(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("query_vec"), col("embedding").as("qe"))
    val w = Window.partitionBy("query_vec")
      .orderBy(round(col("_simt"), 7).desc, col("vec_id").asc)
    val heads = embeddings.crossJoin(broadcast(q))
      .where(col("vec_id") =!= col("query_vec"))
      .withColumn("_simt", cosine(slice(col("qe"), 1, dims),
        slice(col("embedding"), 1, dims)))
      .withColumn("_r", row_number().over(w))
      .where(col("_r") <= shortlist)
      .select(col("query_vec"), col("vec_id"))
    val scored = embeddings.join(broadcast(heads), Seq("vec_id"))
      .join(broadcast(q), Seq("query_vec"))
      .withColumn("_sim", cosine(col("qe"), col("embedding")))
    rank(scored, k)
  }

  /** SQ8 SCALAR QUANTIZATION with asymmetric serving (the faiss
    * ScalarQuantizer QT_8bit shape, public faiss docs/impl semantics):
    * TRAIN per-dimension (min, max) over the corpus; ENCODE every
    * coordinate to code = clamp(floor((x−min)·255/(max−min)), 0, 255)
    * (degenerate max=min dims pin code 0); SERVE by cosine between the
    * FULL-precision query and the dequantized corpus vector
    * x̂ = min + (code+0.5)·(max−min)/255 (the +0.5 mid-bucket
    * reconstruction faiss uses). Output (query_vec, rank, vec_id, sim)
    * with sim the quantized (ADC) cosine — 4× smaller vectors at serving
    * time is the point; ranks shift vs exact by design.
    *
    * 100-TB shape: training is ONE aggregation pass emitting d (min,max)
    * pairs — O(d) driver state (the centroid idiom), broadcast back as
    * literals so encode/serve stay pure codegen'd Column expressions;
    * encoding is map-only; serving is the brute pass over 1-byte codes.
    * Every arithmetic step is pinned operand-order-identical in the twin
    * (floor/clamp on IEEE doubles — exact cross-engine). */
  def sq8TopK(embeddings: DataFrame, queryIds: Seq[Long],
              k: Int = 10): DataFrame = {
    val e = embeddings.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("e"))
    // train: per-dim min/max — one agg, d rows, O(d) driver state
    val stats = e.select(posexplode(col("e")).as(Seq("dim", "x")))
      .groupBy("dim").agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
      .orderBy("dim").collect()
    val mn = stats.map(_.getDouble(1))
    val mx = stats.map(_.getDouble(2))
    val mnA = array(mn.map(lit): _*)
    val scaleA = array(mn.indices.map(i =>
      lit(if (mx(i) > mn(i)) (mx(i) - mn(i)) / 255.0 else 0.0)): _*)
    // encode→mid-bucket dequantize in one expression:
    //   x̂_i = s_i = 0 ? mn_i
    //             : mn_i + (clamp(floor((x_i − mn_i)/s_i), 0, 255) + 0.5)·s_i
    def dequant(v: Column): Column =
      transform(sequence(lit(1), lit(mn.length)), i => {
        val x = element_at(v, i); val m = element_at(mnA, i)
        val s = element_at(scaleA, i)
        when(s === 0.0, m).otherwise(m +
          (least(greatest(floor((x - m) / s), lit(0.0)), lit(255.0))
            + lit(0.5)) * s)
      })
    val q = e.where(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("query_vec"), col("e").as("qe"))
    val scored = e.crossJoin(broadcast(q))
      .where(col("vec_id") =!= col("query_vec"))
      .withColumn("_sim", cosine(col("qe"), dequant(col("e"))))
    rank(scored, k)
  }

  /** RECIPROCAL RANK FUSION (Cormack et al. SIGIR 2009; the hybrid-search
    * combiner Solr 9 / Elasticsearch ship): fuse two rankers' top-`depth`
    * lists by rrf(d) = Σ_lists 1/(k0 + rank_list(d)), docs absent from a
    * list contributing nothing. Here the two rankers are the exact-cosine
    * and the SQ8-quantized retrievers ([[bruteForceTopK]] / [[sq8TopK]]) —
    * the classic accurate-vs-compressed fusion pair. Output
    * (query_vec, rank, vec_id, rrf·9dp), ties pinned on vec_id.
    *
    * Scale shape: fusion operates on the two top-lists ONLY —
    * queries×depth rows each, a full-outer join on (query_vec, vec_id)
    * that never touches the corpus again; rrf arithmetic is exact
    * integer-reciprocal sums, identical cross-engine. */
  def rrfTopK(embeddings: DataFrame, queryIds: Seq[Long], k: Int = 10,
              depth: Int = 20, k0: Int = 60): DataFrame = {
    require(depth >= k, s"depth ($depth) must be >= k ($k)")
    require(k0 > 0, s"k0 must be positive (got $k0)")
    def side(df: DataFrame, r: String) = df.select(col("query_vec"),
      col("vec_id"), col("rank").as(r))
    val fused = side(bruteForceTopK(embeddings, queryIds, depth), "_ra")
      .join(side(sq8TopK(embeddings, queryIds, depth), "_rb"),
        Seq("query_vec", "vec_id"), "full_outer")
      .withColumn("_rrf",
        coalesce(lit(1.0) / (lit(k0) + col("_ra")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(k0) + col("_rb")), lit(0.0)))
    val w = Window.partitionBy("query_vec")
      .orderBy(round(col("_rrf"), 9).desc, col("vec_id").asc)
    fused.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_vec"), col("rank").cast("int").as("rank"),
        col("vec_id"), round(col("_rrf"), 9).as("rrf"))
      .orderBy("query_vec", "rank")
  }

  /** Squared L2 between two double arrays — the same sequential-fold
    * shape as [[dot]]/[[norm]], mirrored verbatim by the oracle's
    * list_reduce (0.0 + v₁ ≡ v₁ exactly, so the fold trees agree). */
  private def l2sq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, v) => acc + v)

  /** Nearest-codebook-cell assignment over a (vec_id, j, sub) relation:
    * L2² against the broadcast codebook, round(dist², 9) ASC /
    * lowest-label ties — the shared PQ primitive ([[pqTopK]] flat
    * vectors, [[ivfPqTopK]] residuals). */
  private def pqAssign(subs: DataFrame,
                       cb: Seq[(Int, Int, Seq[Double])]): DataFrame = {
    val spark = subs.sparkSession
    import spark.implicits._
    val cdf = cb.toDF("j", "label", "c")
    val w = Window.partitionBy("vec_id", "j")
      .orderBy(round(col("_d"), 9).asc, col("label").asc)
    subs.join(broadcast(cdf), Seq("j"))
      .withColumn("_d", l2sq(col("sub"), col("c")))
      .withColumn("_r", row_number().over(w)).where(col("_r") === 1)
      .select(col("vec_id"), col("j"), col("label"), col("sub"))
  }

  /** PQ codebook training (the pinned per-subvector Lloyd's): init from
    * vec_id < codebookSize slices, fixed iterations, means rounded to 6
    * decimals, empty cells keep their centroid. Driver state:
    * m × codebookSize × ds doubles. */
  private def pqTrain(subs: DataFrame, codebookSize: Int,
                      iters: Int): Seq[(Int, Int, Seq[Double])] = {
    val spark = subs.sparkSession
    import spark.implicits._
    var code: Seq[(Int, Int, Seq[Double])] = subs
      .where(col("vec_id") < codebookSize)
      .select(col("j"), col("vec_id").cast("int").as("label"), col("sub"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toSeq))
      .toSeq.sortBy(t => (t._1, t._2))
    require(code.nonEmpty, "PQ needs seed vectors with vec_id < codebookSize")
    for (_ <- 1 to iters) {
      val upd = pqAssign(subs, code)
        .select(col("j"), col("label"), posexplode(col("sub")).as(Seq("pos", "v")))
        .groupBy("j", "label", "pos").agg(round(avg(col("v")), 6).as("cv"))
        .groupBy("j", "label")
        .agg(transform(sort_array(collect_list(struct(col("pos"), col("cv")))),
          x => x.getField("cv")).as("c"))
        .collect()
        .map(r => ((r.getInt(0), r.getInt(1)), r.getSeq[Double](2).toSeq)).toMap
      code = code.map { case (j, l, old) => (j, l, upd.getOrElse((j, l), old)) }
    }
    code
  }

  /** PRODUCT QUANTIZATION ANN (Jégou, Douze & Schmid, TPAMI 2011 [PUB]) —
    * the memory-bound scale path IVF alone doesn't cover: each vector is
    * split into `m` subvectors, each subvector quantized against its own
    * `codebookSize`-centroid codebook (trained here with the same pinned
    * deterministic Lloyd's as [[kmeansLabels]], L2 assignment on
    * round(dist², 9) ASC / lowest-label ties, means rounded to 6
    * decimals, empty cells keep their centroid, fixed iterations), so a
    * d-dim float vector stores as m small codes (64 floats → 8 codes
    * here: 32× smaller). Serving is ADC — asymmetric distance
    * computation: the query stays UNCOMPRESSED; one (query × j × label)
    * distance table of partial ‖q_j − c_{j,label}‖² is built against the
    * broadcast codebook, and each corpus vector's approximate distance
    * is the Σ over its m codes of table lookups — the scan touches only
    * (vec_id, j, code) rows, never a raw vector.
    *
    * Scale shape: codebook = m × codebookSize × (d/m) doubles of driver
    * state (tiny, broadcast); training scans slices with a broadcast
    * join per iteration (the Lloyd shape); the ADC scan is
    * O(corpus × m) tiny rows per query batch with the distance table
    * broadcast — the d-dim arithmetic per candidate that brute-force
    * pays is gone, which is the published PQ trade. Output:
    * (query_vec, rank, vec_id, adist) — APPROXIMATE distances, ascending,
    * vec_id tie-break; exactness is vs the oracle's identical PQ chain,
    * not vs brute cosine (PQ is lossy by design; recall vs brute is the
    * spec's documented trade, not a defect). */
  def pqTopK(embeddings: DataFrame, queryIds: Seq[Long], k: Int = 10,
             m: Int = 8, codebookSize: Int = 16, iters: Int = 2): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    require(m > 0 && codebookSize > 0 && iters >= 0 && k > 0,
      s"bad PQ params (m=$m, codebookSize=$codebookSize, iters=$iters, k=$k)")
    val e = embeddings.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("e"))
    val dim = e.select(size(col("e"))).head().getInt(0)
    require(dim % m == 0, s"embedding dim $dim not divisible by m=$m")
    val ds = dim / m
    // (vec_id, j, sub): the subvector relation every stage reads
    val subs = e.select(col("vec_id"), posexplode(
        transform(sequence(lit(0), lit(m - 1)),
          j => slice(col("e"), j * ds + 1, lit(ds)))))
      .select(col("vec_id"), col("pos").cast("int").as("j"), col("col").as("sub"))
      .cache()
    try {
      val code = pqTrain(subs, codebookSize, iters)
      val enc = pqAssign(subs, code).select(col("vec_id"), col("j"),
        col("label").as("code")) // the compressed corpus: m codes per vector
      val cdf = code.toDF("j", "label", "c")
      val table = subs.where(col("vec_id").isin(queryIds: _*))
        .select(col("vec_id").as("query_vec"), col("j"), col("sub").as("qsub"))
        .join(broadcast(cdf), Seq("j"))
        .withColumn("_part", l2sq(col("qsub"), col("c")))
        .select(col("query_vec"), col("j"), col("label").as("code"), col("_part"))
      val scored = enc.join(broadcast(table), Seq("j", "code"))
        .where(col("vec_id") =!= col("query_vec"))
        .groupBy("query_vec", "vec_id").agg(sum(col("_part")).as("_d"))
      val w = Window.partitionBy("query_vec")
        .orderBy(round(col("_d"), 9).asc, col("vec_id").asc)
      val out = scored.withColumn("rank", row_number().over(w))
        .where(col("rank") <= k)
        .select(col("query_vec"), col("rank").cast("int").as("rank"),
          col("vec_id"), round(col("_d"), 4).as("adist"))
        .orderBy("query_vec", "rank")
      // ≤ |queries|·k rows — localize so the subs cache can drop
      val rows = out.collect()
      spark.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
    } finally subs.unpersist()
  }

  /** IVF-PQ — the full published ANN pipeline (Jégou et al. 2011 §IV;
    * FAISS's IndexIVFPQ layout [PUB]): a coarse quantizer
    * ([[kmeansLabels]], `clusters` cells) routes each vector to a
    * cluster; PQ codebooks are trained on the RESIDUALS e − centroid
    * (residuals are smaller and near-centered, so the same codebook
    * budget quantizes them far better than raw vectors — the published
    * reason for the composition); serving probes the `nProbe` clusters
    * whose centroids are cosine-closest to the query and runs ADC with
    * the QUERY'S OWN residual against each probed cluster's centroid.
    *
    * Pinned cross-engine choices: serving/residual centroids are the
    * per-coordinate means of the final assignment ROUNDED to 6 decimals
    * (both engines; unrounded means would differ in FP sum order and
    * poison every residual), probe ranking on round(cos, 9) DESC /
    * lowest-label, distances on round(dist², 9) ASC / vec_id ASC.
    *
    * Scale shape: centroids + codebook are driver/broadcast state
    * (clusters×d + m×codebookSize×ds doubles); the corpus is touched as
    * (vec_id, cluster, j, code) rows only; with cluster-partitioned
    * storage the probe becomes partition pruning and the ADC scan reads
    * nProbe/clusters of the corpus — the IVF prune and the PQ byte diet
    * compose. Output (query_vec, rank, vec_id, adist) — approximate by
    * design, exact vs the oracle's identical chain. */
  def ivfPqTopK(embeddings: DataFrame, queryIds: Seq[Long], k: Int = 10,
                clusters: Int = 4, nProbe: Int = 2, m: Int = 8,
                codebookSize: Int = 16, iters: Int = 2): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    require(nProbe > 0 && nProbe <= clusters,
      s"nProbe must be in [1, clusters] (got $nProbe, clusters=$clusters)")
    val e = embeddings.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("e"))
    val dim = e.select(size(col("e"))).head().getInt(0)
    require(dim % m == 0, s"embedding dim $dim not divisible by m=$m")
    val ds = dim / m
    val labels = kmeansLabels(embeddings, clusters, iters)
    val labeled = e.join(labels, "vec_id")
    // serving centroids: 6-decimal-rounded means of the final assignment
    // (driver state: clusters × dim doubles)
    val cent: Seq[(Int, Seq[Double])] = labeled
      .select(col("label"), posexplode(col("e")).as(Seq("pos", "v")))
      .groupBy("label", "pos").agg(round(avg(col("v")), 6).as("cv"))
      .groupBy("label")
      .agg(transform(sort_array(collect_list(struct(col("pos"), col("cv")))),
        x => x.getField("cv")).as("c"))
      .collect().map(r => (r.getInt(0), r.getSeq[Double](1).toSeq)).toSeq
      .sortBy(_._1)
    val centDf = cent.toDF("label", "centroid")
    def slices(v: Column): Column =
      transform(sequence(lit(0), lit(m - 1)), j => slice(v, j * ds + 1, lit(ds)))
    // residual subvectors, cluster carried: (vec_id, clab, j, sub)
    val subs = labeled.join(broadcast(centDf), "label")
      .select(col("vec_id"), col("label").as("clab"), posexplode(
        slices(zip_with(col("e"), col("centroid"), (a, b) => a - b))))
      .select(col("vec_id"), col("clab"),
        col("pos").cast("int").as("j"), col("col").as("sub"))
      .cache()
    try {
      val code = pqTrain(subs.select("vec_id", "j", "sub"), codebookSize, iters)
      val enc = pqAssign(subs.select("vec_id", "j", "sub"), code)
        .select(col("vec_id"), col("j"), col("label").as("code"))
        .join(subs.select("vec_id", "clab").distinct(), "vec_id")
      // probe: nProbe cosine-closest serving centroids per query
      val q = e.where(col("vec_id").isin(queryIds: _*))
        .select(col("vec_id").as("query_vec"), col("e").as("qe"))
      val pw = Window.partitionBy("query_vec")
        .orderBy(round(col("_cs"), 9).desc, col("label").asc)
      val probes = q.crossJoin(broadcast(centDf))
        .withColumn("_cs", cosine(col("qe"), col("centroid")))
        .withColumn("_r", row_number().over(pw)).where(col("_r") <= nProbe)
        .select(col("query_vec"), col("qe"), col("label").as("clab"),
          col("centroid"))
      // per-(query, probed cluster) residual slices → ADC distance table
      val cdf = code.toDF("j", "label", "c")
      val table = probes
        .select(col("query_vec"), col("clab"), posexplode(
          slices(zip_with(col("qe"), col("centroid"), (a, b) => a - b))))
        .select(col("query_vec"), col("clab"),
          col("pos").cast("int").as("j"), col("col").as("qsub"))
        .join(broadcast(cdf), Seq("j"))
        .withColumn("_part", l2sq(col("qsub"), col("c")))
        .select(col("query_vec"), col("clab"), col("j"),
          col("label").as("code"), col("_part"))
      val scored = enc.join(broadcast(table), Seq("clab", "j", "code"))
        .where(col("vec_id") =!= col("query_vec"))
        .groupBy("query_vec", "vec_id").agg(sum(col("_part")).as("_d"))
      val w = Window.partitionBy("query_vec")
        .orderBy(round(col("_d"), 9).asc, col("vec_id").asc)
      val out = scored.withColumn("rank", row_number().over(w))
        .where(col("rank") <= k)
        .select(col("query_vec"), col("rank").cast("int").as("rank"),
          col("vec_id"), round(col("_d"), 4).as("adist"))
        .orderBy("query_vec", "rank")
      val rows = out.collect()
      spark.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
    } finally subs.unpersist()
  }
}
