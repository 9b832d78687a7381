package graft

import graft.ops.Similarity

/** Embedding-cosine near-dup pairs: the banding must be COMPLETE (a
  * candidate superset of every qualifying pair — the guarantee
  * probabilistic hyperplane LSH cannot give), the verified result must
  * equal brute force, and the banding must actually prune. */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  val dim = 16

  /** Deterministic clustered vectors: cluster spike at a per-cluster
    * coordinate (≥ 1 so coordinate 0 stays a smooth per-cluster ramp the
    * banding can separate), small per-member noise. */
  def vec(c: Int, m: Int): Array[Float] = Array.tabulate(dim) { d =>
    val spike = if (d == (c % 8) + 8) 10f else 0f
    val ramp = if (d == 0) 1f + 0.5f * c else 0f
    val noise = (((c * 131 + m * 17 + d * 7) % 11) - 5) * 0.02f
    spike + ramp + noise
  }

  val rows: Seq[(Long, Array[Float], Int)] =
    for (c <- 0 until 10; m <- 0 until 20) yield (c * 20L + m, vec(c, m), c)

  def unit(e: Array[Float]): Array[Double] = {
    val d = e.map(_.toDouble)
    val nrm = math.sqrt(d.foldLeft(0.0)((a, x) => a + x * x))
    d.map(_ / nrm)
  }

  def cos(a: Array[Double], b: Array[Double]): Double =
    a.zip(b).foldLeft(0.0)((acc, p) => acc + p._1 * p._2)

  val tau = 0.995

  lazy val brute: Set[(Long, Long)] = (for {
    (ia, ea, _) <- rows
    (ib, eb, _) <- rows
    if ia < ib
    if BigDecimal(cos(unit(ea), unit(eb)))
      .setScale(7, BigDecimal.RoundingMode.HALF_UP).toDouble >= tau
  } yield (ia, ib)).toSet

  lazy val df = rows.toDF("vec_id", "embedding", "label")

  test("kmeans separates planted clusters; labels deterministic across runs") {
    val emb = (Seq(
      (0L, Array(1f, 0f, 0f, 0f)), (1L, Array(0f, 1f, 0f, 0f))) ++ // seeds
      (2 until 12).map { i =>
        val (a, b) = if (i % 2 == 0) (0.9f, 0.1f) else (0.05f, 0.95f)
        (i.toLong, Array(a, b, 0.01f * i, 0f))
      }).toDF("vec_id", "embedding")
    def run() = graft.ops.Similarity.kmeansLabels(emb, 2, 2).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val labels = run()
    assert(labels(0L) == 0 && labels(1L) == 1, "seeds keep their own clusters")
    (2 until 12).foreach { i =>
      assert(labels(i.toLong) == (if (i % 2 == 0) 0 else 1),
        s"vec $i landed in ${labels(i.toLong)}")
    }
    assert(run() == labels, "fixed seed + fixed iterations must be deterministic")
  }

  test("PQ ADC: exact self-distance to codebook seeds, cluster recall, determinism") {
    // 8-dim vectors, m=2 subvectors of 4 dims; two planted clusters far
    // apart so even lossy codes must keep top-1 inside the cluster
    val emb = (0 until 16).map { i =>
      val base = if (i % 2 == 0) Array(1f, 1f, 0f, 0f, 1f, 1f, 0f, 0f)
                 else Array(0f, 0f, 1f, 1f, 0f, 0f, 1f, 1f)
      (i.toLong, base.zipWithIndex.map { case (v, p) => v + 0.01f * i * (p % 3) })
    }.toDF("vec_id", "embedding")
    def run() = graft.ops.Similarity.pqTopK(emb, Seq(4L, 5L), k = 3,
      m = 2, codebookSize = 4, iters = 2).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    val got = run()
    assert(got == run(), "PQ must be deterministic")
    // top-1 neighbor of each query stays in the query's planted cluster
    got.filter(_._2 == 1).foreach { case (q, _, n, _) =>
      assert(q % 2 == n % 2, s"query $q top-1 crossed clusters to $n") }
    // guards
    intercept[IllegalArgumentException](
      graft.ops.Similarity.pqTopK(emb, Seq(0L), k = 3, m = 3)) // 8 % 3 != 0
  }

  test("IVF-PQ: nProbe=1 confines candidates to the query's cluster; deterministic") {
    // two planted clusters; seeds 0,1 in opposite clusters so the coarse
    // quantizer separates them (kmeans seed semantics)
    val emb = (0 until 16).map { i =>
      val base = if (i % 2 == 0) Array(1f, 1f, 0f, 0f, 1f, 1f, 0f, 0f)
                 else Array(0f, 0f, 1f, 1f, 0f, 0f, 1f, 1f)
      (i.toLong, base.zipWithIndex.map { case (v, p) => v + 0.01f * i * (p % 3) })
    }.toDF("vec_id", "embedding")
    def run() = graft.ops.Similarity.ivfPqTopK(emb, Seq(2L, 3L), k = 5,
      clusters = 2, nProbe = 1, m = 2, codebookSize = 4, iters = 2).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    val got = run()
    assert(got == run(), "IVF-PQ must be deterministic")
    assert(got.nonEmpty)
    // with one probed cluster, every candidate shares the query's parity
    // (the planted cluster identity) — the IVF prune is structural
    got.foreach { case (q, _, n, _) =>
      assert(q % 2 == n % 2, s"nProbe=1 leaked $n into query $q's results") }
    intercept[IllegalArgumentException](graft.ops.Similarity.ivfPqTopK(
      emb, Seq(0L), k = 3, clusters = 2, nProbe = 3)) // nProbe > clusters
  }

  test("cosinePairs ≡ brute force at the near-dup threshold") {
    val got = Similarity.cosinePairs(df, tau).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.nonEmpty, "vacuous test: no qualifying pairs")
    assert(got == brute, s"missed ${brute -- got}, extra ${got -- brute}")
  }

  test("banding candidates are a superset of truth AND prune vs all-pairs") {
    val cands = Similarity.cosinePairCandidates(df, tau).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.subsetOf(cands), s"incomplete banding: ${brute -- cands}")
    val allPairs = rows.size.toLong * (rows.size - 1) / 2
    assert(cands.size < allPairs * 7 / 10,
      s"banding pruned nothing: ${cands.size} of $allPairs")
  }

  /** The 100-TB-shape gate (round-2 verdict): at τ=0.9 on a clustered
    * corpus the grid must keep candidates under 10% of all pairs — the
    * round-2 single-coordinate banding sat near all-pairs here. 16
    * clusters at unit centers (±0.5, ±0.5, ±0.5, ±0.5, 0…) are separated
    * by ≥ 1.0 along each of the first four coordinates (> 2·eps = 0.894),
    * so a 4-coordinate grid isolates every cluster; tight member noise
    * keeps within-cluster cosine ≥ τ and bucket membership stable. */
  val tau90 = 0.9

  def vec16(c: Int, m: Int): Array[Float] = Array.tabulate(dim) { d =>
    val center =
      if (d < 4) (if (((c >> d) & 1) == 1) 0.5f else -0.5f) else 0f
    val noise = (((c * 131 + m * 17 + d * 7) % 11) - 5) * 0.004f
    center + noise
  }

  val rows16: Seq[(Long, Array[Float], Int)] =
    for (c <- 0 until 16; m <- 0 until 25) yield (c * 25L + m, vec16(c, m), c)

  lazy val brute16: Set[(Long, Long)] = (for {
    (ia, ea, _) <- rows16
    (ib, eb, _) <- rows16
    if ia < ib
    if BigDecimal(cos(unit(ea), unit(eb)))
      .setScale(7, BigDecimal.RoundingMode.HALF_UP).toDouble >= tau90
  } yield (ia, ib)).toSet

  lazy val df16 = rows16.toDF("vec_id", "embedding", "label")

  test("τ=0.9 clustered corpus: result ≡ brute AND candidates < 10% of all-pairs") {
    assert(brute16.nonEmpty, "vacuous test: no qualifying pairs")
    val got = Similarity.cosinePairs(df16, tau90).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == brute16, s"missed ${brute16 -- got}, extra ${got -- brute16}")
    val cands = Similarity.cosinePairCandidates(df16, tau90).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute16.subsetOf(cands), s"incomplete banding: ${brute16 -- cands}")
    val allPairs = rows16.size.toLong * (rows16.size - 1) / 2
    assert(cands.size < allPairs / 10,
      s"grid banding not a 100-TB shape: ${cands.size} of $allPairs candidates")
  }

  test("semDedup ≡ Scala reimplementation of the pinned semantics; " +
    "rank-1 docs always kept; deterministic") {
    // 2 planted clusters; members of a cluster are near-identical (the
    // duplicate relation) except one far member per cluster that stays
    // below τ against everything.
    val emb = (Seq(
      (0L, Array(1f, 0f, 0f, 0f)), (1L, Array(0f, 1f, 0f, 0f))) ++
      (2 until 10).map { i =>
        val (a, b) = if (i % 2 == 0) (0.9f, 0.1f) else (0.05f, 0.95f)
        (i.toLong, Array(a + 0.001f * i, b, 0.002f * i, 0f))
      } ++ Seq( // far members: same half-space, low cosine to the rest
        (10L, Array(0.5f, 0.1f, 0.9f, 0f)),
        (11L, Array(0.1f, 0.5f, 0f, 0.9f)))).toDF("vec_id", "embedding")
    val tau = 0.97
    val got = Similarity.semDedup(emb, 2, 2, tau).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2)))

    // independent Scala twin: labels from the separately-tested
    // kmeansLabels, then centroid(round avg 6) → rank → greedy drop
    val labels = Similarity.kmeansLabels(emb, 2, 2).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val vecs = emb.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    def rnd(v: Double, s: Int) =
      BigDecimal(v).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble
    def cosF(a: Array[Double], b: Array[Double]) = {
      val dot = a.zip(b).foldLeft(0.0)((acc, p) => acc + p._1 * p._2)
      def nrm(x: Array[Double]) =
        math.sqrt(x.foldLeft(0.0)((acc, v) => acc + v * v))
      dot / (nrm(a) * nrm(b))
    }
    val expected = labels.groupBy(_._2).toSeq.flatMap { case (lab, mem) =>
      val ids = mem.keys.toSeq
      val dim = vecs(ids.head).length
      val centroid = Array.tabulate(dim) { d =>
        rnd(ids.map(vecs(_)(d)).sum / ids.size, 6)
      }
      val ranked = ids.sortBy(id => (-rnd(cosF(vecs(id), centroid), 9), id))
      val keeps = ranked.zipWithIndex.map { case (id, r) =>
        val dropped = ranked.take(r)
          .exists(y => rnd(cosF(vecs(id), vecs(y)), 7) >= tau)
        (id, lab, !dropped)
      }
      assert(keeps.head._3, s"rank-1 doc of cluster $lab must be kept")
      keeps
    }.sortBy(_._1)
    assert(got.toSeq == expected, s"got ${got.toSeq}\nexpected $expected")
    assert(got.count(!_._3) >= 2, "vacuous: no semantic duplicates dropped")
    assert(got.count(_._3) >= 4, "vacuous: nothing kept beyond rank-1s")
    val again = Similarity.semDedup(emb, 2, 2, tau).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2)))
    assert(got.toSeq == again.toSeq, "semDedup must be deterministic")
  }

  test("mrlTopK: full shortlist ≡ brute force; sims are FULL cosines; deterministic") {
    import spark.implicits._
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))
    val brute = Similarity.bruteForceTopK(df.select("vec_id", "embedding"),
      Seq(0L, 21L), 10).collect().map(key)
    // shortlist covering the whole corpus: stage 2 sees everything → ≡ brute
    val full = Similarity.mrlTopK(df.select("vec_id", "embedding"),
      Seq(0L, 21L), 10, 8, 300).collect().map(key)
    assert(full.toSeq == brute.toSeq, "full-shortlist MRL must equal brute")
    // tight shortlist: reported sims must still be the FULL-dim cosines
    val tight = Similarity.mrlTopK(df.select("vec_id", "embedding"),
      Seq(0L, 21L), 10, 8, 25).collect().map(key)
    val bruteSims = brute.map(t => (t._1, t._3) -> t._4).toMap
    tight.foreach { case (q, _, v, s) =>
      bruteSims.get((q, v)).foreach(bs => assert(bs == s,
        s"sim for ($q,$v) is not the full cosine: $s vs $bs")) }
    assert(Similarity.mrlTopK(df.select("vec_id", "embedding"),
      Seq(0L, 21L), 10, 8, 25).collect().map(key).toSeq == tight.toSeq)
    intercept[IllegalArgumentException](
      Similarity.mrlTopK(df.select("vec_id", "embedding"), Seq(0L), 10, 8, 5))
  }

  test("sq8TopK: ADC cosine within quantization error of exact; constant dim safe; deterministic") {
    import spark.implicits._
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))
    val emb = df.select("vec_id", "embedding")
    val got = Similarity.sq8TopK(emb, Seq(0L, 21L), 10).collect().map(key)
    assert(got.length == 20)
    val bruteSims = Similarity.bruteForceTopK(emb, Seq(0L, 21L), 199)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    got.foreach { case (q, _, v, s) =>
      assert(math.abs(s - bruteSims((q, v))) < 0.05,
        s"ADC sim drifts beyond 8-bit error for ($q,$v): $s vs ${bruteSims((q, v))}") }
    // a constant coordinate (max = min → scale 0) must not divide by zero
    import org.apache.spark.sql.functions._
    val const = emb.withColumn("embedding",
      concat(array(lit(1.5f)), col("embedding")))
    assert(Similarity.sq8TopK(const, Seq(0L, 21L), 10).collect().length == 20)
    assert(Similarity.sq8TopK(emb, Seq(0L, 21L), 10).collect().map(key).toSeq
      == got.toSeq, "sq8TopK must be deterministic")
  }

  test("rrfTopK ≡ hand fusion of the two rankers' top lists; deterministic") {
    import spark.implicits._
    val emb = df.select("vec_id", "embedding")
    def ranks(d: org.apache.spark.sql.DataFrame) = d.collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getInt(1)).toMap
    val ra = ranks(Similarity.bruteForceTopK(emb, Seq(0L, 21L), 20))
    val rb = ranks(Similarity.sq8TopK(emb, Seq(0L, 21L), 20))
    val expected = (ra.keySet ++ rb.keySet).groupBy(_._1).flatMap {
      case (q, keys) =>
        keys.toSeq.map { key =>
          val rrf = ra.get(key).map(r => 1.0 / (60 + r)).getOrElse(0.0) +
            rb.get(key).map(r => 1.0 / (60 + r)).getOrElse(0.0)
          (q, key._2, BigDecimal(rrf).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble)
        }.sortBy(t => (-t._3, t._2)).take(10).zipWithIndex
          .map { case ((_, v, s), i) => (q, i + 1, v, s) }
    }.toSeq.sortBy(t => (t._1, t._2))
    val got = Similarity.rrfTopK(emb, Seq(0L, 21L), 10, 20, 60).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == expected, s"fusion differs:\n got $got\n exp $expected")
    assert(Similarity.rrfTopK(emb, Seq(0L, 21L), 10, 20, 60).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq == got)
    intercept[IllegalArgumentException](Similarity.rrfTopK(emb, Seq(0L), 10, 5, 60))
  }
}
