package graft.search

/** MaxScore top-k traversal (Turtle & Flood, "Query evaluation:
  * strategies and optimizations", IP&M 1995; the essential /
  * non-essential list partition in its modern DAAT form, e.g. Mallia,
  * Siedlaczek & Suel, ECIR 2019 — public algorithms; SURVEY.md §2.9).
  *
  * The OTHER canonical dynamic-pruning family next to WAND: instead of
  * sorting cursors by current doc and bounding a pivot prefix, MaxScore
  * fixes a partition of the query's terms by term upper bound. The
  * ascending-UB prefix whose summed upper bounds cannot reach the current
  * θ is NON-ESSENTIAL: no document matching only those terms can enter
  * the top-k, so the driver loop draws candidates exclusively from the
  * essential suffix and probes non-essential lists per candidate with an
  * early-exit bound (highest UB first). As θ rises the essential suffix
  * shrinks — hot low-impact terms stop driving iteration entirely, which
  * is exactly the behavior that matters for scale: a stop-word-ish term
  * in a 10^12-turn corpus is probed (skipping via block metadata), never
  * walked.
  *
  * Shares [[BlockMaxWand.Cursor]] — the same lazily-decoded block
  * cursor, so whole blocks of non-essential lists are skipped without
  * decoding during `seek`. Equivalence contract and FP guards are
  * identical to [[BlockMaxWand]]: output equals the exhaustive path's
  * top-k under the pinned ranking (round(score,7) DESC, doc_id ASC);
  * pruning compares against θ with margin [[BlockMaxWand.Eps]]; pool
  * admission compares ROUNDED scores with the doc-id tie-break. The
  * optional `seed` is the same per-query lower bound on the global k-th
  * best used by the doc-range-parallel integration
  * ([[IndexSearch.searchMaxScore]]): per-range results may drop docs
  * below the seed, which cannot enter the global rank-merged top-k.
  */
object MaxScore {

  import BlockMaxWand.{Cursor, Eps, ExhaustedDoc, TermPostings, round}

  /** Top-k docs for one query: (doc_id, rawScore) in the pinned order. */
  def topK(terms: Seq[TermPostings], k: Int, nDocs: Long,
           avgdl: Double): Seq[(Long, Double)] =
    topKRange(terms, k, nDocs, avgdl, 0L, Long.MaxValue)

  /** Top-k restricted to docs in [lo, hi) — the per-range unit of the
    * doc-range-parallel search. Same rank-merge exactness argument as
    * [[BlockMaxWand.topKRange]]. */
  def topKRange(terms: Seq[TermPostings], k: Int, nDocs: Long,
                avgdl: Double, lo: Long, hi: Long,
                seed: Double = Double.NegativeInfinity): Seq[(Long, Double)] = {
    if (terms.isEmpty || k <= 0) return Seq.empty
    // cursors ascending by term upper bound; prefix(i) = Σ UB of [0..i]
    val cursors =
      terms.map(t => new Cursor(t, nDocs, avgdl, lo, hi))
        .sortBy(_.upperBound).toArray
    val n = cursors.length
    val prefix = new Array[Double](n)
    var acc = 0.0
    var pi = 0
    while (pi < n) { acc += cursors(pi).upperBound; prefix(pi) = acc; pi += 1 }

    implicit val worstFirst: Ordering[(Long, Double)] =
      Ordering.by[(Long, Double), (Double, Long)] {
        case (d, s) => (-round(s, Bm25.RankScale), d)
      }
    val pool = scala.collection.mutable.PriorityQueue.empty[(Long, Double)]
    def theta: Double =
      math.max(seed, if (pool.size < k) Double.NegativeInfinity else pool.head._2)

    var done = false
    while (!done) {
      val th = theta
      // first essential index: smallest e whose prefix could reach θ.
      // With θ = −∞ (pool not full, no seed) e = 0 — plain exhaustive DAAT
      // until the pool fills, which is what makes the result exact.
      var e = 0
      while (e < n && prefix(e) < th - Eps) e += 1
      if (e >= n) done = true // even all lists together cannot reach θ
      else {
        // candidate = min current doc over the ESSENTIAL suffix only.
        // θ only grows ⇒ e only grows ⇒ the suffix shrinks over time and
        // every cursor in it sits past all previously-scored candidates,
        // so the candidate sequence is strictly increasing — which keeps
        // the non-essential seeks below monotone (Cursor.seek forward-only).
        var pivot = ExhaustedDoc
        var i = e
        while (i < n) {
          val d = cursors(i).curDoc
          if (d < pivot) pivot = d
          i += 1
        }
        if (pivot == ExhaustedDoc) done = true
        else {
          var s = 0.0
          i = e
          while (i < n) {
            val c = cursors(i)
            if (c.curDoc == pivot) { s += c.score(); c.next() }
            i += 1
          }
          // probe non-essential lists, highest UB first; abandon the doc
          // the moment even all remaining UBs cannot lift it to θ
          var j = e - 1
          var viable = true
          while (j >= 0 && viable) {
            if (s + prefix(j) < th - Eps) viable = false
            else {
              val c = cursors(j)
              c.seek(pivot)
              if (c.curDoc == pivot) s += c.score()
              j -= 1
            }
          }
          if (viable) {
            if (pool.size < k) pool.enqueue((pivot, s))
            else {
              val (wd, ws) = pool.head
              val r = round(s, Bm25.RankScale)
              val rw = round(ws, Bm25.RankScale)
              if (r > rw || (r == rw && pivot < wd)) {
                pool.dequeue(); pool.enqueue((pivot, s))
              }
            }
          }
        }
      }
    }
    pool.toSeq.sortBy { case (d, s) => (-round(s, Bm25.RankScale), d) }
  }
}
