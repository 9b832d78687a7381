package graft.search

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** BM25 scoring, pinned to Lucene ≥8 / Solr `BM25Similarity` defaults
  * (SURVEY.md §2.9 [PUB]):
  *
  *   idf(t)     = ln(1 + (N − df + 0.5) / (df + 0.5))
  *   score(t,d) = idf(t) · tf / (tf + k1 · (1 − b + b · dl/avgdl))
  *   score(q,d) = Σ_{t ∈ q ∩ d} score(t,d)
  *
  * k1 = 1.2, b = 0.75, natural log, exact dl (no Lucene SmallFloat norm
  * quantization — see SURVEY.md §2.9 rank-identicality note). The DuckDB
  * oracle in [[graft.Oracle]] spells the identical expression tree so the
  * per-term arithmetic is bit-exact across engines; only the Σ over terms
  * and avg(dl) are order-dependent, which the topk ranking absorbs by
  * rounding to [[RankScale]] decimals before comparing.
  */
object Bm25 {
  final val K1 = 1.2
  final val B = 0.75

  /** Decimals used for rank ordering (absorbs FP sum-order noise ~1e-13
    * while being far finer than any semantic score gap). */
  final val RankScale = 7

  /** Decimals used for reported scores (oracle-compared). */
  final val OutScale = 4

  def idf(df: Column, nDocs: Column): Column =
    log(lit(1.0) + (nDocs - df + lit(0.5)) / (df + lit(0.5)))

  /** Scala twin of [[termScore]] — used by the posting-list aggregate and
    * the WAND traversal. MUST mirror the Column expression tree op-for-op
    * (same associativity) so both paths produce bit-identical doubles. */
  def score(tf: Int, dl: Int, df: Long, nDocs: Long, avgdl: Double): Double = {
    val idf = math.log(1.0 + (nDocs - df + 0.5) / (df + 0.5))
    idf * tf / (tf + K1 * (1.0 - B + B * dl / avgdl))
  }

  /** Per-(term, doc) partial score. All inputs numeric Columns; `tf` and
    * `dl` may be IntegerType (promoted exactly as in the SQL twin). */
  def termScore(tf: Column, dl: Column, df: Column,
                nDocs: Column, avgdl: Column): Column =
    idf(df, nDocs) * tf /
      (tf + lit(K1) * (lit(1.0) - lit(B) + lit(B) * dl / avgdl))
}
