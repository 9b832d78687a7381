package graft.search

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Pluggable similarity models — Solr's `<similarity>` schema element.
  * Besides the default BM25 ([[Bm25]], Robertson et al.), Lucene ships a
  * family of alternatives a Solr user selects per field type; the two
  * most used are reimplemented here from their published formulas:
  *
  *  - [[Similarities.LMDirichlet]] — language-model similarity with
  *    Dirichlet smoothing (Zhai & Lafferty, SIGIR 2001; Lucene
  *    `LMDirichletSimilarity`): per matching term
  *    `max(0, ln(1 + tf/(μ·p(w|C))) + ln(μ/(dl+μ)))` with the collection
  *    model `p(w|C) = (cf+1)/(|C|+1)` (Lucene's DefaultCollectionModel
  *    add-one smoothing; cf = collection frequency, |C| = total token
  *    count). The negative-clamp mirrors Lucene's `score > 0 ? score : 0`.
  *  - [[Similarities.ClassicTfIdf]] — Lucene's pre-6.0 default
  *    `ClassicSimilarity` (practical TF-IDF): per matching term
  *    `sqrt(tf) · idf² · 1/sqrt(dl)` with
  *    `idf = 1 + ln((nDocs+1)/(df+1))`; idf enters squared because both
  *    the query weight and the doc weight carry one factor. The engine
  *    pins EXACT dl in the norm (same choice as BM25 — see
  *    [[Bm25.quantizeDl]] for the optional Lucene byte-norm emulation).
  *
  * Each model carries its Column expression AND its DuckDB SQL twin in
  * ONE object with mirrored associativity, so engine and oracle cannot
  * drift (the `clauseTail` idiom). Dynamic pruning (WAND / MaxScore)
  * stays BM25-only: the persisted block maxes are BM25 upper bounds, so
  * alternative similarities serve through the exhaustive decode path
  * ([[IndexSearch.searchSim]]) — still dictionary-pruned, shard-pruned,
  * and distributed, just not block-skipped.
  *
  * Scale note: both models are pure per-posting Column expressions over
  * the same decoded match relation as BM25 — no extra shuffle, no UDFs,
  * fully codegen'd; cf rides the (broadcast) dictionary probe.
  */
object Similarities {

  sealed trait SimilarityModel {
    /** Per-(term, doc) partial score as a Column over the decoded match
      * relation (tf, dl int; df, cf long). */
    def termScore(tf: Column, dl: Column, df: Column, cf: Column,
                  nDocs: Long, avgdl: Double, totalTokens: Long): Column
    /** DuckDB twin over the oracle CTE columns — MUST mirror
      * [[termScore]]'s operation tree (same associativity) so both
      * engines produce bit-identical doubles pre-rounding. Column
      * references: tf.tf, dl.dl, df.df, df.cf, s.n_docs, s.avgdl,
      * s.total_tokens. */
    def sqlTermScore: String
  }

  /** μ defaults to 2000 — Lucene's LMDirichletSimilarity default. */
  final case class LMDirichlet(mu: Double = 2000.0) extends SimilarityModel {
    override def termScore(tf: Column, dl: Column, df: Column, cf: Column,
                           nDocs: Long, avgdl: Double,
                           totalTokens: Long): Column =
      greatest(lit(0.0),
        log(lit(1.0) + tf / (lit(mu) * ((cf + lit(1.0)) / lit(totalTokens + 1.0)))) +
          log(lit(mu) / (dl + lit(mu))))
    override def sqlTermScore: String =
      s"greatest(0.0, ln(1.0 + tf.tf / ($mu * ((df.cf + 1.0) / (s.total_tokens + 1.0)))) " +
        s"+ ln($mu / (dl.dl + $mu)))"
  }

  /** Language-model similarity with Jelinek–Mercer smoothing (Zhai &
    * Lafferty, SIGIR 2001; Lucene `LMJelinekMercerSimilarity`): per
    * matching term `ln(1 + ((1−λ)·tf/dl) / (λ·p(w|C)))` with the same
    * add-one collection model as [[LMDirichlet]]. λ defaults to 0.7 —
    * the Zhai & Lafferty recommendation for (short) keyword queries
    * that Solr's ref guide repeats; Lucene's base-class negative clamp
    * is kept for symmetry though JM's log1p(≥0) never goes negative. */
  final case class LMJelinekMercer(lambda: Double = 0.7) extends SimilarityModel {
    require(lambda > 0.0 && lambda < 1.0, s"lambda must be in (0,1), got $lambda")
    override def termScore(tf: Column, dl: Column, df: Column, cf: Column,
                           nDocs: Long, avgdl: Double,
                           totalTokens: Long): Column =
      greatest(lit(0.0),
        log(lit(1.0) + (lit(1.0 - lambda) * tf / dl) /
          (lit(lambda) * ((cf + lit(1.0)) / lit(totalTokens + 1.0)))))
    override def sqlTermScore: String =
      s"greatest(0.0, ln(1.0 + ((1.0 - $lambda) * tf.tf / dl.dl) / " +
        s"($lambda * ((df.cf + 1.0) / (s.total_tokens + 1.0)))))"
  }

  case object ClassicTfIdf extends SimilarityModel {
    override def termScore(tf: Column, dl: Column, df: Column, cf: Column,
                           nDocs: Long, avgdl: Double,
                           totalTokens: Long): Column = {
      val idf = lit(1.0) + log(lit(nDocs + 1.0) / (df + lit(1.0)))
      sqrt(tf) * (idf * idf) / sqrt(dl)
    }
    override def sqlTermScore: String = {
      val idf = "(1.0 + ln((s.n_docs + 1.0) / (df.df + 1.0)))"
      s"sqrt(tf.tf) * ($idf * $idf) / sqrt(dl.dl)"
    }
  }
}
