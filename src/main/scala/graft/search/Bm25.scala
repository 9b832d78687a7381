package graft.search

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.types.{DataType, IntegerType}

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

  /** Scala twin of [[idf]] (driver-side phrase idf sums). */
  def idfValue(df: Long, nDocs: Long): Double =
    math.log(1.0 + (nDocs - df + 0.5) / (df + 0.5))

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

  /** OPTIONAL Lucene norm-quantization emulation (SURVEY.md §2.9 note,
    * off by default — the engine pins EXACT dl for oracle
    * reproducibility). Lucene ≥8 stores dl through a lossy 1-byte
    * "4-bit-mantissa float" (`SmallFloat.intToByte4`/`byte4ToInt`,
    * public algorithm): values < 2^4 are exact; larger values keep the
    * top 4 significant bits with the exponent packed alongside, and
    * scoring uses the DECODED (bucket-floor) dl. Matching a live Solr's
    * scores bit-exactly requires passing dl through [[quantizeDl]] on
    * both the index and query sides — one pure, monotone, idempotent
    * function behind this flag; parity against a real Solr instance is
    * unverifiable in this sandbox (none exists), which is why the default
    * stays exact-dl. */
  def quantizeDl(dl: Int): Int = int4ToInt(intToInt4(dl))

  /** 4-bit-mantissa encode: identity below 2^4, then (exponent, top-4-bit
    * mantissa). Monotone non-decreasing. */
  def intToInt4(i: Int): Int = {
    require(i >= 0, s"negative dl: $i")
    val numBits = 32 - Integer.numberOfLeadingZeros(i)
    if (numBits <= 4) i
    else {
      val shift = numBits - 4
      ((shift + 1) << 3) | ((i >>> shift) & 0x07)
    }
  }

  /** Inverse of [[intToInt4]] up to quantization (returns the bucket
    * floor: decode(encode(x)) ≤ x, and encode∘decode is the identity on
    * encoded values). */
  def int4ToInt(q: Int): Int = {
    val exp = q >>> 3
    if (exp == 0) q
    else ((q & 0x07) | 0x08) << (exp - 1)
  }

  /** Column form of [[quantizeDl]] (native expression, codegen'd). */
  def quantizeDlCol(dl: Column): Column =
    Shims.column(QuantizeDlExpr(Shims.expression(dl)))
}

/** Codegen'd column twin of [[Bm25.quantizeDl]] — used when the
  * `quantizeNorms` flag routes exhaustive scoring through Lucene-style
  * lossy norms ([[Search.topK]]). Scoped to the EXHAUSTIVE path on
  * purpose: the persisted index stores exact dl and per-block max scores
  * computed from it, and a quantized (bucket-floor, hence ≤ exact) dl
  * yields HIGHER scores — the stored block maxes would stop being upper
  * bounds and WAND could skip true results. Solr-parity checks therefore
  * run exhaustively with the flag; the index paths pin exact dl. */
case class QuantizeDlExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any = Bm25.quantizeDl(v.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.search.Bm25.quantizeDl($c)")
  override protected def withNewChildInternal(c: Expression): QuantizeDlExpr = copy(c)
}
