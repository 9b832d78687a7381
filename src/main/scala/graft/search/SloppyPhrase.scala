package graft.search

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Lucene-style SLOPPY phrase matching (`"a b"~N` with transpositions),
  * behind [[IndexSearch.searchPhrase]]'s `luceneSlop` flag.
  *
  * Pinned algorithm (the min-advance sweep documented for Lucene's
  * SloppyPhraseScorer [PUB]; property-gated against an independent
  * brute-force twin in PhraseSpec — no SQL oracle, the default in-order
  * semantics keep that role):
  *
  *  - each slot i of the phrase maps its token positions p to PHRASE
  *    positions pp = p − i (so a perfectly adjacent occurrence has all
  *    slots at the same pp);
  *  - sweep one pointer per slot over its ascending pp list: at each step
  *    the current configuration spans d = max(pp) − min(pp); if d ≤ slop
  *    AND no two slots sit on the same underlying token occurrence
  *    (compare pp + slot index — only repeated phrase terms can collide),
  *    it is a match contributing 1/(1+d) to the sloppy frequency
  *    (reciprocal-distance weighting — Lucene's documented sloppyFreq);
  *  - advance the pointer holding the minimum (ties: lowest slot index);
  *    stop when any list is exhausted.
  *
  * Matching is orderless (a transposed "b a" matches "a b" at slop ≥ 2 —
  * each transposition costs 2 displacement, as Lucene documents) and the
  * frequency is a Double, consumed in BM25's tf slot. The same-occurrence
  * rejection mirrors Lucene's repeat-collision avoidance in its effect on
  * the MATCH SET: `"a a"~1` does not match a doc containing a single "a"
  * (two slots may not consume one token). Residual divergence from Lucene
  * proper is confined to the exact sloppyFreq weighting of repeated-term
  * configurations; the brute-force twin in PhraseSpec re-derives the
  * pinned semantics independently from raw token lists.
  */
object SloppyPhrase {

  /** Sloppy frequency of one doc given per-slot ascending PHRASE-position
    * lists (`pp(i)` = positions of slot i's term, each minus i). Returns
    * 0 when any slot has no occurrences. */
  def freq(pp: Array[Array[Long]], slop: Int): Double = {
    var i = 0
    while (i < pp.length) {
      if (pp(i) == null || pp(i).isEmpty) return 0.0
      i += 1
    }
    val ptr = new Array[Int](pp.length)
    var f = 0.0
    var done = pp.length == 0
    while (!done) {
      var mnI = 0
      var mn = pp(0)(ptr(0))
      var mx = mn
      var j = 1
      while (j < pp.length) {
        val v = pp(j)(ptr(j))
        if (v < mn) { mn = v; mnI = j }
        if (v > mx) mx = v
        j += 1
      }
      val d = mx - mn
      if (d <= slop && distinctOccurrences(pp, ptr)) f += 1.0 / (1L + d)
      ptr(mnI) += 1
      if (ptr(mnI) >= pp(mnI).length) done = true
    }
    f
  }

  /** True iff no two slots of the current configuration resolve to the
    * same underlying token occurrence (raw position = pp + slot index).
    * Only repeated phrase terms can collide; distinct terms occupy
    * distinct token positions by construction, so for them this is a
    * no-op. O(m²) over the phrase length m (tiny). */
  private def distinctOccurrences(pp: Array[Array[Long]],
                                  ptr: Array[Int]): Boolean = {
    var i = 0
    while (i < pp.length) {
      val ri = pp(i)(ptr(i)) + i
      var j = i + 1
      while (j < pp.length) {
        if (pp(j)(ptr(j)) + j == ri) return false
        j += 1
      }
      i += 1
    }
    true
  }

  /** Column form over an array<array<long>> of per-slot phrase positions. */
  def freqColumn(ppLists: Column, slop: Int): Column =
    Shims.column(SloppyFreqExpr(Shims.expression(ppLists), slop))
}

/** Scalar expression: sloppy frequency of one candidate doc. Not on a
  * build-side hot path (runs once per candidate doc of a phrase batch),
  * so interpreted eval (CodegenFallback) is fine. */
case class SloppyFreqExpr(child: Expression, slop: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any = {
    val outer = v.asInstanceOf[ArrayData]
    val pp = new Array[Array[Long]](outer.numElements())
    var i = 0
    while (i < pp.length) {
      val inner = outer.getArray(i)
      pp(i) = if (inner == null) null else inner.toLongArray()
      i += 1
    }
    SloppyPhrase.freq(pp, slop)
  }
  override protected def withNewChildInternal(c: Expression): SloppyFreqExpr =
    copy(child = c)
}
