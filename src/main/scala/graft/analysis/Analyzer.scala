package graft.analysis

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The single tokenizer/normalizer shared by index build, query parsing,
  * tests, and the DuckDB oracle (SURVEY.md §2.3, A1–A4).
  *
  * Pinned contract (the analysis chain IS the correctness contract —
  * Solr-style analyzer semantics, see SURVEY.md §2.3 [PUB]):
  *   1. lowercase (Unicode-aware; corpus is ASCII so all three
  *      implementations — Spark `lower`, DuckDB `lower`, Java
  *      `toLowerCase(Locale.ROOT)` — agree);
  *   2. split on runs of anything outside [a-z0-9];
  *   3. drop empty tokens.
  *
  * Three bit-identical twins live here so there is exactly one place to
  * change: the Column form (codegen'd, used in every Spark plan), the
  * Scala form (driver-side query parsing + property tests), and the
  * DuckDB SQL form (spliced into every oracle query).
  */
object Analyzer {
  /** Token separator charclass, applied after lowercasing. */
  final val TokenSep = "[^a-z0-9]+"

  /** tokens(text): ArrayType(StringType). Pure Column expression —
    * whole-stage-codegen friendly, no UDF. */
  def tokens(text: Column): Column =
    filter(split(lower(text), TokenSep), t => t =!= lit(""))

  /** Doc length (dl) = token count. IntegerType. */
  def docLen(text: Column): Column = size(tokens(text)).cast("int")

  /** Scala twin — MUST stay equivalent to [[tokens]]. */
  def tokenize(text: String): Seq[String] =
    text.toLowerCase(java.util.Locale.ROOT)
      .split(TokenSep).toIndexedSeq.filter(_.nonEmpty)

  /** DuckDB twin: SQL list expression over a text expression. */
  def sqlTokenList(textExpr: String): String =
    s"list_filter(string_split_regex(lower($textExpr), '[^a-z0-9]+'), x -> x <> '')"

  /** DuckDB twin of [[docLen]]. */
  def sqlDocLen(textExpr: String): String =
    s"CAST(len(${sqlTokenList(textExpr)}) AS INT)"

  // ---- optional chain extensions (Solr analyzer filters, OFF unless a
  // caller composes them BEFORE the pinned tokenize chain) --------------

  /** ASCIIFoldingFilter (public Lucene semantics, charFilter position):
    * pinned Latin-1-supplement fold map. A fixed `translate` charset —
    * not locale/ICU normalization — so all three twins are bit-identical
    * by construction. Composes as a TEXT→TEXT transform before [[tokens]]
    * (folding commutes with the [a-z0-9] tokenizer: every folded char is
    * a token separator pre-fold and alphanumeric post-fold). */
  final val FoldFrom = "áàâäéèêëíìîïóòôöúùûüýÿñç"
  final val FoldTo   = "aaaaeeeeiiiioooouuuuyync"

  /** Column twin (codegen'd, no UDF). */
  def foldAscii(text: Column): Column = translate(text, FoldFrom, FoldTo)

  /** Scala twin — query-side folding at parse time. */
  def foldAsciiString(s: String): String = {
    val m = FoldFrom.zip(FoldTo).toMap
    s.map(c => m.getOrElse(c, c))
  }

  /** DuckDB twin. */
  def sqlFoldAscii(textExpr: String): String =
    s"translate($textExpr, '$FoldFrom', '$FoldTo')"

  /** EnglishMinimalStemFilter (public Lucene semantics): strip a single
    * trailing `s` from tokens of length ≥ 3 unless preceded by `u` or
    * `s` — exactly Lucene's `len<3 || last!='s' ? keep : s[len-2] in
    * {u,s} ? keep : drop` rule, expressed as ONE regex shared by all
    * three twins: `^(..*[^us])s$` (the two-char group minimum encodes
    * the length-3 floor; the class encodes the u/s guard). Applied per
    * token AFTER tokenize (a tokenFilter); [[stemmedText]] re-joins with
    * single spaces so the pinned tokenize chain re-derives the stemmed
    * token stream — dl (token count) is preserved. */
  final val StemPattern = "^(..*[^us])s$"

  /** Column twin: text → space-joined stemmed token stream. */
  def stemmedText(text: Column): Column =
    array_join(transform(tokens(text),
      t => regexp_replace(t, StemPattern, "$1")), " ")

  /** Scala twin — query-side stemming at parse time. */
  def stemString(s: String): String =
    tokenize(s).map(_.replaceAll(StemPattern, "$1")).mkString(" ")

  /** DuckDB twin (replacement backref is `\1` in DuckDB, `$1` in Spark). */
  def sqlStemmedText(textExpr: String): String =
    s"""array_to_string(list_transform(${sqlTokenList(textExpr)}, x -> regexp_replace(x, '^(..*[^us])s$$', '\\1')), ' ')"""

  /** Solr FieldAnalysisRequestHandler analog: per-stage token streams of
    * the full optional chain (charFilter → tokenizer → tokenFilter) for
    * each input row — (doc_id, stage, pos, token) with
    * stage ∈ {1_raw, 2_folded, 3_stemmed} (numbered so lexicographic
    * order IS chain order) and 0-based positions within each stage's
    * stream. The introspection surface every Solr admin uses to debug an
    * analyzer; pure Column expressions (one posexplode per stage over the
    * stage-composed arrays), map-only at any corpus size. */
  def analysisChain(corpus: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    def stage(name: String, toks: Column) =
      corpus.select(col("doc_id"), lit(name).as("stage"),
        posexplode(toks))
        .toDF("doc_id", "stage", "pos", "token")
    stage("1_raw", tokens(col("text")))
      .unionAll(stage("2_folded", tokens(foldAscii(col("text")))))
      .unionAll(stage("3_stemmed",
        tokens(stemmedText(foldAscii(col("text"))))))
      .orderBy("doc_id", "stage", "pos")
  }
}
