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
}
