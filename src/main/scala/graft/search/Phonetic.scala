package graft.search

import graft.analysis.Analyzer
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Solr PhoneticFilter-style search (sounds-like matching): query tokens
  * expand against the dictionary into every term sharing their phonetic
  * code, then score through the standard disjunctive engine with each
  * expanded term's OWN idf (the same SCORING_BOOLEAN rewrite the other
  * MultiTermQuery paths pin — [[MultiTerm]]).
  *
  * The code is a pinned SIMPLIFIED SOUNDEX over the analyzer's token
  * alphabet `[a-z0-9]`:
  *
  *   1. map every char to a class digit (`translate`): vowels + h/w/y → 0,
  *      b/f/p/v → 1, c/g/j/k/q/s/x/z → 2, d/t → 3, l → 4, m/n → 5, r → 6,
  *      digits 0-9 → 7;
  *   2. collapse adjacent equal digits;
  *   3. drop the 0s;
  *   4. code = first CHAR of the term + the next 3 digits (skipping the
  *      first char's own digit when it is a consonant), right-padded
  *      with 0.
  *
  * This is classic American Soundex EXCEPT that h/w separate equal-coded
  * consonants (classic treats a consonant pair split by h/w as one
  * occurrence) — a documented pinned divergence, chosen because the chain
  * above renders IDENTICALLY in Spark Column ops, DuckDB SQL, and plain
  * Scala ([[codeCol]]/[[sqlCode]]/[[codeOf]] — the [[Analyzer]]
  * triple-twin idiom; MultiTermSpec pins the three ≡ on random tokens).
  * Tokens carrying digits all land in class 7 — they group with each
  * other only, never with letter runs.
  */
object Phonetic {

  final val Alphabet = "abcdefghijklmnopqrstuvwxyz0123456789"
  final val Codes = "01230120022455012623010202" + "7777777777"

  /** Scala reference twin (driver-side stem codes + the property spec's
    * independent oracle). Input must be non-empty over `[a-z0-9]`. */
  def codeOf(term: String): String = {
    val digits = term.map(c => Codes(Alphabet.indexOf(c)))
    val collapsed = digits.foldLeft(new StringBuilder) { (sb, c) =>
      if (sb.nonEmpty && sb.last == c) sb else sb.append(c)
    }.toString
    val dropped = collapsed.filter(_ != '0')
    val body =
      if (digits.head == '0') dropped.take(3) else dropped.drop(1).take(3)
    term.take(1) + body.padTo(3, '0')
  }

  /** Spark Column twin (dictionary-side codes, codegen'd built-ins). */
  def codeCol(term: Column): Column = {
    val digits = translate(term, Alphabet, Codes)
    val dropped = regexp_replace(
      regexp_replace(digits, "(.)\\1+", "$1"), "0", "")
    val body = when(substring(digits, 1, 1) === "0", substring(dropped, 1, 3))
      .otherwise(substring(dropped, 2, 3))
    concat(substring(term, 1, 1), rpad(body, 3, "0"))
  }

  /** DuckDB SQL twin (oracle-side codes). DuckDB regexp_replace needs the
    * explicit 'g' flag and `\1` backrefs where Spark is global with `$1`;
    * everything else is verbatim. */
  def sqlCode(expr: String): String = {
    val digits = s"translate($expr, '$Alphabet', '$Codes')"
    val dropped =
      s"replace(regexp_replace($digits, '(.)\\1+', '\\1', 'g'), '0', '')"
    s"""substr($expr, 1, 1) || rpad(CASE WHEN substr($digits, 1, 1) = '0'
       | THEN substr($dropped, 1, 3) ELSE substr($dropped, 2, 3) END, 3, '0')""".stripMargin
      .replace("\n", "")
  }

  /** Every analyzed token of a phonetic query is a sounds-like stem
    * (Solr applies the PhoneticFilter to the whole analysis chain). */
  def parsePhoneticQuery(text: String): Seq[String] =
    Analyzer.tokenize(text).distinct

  /** Batch phonetic expansion: ONE dictionary pass for the whole stem set
    * — the dictionary's codes computed by the codegen'd [[codeCol]], the
    * broadcast stems' by [[codeOf]]; per-stem expansion rows are
    * row_number-capped BEFORE the collect, fail-loud past maxExpansions
    * (the [[MultiTerm.expandFuzzies]] contract). A stem present in the
    * dictionary always expands to at least itself (its own code). */
  def expandPhonetic(idx: IndexSearch.OpenIndex, stems0: Seq[String],
                     maxExpansions: Int): Map[String, Seq[String]] = {
    val spark = idx.spark
    import spark.implicits._
    val stems = stems0.distinct
    if (stems.isEmpty) return Map.empty
    val stemsDf = broadcast(stems.map(s => (s, codeOf(s))).toDF("_stem", "_code"))
    val w = Window.partitionBy("_stem").orderBy("term")
    val rows = idx.dictionary.select("term")
      .join(stemsDf, codeCol(col("term")) === col("_code"))
      .withColumn("_rn", row_number().over(w))
      .where(col("_rn") <= maxExpansions + 1)
      .select("_stem", "term").collect()
    val m: Map[String, Seq[String]] = rows.toSeq
      .groupBy(_.getString(0))
      .map { case (st, rs) => st -> rs.map(_.getString(1)) }
    m.foreach { case (st, ts) =>
      require(ts.size <= maxExpansions,
        s"phonetic '$st' expands to more than maxExpansions=$maxExpansions " +
          "dictionary terms (Lucene TooManyClauses analog)")
    }
    m
  }

  def searchPhonetic(idx: IndexSearch.OpenIndex, queries: Seq[(Int, String)],
                     k: Int = 10,
                     maxExpansions: Int = IndexSearch.DefaultMaxExpansions): DataFrame = {
    val parsed = queries.map { case (qid, t) => (qid, parsePhoneticQuery(t)) }
    val expansions = expandPhonetic(idx, parsed.flatMap(_._2), maxExpansions)
    val qtRows = parsed.flatMap { case (qid, stems) =>
      stems.flatMap(s => expansions.getOrElse(s, Nil)).distinct.map(t => (qid, t))
    }
    IndexSearch.searchExpandedTerms(idx, qtRows, k)
  }
}
