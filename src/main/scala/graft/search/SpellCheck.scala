package graft.search

import graft.analysis.Analyzer
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Solr SpellCheckComponent (`spellcheck=true`, DirectSolrSpellChecker —
  * the index-as-dictionary checker): per misspelled query token, the
  * top-n correction candidates drawn from the index dictionary.
  *
  * Pinned semantics:
  *  - The query analyzes through the standard chain; each DISTINCT
  *    analyzed token of a request is checked independently (Solr's
  *    per-token suggestion map).
  *  - A token PRESENT in the dictionary is correctly spelled → zero rows
  *    for it (Solr only suggests for missing terms at the default
  *    `maxQueryFrequency` gate; presence = correct).
  *  - Candidates: dictionary terms with PLAIN Levenshtein distance ≤ 2
  *    (the same distance pinning as the fuzzy family — Lucene's
  *    internal distance is Damerau; documented divergence), ranked by
  *    (distance ASC, df DESC, term ASC) — Solr's "score then frequency"
  *    comparator with the deterministic term tie-break — truncated to n.
  *  - Output: (query_id, token, rank, suggestion, distance, df).
  *
  * Scale shape: ONE dictionary pass for the whole token batch (broadcast
  * token list, vectorized length-window prune before the levenshtein —
  * the [[MultiTerm.searchFuzzy]] shape); the correctly-spelled filter is
  * a broadcast left-anti against the same pass's exact matches. Nothing
  * collects; suggestion lists stay distributed.
  */
object SpellCheck {

  def suggest(idx: IndexSearch.OpenIndex, requests: Seq[(Int, String)],
              n: Int = 5, maxEdits: Int = 2): DataFrame = {
    require(n > 0, s"suggestion count must be positive (got $n)")
    require(maxEdits >= 1 && maxEdits <= 2,
      s"maxEdits must be 1..2 (Lucene automata bound; got $maxEdits)")
    val spark = idx.spark
    import spark.implicits._
    val toks = requests
      .flatMap { case (qid, text) => Analyzer.tokenize(text).distinct.map((qid, _)) }
      .distinct
    if (toks.isEmpty)
      return Seq.empty[(Int, String, Int, String, Int, Long)]
        .toDF("query_id", "token", "rank", "suggestion", "distance", "df")
    val tokDf = broadcast(toks.toDF("query_id", "token"))
    val present = idx.dictionary.select(col("term").as("token"))
    val missing = broadcast(tokDf.join(present, Seq("token"), "left_anti"))
    val w = Window.partitionBy("query_id", "token")
      .orderBy(col("distance").asc, col("df").desc, col("suggestion").asc)
    idx.dictionary.select(col("term").as("suggestion"), col("df"))
      .join(missing,
        abs(length(col("suggestion")) - length(col("token"))) <= maxEdits &&
          levenshtein(col("suggestion"), col("token")) <= maxEdits)
      .withColumn("distance",
        levenshtein(col("suggestion"), col("token")).cast("int"))
      .withColumn("rank", row_number().over(w).cast("int"))
      .where(col("rank") <= n)
      .select("query_id", "token", "rank", "suggestion", "distance", "df")
      .orderBy("query_id", "token", "rank")
  }

  /** Solr `spellcheck.collate=true`: per request, the COLLATION — the
    * original analyzed token sequence with every misspelled token
    * replaced by its top-1 [[suggest]] candidate — plus the collation's
    * hit count (Solr's `spellcheck.collateExtendedResults` `hits`: the
    * number of docs the corrected query would match, q.op=OR).
    *
    * Pinned semantics:
    *  - replacement = the rank-1 suggestion under [[suggest]]'s
    *    (distance ASC, df DESC, term ASC) comparator; a token present in
    *    the dictionary keeps itself; a misspelled token with NO candidate
    *    within maxEdits also keeps itself (Solr would omit the collation —
    *    pinned divergence: every request reports one collation row, so
    *    the output spine is the request list);
    *  - tokens keep their original positions — duplicates collate
    *    per-occurrence;
    *  - hits counts the collated query's DISJUNCTIVE match set, i.e. the
    *    re-run Solr performs when maxCollationTries > 0. The collated
    *    tokens are analyzer OUTPUT (`[a-z0-9]+`), so re-running them as a
    *    query is analysis-idempotent.
    *
    * Scale shape: the suggestion pass is [[suggest]]'s one dictionary
    * scan; its top-1 rows are collected — O(Σ|request tokens|), a
    * request-shaped driver boundary like the shard-probe collect — to
    * assemble collation strings, then ONE [[IndexSearch.matchedDocSet]]
    * batch over the corrected queries counts hits distributed. */
  def collate(idx: IndexSearch.OpenIndex, requests: Seq[(Int, String)],
              maxEdits: Int = 2): DataFrame = {
    val spark = idx.spark
    import spark.implicits._
    require(requests.nonEmpty, "collate needs at least one request")
    require(requests.map(_._1).distinct.size == requests.size,
      "collate request ids must be unique")
    // driver boundary: O(|requests| × |tokens|) rank-1 suggestion rows
    val top1 = suggest(idx, requests, n = 1, maxEdits = maxEdits)
      .select("query_id", "token", "suggestion").collect()
      .map(r => (r.getInt(0), r.getString(1)) -> r.getString(2)).toMap
    val collated = requests.map { case (qid, text) =>
      val toks = Analyzer.tokenize(text)
      (qid, toks.map(t => top1.getOrElse((qid, t), t)).mkString(" "))
    }
    val hits = IndexSearch.matchedDocSet(idx, collated)
      .groupBy("query_id").agg(count(lit(1)).as("hits"))
    val spine = collated.toDF("query_id", "collation")
    spine.join(broadcast(hits), Seq("query_id"), "left")
      .select(col("query_id"), col("collation"),
        coalesce(col("hits"), lit(0L)).as("hits"))
      .orderBy("query_id")
  }
}
