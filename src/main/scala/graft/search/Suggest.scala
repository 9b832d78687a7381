package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Solr/Lucene term suggester (suggest-as-you-type): for each request
  * prefix, the top-n dictionary terms ranked by document frequency —
  * Lucene's FreeTextSuggester/TermSuggester weight is corpus frequency;
  * df is the pinned weight here (the dictionary carries exact df).
  *
  * Pinned semantics: prefixes lowercase and alphabet-checked `[a-z0-9]+`
  * (a suggester prefix is a partial TOKEN — it never passes the analyzer,
  * which would strip or split it); ranking (df DESC, term ASC), rank part
  * of the output so truncation order is verified; a prefix matching
  * nothing yields no rows for that request id.
  *
  * Scale shape: one UNION of per-request dictionary probes — each branch
  * carries its own pushed StringStartsWith range predicate into the
  * dictionary parquet scan (same pruning as the prefix-query expansion) —
  * then one request-partitioned rank window. No collect anywhere: the
  * suggestion lists stay distributed, so a million-prefix batch is fine.
  */
object Suggest {

  /** (request_id, prefix) batch → (query_id, rank, term, df). */
  def suggest(idx: IndexSearch.OpenIndex, prefixes: Seq[(Int, String)],
              n: Int = 10): DataFrame = {
    require(n > 0, s"suggest count must be positive (got $n)")
    val spark = idx.spark
    import spark.implicits._
    val reqs = prefixes.map { case (qid, p) => (qid, p.toLowerCase) }
    reqs.foreach { case (_, p) =>
      require(p.matches("[a-z0-9]+"),
        s"suggest prefix '$p' must be a partial token over [a-z0-9]")
    }
    if (reqs.isEmpty)
      return Seq.empty[(Int, Int, String, Long)]
        .toDF("query_id", "rank", "term", "df")
    val branches = reqs.map { case (qid, p) =>
      idx.dictionary.where(col("term").startsWith(p))
        .select(lit(qid).as("query_id"), col("term"), col("df"))
    }
    val w = Window.partitionBy("query_id")
      .orderBy(col("df").desc, col("term").asc)
    branches.reduce(_ unionAll _)
      .withColumn("rank", row_number().over(w).cast("int"))
      .where(col("rank") <= n)
      .select("query_id", "rank", "term", "df")
      .orderBy("query_id", "rank")
  }

  /** Solr TermsComponent (`terms=true&terms.prefix=p&terms.limit=n`,
    * default `terms.sort=index`): raw dictionary enumeration under a
    * prefix in TERM order with exact df — the introspection twin of
    * [[suggest]] (which pins the df-ranked `terms.sort=count` shape).
    * Same pushed-prefix probes, same alphabet check, same
    * rank-in-output truncation contract. */
  def terms(idx: IndexSearch.OpenIndex, prefixes: Seq[(Int, String)],
            n: Int = 10): DataFrame = {
    require(n > 0, s"terms.limit must be positive (got $n)")
    val spark = idx.spark
    import spark.implicits._
    val reqs = prefixes.map { case (qid, p) => (qid, p.toLowerCase) }
    reqs.foreach { case (_, p) =>
      require(p.matches("[a-z0-9]+"),
        s"terms.prefix '$p' must be a partial token over [a-z0-9]")
    }
    if (reqs.isEmpty)
      return Seq.empty[(Int, Int, String, Long)]
        .toDF("query_id", "rank", "term", "df")
    val branches = reqs.map { case (qid, p) =>
      idx.dictionary.where(col("term").startsWith(p))
        .select(lit(qid).as("query_id"), col("term"), col("df"))
    }
    val w = Window.partitionBy("query_id").orderBy(col("term").asc)
    branches.reduce(_ unionAll _)
      .withColumn("rank", row_number().over(w).cast("int"))
      .where(col("rank") <= n)
      .select("query_id", "rank", "term", "df")
      .orderBy("query_id", "rank")
  }

  /** Solr TermsComponent `terms.regex` (with `terms.sort=count`): the
    * dictionary terms matching each request's regex, ranked (df DESC,
    * term ASC), top-n. Patterns are PARTIAL-match on both engines
    * (Spark `rlike` ≡ DuckDB `regexp_matches` — anchor with `^`/`$` for
    * whole-term semantics) and restricted to a portable subset
    * (literals, classes, anchors, `.`/`*`/`+`/`?`/`|`) so the Java and
    * RE2 dialects agree; the alphabet check rejects constructs that
    * diverge (backrefs, lookaround, inline flags).
    *
    * Scale shape: unlike [[terms]]' pushed prefix range, a regex cannot
    * prune the dictionary scan — each branch is one full dictionary pass
    * with the match evaluated in the scan's filter (exactly Lucene's
    * RegexpQuery terms-dictionary walk); branches share the one cached
    * dictionary read, and ranking stays distributed per request. */
  def termsRegex(idx: IndexSearch.OpenIndex, patterns: Seq[(Int, String)],
                 n: Int = 10): DataFrame = {
    require(n > 0, s"terms.limit must be positive (got $n)")
    val spark = idx.spark
    import spark.implicits._
    patterns.foreach { case (_, re) =>
      require(re.nonEmpty && re.matches("""[a-z0-9\[\]\-^$.*+?|()]+"""),
        s"terms.regex '$re' outside the portable subset [a-z0-9[]-^$$.*+?|()]")
      java.util.regex.Pattern.compile(re) // fail loudly, Solr 400s
    }
    if (patterns.isEmpty)
      return Seq.empty[(Int, Int, String, Long)]
        .toDF("query_id", "rank", "term", "df")
    val branches = patterns.map { case (qid, re) =>
      idx.dictionary.where(col("term").rlike(re))
        .select(lit(qid).as("query_id"), col("term"), col("df"))
    }
    val w = Window.partitionBy("query_id")
      .orderBy(col("df").desc, col("term").asc)
    branches.reduce(_ unionAll _)
      .withColumn("rank", row_number().over(w).cast("int"))
      .where(col("rank") <= n)
      .select("query_id", "rank", "term", "df")
      .orderBy("query_id", "rank")
  }
}
