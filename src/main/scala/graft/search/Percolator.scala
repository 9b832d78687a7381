package graft.search

import graft.analysis.Analyzer
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PERCOLATOR — reverse search (the Elasticsearch percolate query /
  * Lucene monitor "registered queries" shape): a REGISTRY of named
  * boolean queries is held fixed and every INCOMING document is matched
  * against all of them — the alerting/routing primitive ("which saved
  * searches does this new transcript turn trigger?"). The dual of the
  * normal path: queries are the indexed side, documents are the stream.
  *
  * Query grammar: the term subset of [[Search.parseClauses]] (`+must`,
  * bare SHOULD, `-not`); phrases/wildcards/fielded clauses fail loudly
  * rather than silently degrade. Match rule ≡ the boolean engine's:
  * every must term present, no not term present, and — when the query
  * has no must — at least one should term present; a PURE-NEGATIVE query
  * matches every doc carrying none of its not terms (the
  * [[IndexSearch]] pure-negative rule). Match-only, no scoring (the
  * percolate contract).
  *
  * Scale shape: the registry is broadcast (it is alert-config-sized,
  * never corpus-sized); each doc reduces to its DISTINCT term set
  * map-side; matching is one broadcast join + one (doc, query) hash agg
  * — a single pass over the incoming batch, no corpus-side state.
  * Pure-negative queries cost one broadcast cross of the batch's doc
  * ids against the (tiny) pure-negative name list, anti-joined against
  * their not-hits. */
object Percolator {

  def percolate(corpus: DataFrame,
                registered: Seq[(String, String)]): DataFrame = {
    require(registered.nonEmpty &&
      registered.map(_._1).distinct.size == registered.size,
      "percolator registry needs non-empty, unique query names")
    val spark = corpus.sparkSession
    import spark.implicits._
    val parsed = registered.map { case (name, q) =>
      val c = Search.parseClauses(q)
      require(c.mustPhrases.isEmpty && c.shouldPhrases.isEmpty &&
        c.notPhrases.isEmpty && !c.hasGroups && !c.hasFielded,
        s"percolator '$name': term clauses only " +
          "(phrases/wildcards/fuzzy/fielded are not registrable)")
      require(c.must.nonEmpty || c.should.nonEmpty || c.not.nonEmpty,
        s"percolator '$name': empty query")
      (name, c.must, c.should, c.not)
    }
    val reqs = parsed.map { case (n, m, s, _) => (n, m.size, s.size) }
      .toDF("query_name", "n_must", "n_should")
    val qterms = parsed.flatMap { case (n, m, s, nt) =>
      m.map((n, _, "m")) ++ s.map((n, _, "s")) ++ nt.map((n, _, "n")) }
      .toDF("query_name", "term", "kind")
    val dterms = corpus.select(col("doc_id"),
      explode(array_distinct(Analyzer.tokens(col("text")))).as("term"))
    val hits = dterms.join(broadcast(qterms), "term")
      .groupBy("doc_id", "query_name")
      .agg(count(when(col("kind") === "m", 1)).cast("int").as("must_matched"),
        count(when(col("kind") === "s", 1)).cast("int").as("should_matched"),
        count(when(col("kind") === "n", 1)).cast("int").as("_nm"))
    val positive = hits.join(broadcast(reqs), "query_name")
      .where(col("_nm") === 0 &&
        col("must_matched") === col("n_must") &&
        (col("n_must") > 0 || col("should_matched") >= 1))
      .select("doc_id", "query_name", "must_matched", "should_matched")
    val pureNegNames = parsed.collect {
      case (n, m, s, _) if m.isEmpty && s.isEmpty => n }
    val pureNeg =
      if (pureNegNames.isEmpty) positive.limit(0)
      else corpus.select("doc_id")
        .crossJoin(broadcast(pureNegNames.toDF("query_name")))
        .join(hits.where(col("_nm") > 0).select("doc_id", "query_name"),
          Seq("doc_id", "query_name"), "left_anti")
        .select(col("doc_id"), col("query_name"),
          lit(0).as("must_matched"), lit(0).as("should_matched"))
    positive.unionByName(pureNeg).orderBy("doc_id", "query_name")
  }
}
