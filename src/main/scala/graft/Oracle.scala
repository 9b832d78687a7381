package graft

import graft.analysis.Analyzer
import graft.sources.Transcripts

/** DuckDB oracle SQL builders — the SQL twin of every Spark query that
  * `SparkEntry.queries` registers. One builder per shape so the Spark and
  * SQL sides can only drift in one place. All SQL references the driver's
  * parquet tables by bare name (`documents`), per the SparkEntry contract.
  *
  * The BM25 expression tree is spelled identically to
  * [[graft.search.Bm25]]: ln(1 + (N - df + 0.5)/(df + 0.5)) * tf /
  * (tf + 1.2*(1 - 0.75 + 0.75*dl/avgdl)); ranking on round(score, 7)
  * DESC, doc_id ASC; reported score rounded to 4 decimals.
  */
object Oracle {

  private def esc(s: String) = s.replace("'", "''")

  def queryValues(queries: Seq[(Int, String)]): String =
    queries.map { case (id, t) => s"($id, '${esc(t)}')" }.mkString(", ")

  /** CTE prelude turning a (doc_id, text) relation into toks/dl/stats/tf/df.
    * `corpusSql` must yield columns (doc_id, text). */
  def indexCtes(corpusSql: String): String =
    s"""corpus AS ($corpusSql),
       |toks AS (SELECT doc_id, unnest(${Analyzer.sqlTokenList("text")}) AS term FROM corpus),
       |dl AS (SELECT doc_id, count(*)::INT AS dl FROM toks GROUP BY doc_id),
       |stats AS (SELECT count(*)::BIGINT AS n_docs, avg(dl) AS avgdl FROM dl),
       |tf AS (SELECT term, doc_id, count(*)::INT AS tf FROM toks GROUP BY term, doc_id),
       |df AS (SELECT term, count(*)::BIGINT AS df, CAST(sum(tf) AS BIGINT) AS cf FROM tf GROUP BY term)""".stripMargin

  val documentsCorpus = "SELECT doc_id, text FROM documents"

  /** Transcripts derived from documents (twin of Transcripts.fromDocuments)
    * with the ingest filter applied, as a CTE body. */
  def transcriptsSql: String =
    s"""SELECT * FROM (${Transcripts.sqlFromDocuments})
       |WHERE text IS NOT NULL AND length(text) > 0""".stripMargin

  /** (doc_id, text) corpus over transcripts: dense doc ids by the stable
    * (conv_id, turn_idx) order — twin of IndexBuild.assignDocIds. */
  def transcriptsCorpus: String =
    s"""SELECT CAST(row_number() OVER (ORDER BY conv_id, turn_idx) - 1 AS BIGINT) AS doc_id, text
       |FROM ($transcriptsSql)""".stripMargin

  /** Corpus over the MERGED transcripts (merge gates q_merge_*): the old
    * index covers docs < 4n/5; the new batch covers docs ≥ 3n/4, with
    * " upserted" appended inside the overlap window [3n/4, 4n/5) — so by
    * upsert-by-key semantics the merged corpus is ALL docs, the overlap
    * window carrying the new text. The tombstoned variant additionally
    * drops doc_id ≡ 0 (mod 97) keys (hits old-only, overlap, and new-only
    * regions). Dense ids re-rank over the surviving rows — exactly what
    * IndexMerge's fresh doc-id stage produces. */
  def mergedTranscriptsCorpus(tombstoned: Boolean): String = {
    val del = if (tombstoned) "WHERE doc_id % 97 <> 0" else ""
    s"""SELECT CAST(row_number() OVER (ORDER BY conv_id, turn_idx) - 1 AS BIGINT) AS doc_id, text
       |FROM (SELECT 'conv' || lpad(CAST(doc_id // 4 AS VARCHAR), 6, '0') AS conv_id,
       |             CAST(doc_id % 4 AS INT) AS turn_idx, text
       |      FROM (SELECT doc_id,
       |              CASE WHEN doc_id >= (SELECT 3*count(*)//4 FROM documents)
       |                    AND doc_id < (SELECT 4*count(*)//5 FROM documents)
       |                   THEN text || ' upserted' ELSE text END AS text
       |            FROM documents $del)
       |      WHERE text IS NOT NULL AND length(text) > 0)""".stripMargin
  }

  /** Denormalized scoring relation (term, doc_id, tf, dl) — the oracle for
    * posting-assembly round-trips (E5 aggregate path, salted stream path). */
  def termTfDl(corpusSql: String): String =
    s"""WITH ${indexCtes(corpusSql)}
       |SELECT term, tf.doc_id AS doc_id, tf, dl FROM tf
       |JOIN dl ON tf.doc_id = dl.doc_id ORDER BY term, doc_id""".stripMargin

  def docDl(corpusSql: String): String =
    s"WITH ${indexCtes(corpusSql)} SELECT doc_id, dl FROM dl ORDER BY doc_id"

  def termTf(corpusSql: String): String =
    s"WITH ${indexCtes(corpusSql)} SELECT term, doc_id, tf FROM tf ORDER BY term, doc_id"

  def dictionary(corpusSql: String): String =
    s"WITH ${indexCtes(corpusSql)} SELECT term, df, cf FROM df ORDER BY term"

  def collectionStats(corpusSql: String): String =
    s"""WITH ${indexCtes(corpusSql)}
       |SELECT n_docs, CAST((SELECT sum(dl) FROM dl) AS BIGINT) AS total_tokens,
       |       round(avgdl, 6) AS avgdl
       |FROM stats""".stripMargin

  def docIdsTranscripts: String =
    s"""SELECT CAST(row_number() OVER (ORDER BY conv_id, turn_idx) - 1 AS BIGINT) AS doc_id,
       |       conv_id, turn_idx, role, tool, ${Analyzer.sqlDocLen("text")} AS dl
       |FROM ($transcriptsSql)
       |ORDER BY doc_id""".stripMargin

  /** BM25 top-k over the transcripts corpus, results identified by the
    * stable (conv_id, turn_idx) KEY instead of the dense doc_id — the twin
    * of [[graft.index.SegmentedIndex.search]], whose segment-local ids
    * never escape. Ranking is unchanged: dense ids are assigned in key
    * order, so (round(score,7) DESC, doc_id ASC) ≡ (…, conv_id, turn_idx
    * ASC). Disjunctive only. */
  def bm25TopKKeys(queries: Seq[(Int, String)], k: Int): String =
    s"""WITH ${indexCtes(transcriptsCorpus)},
       |keymap AS (SELECT CAST(row_number() OVER (ORDER BY conv_id, turn_idx) - 1 AS BIGINT) AS doc_id,
       |                  conv_id, turn_idx
       |           FROM ($transcriptsSql)),
       |queries(query_id, qtext) AS (VALUES ${queryValues(queries)}),
       |qt AS (SELECT DISTINCT query_id, term FROM
       |        (SELECT query_id, unnest(${Analyzer.sqlTokenList("qtext")}) AS term FROM queries)),
       |scored AS (
       |  SELECT qt.query_id, tf.doc_id,
       |         sum( ln(1 + (s.n_docs - df.df + 0.5)/(df.df + 0.5))
       |              * tf.tf / (tf.tf + 1.2*(1 - 0.75 + 0.75*dl.dl/s.avgdl)) ) AS score
       |  FROM qt JOIN tf USING (term) JOIN df USING (term)
       |       JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN stats s
       |  GROUP BY qt.query_id, tf.doc_id),
       |ranked AS (
       |  SELECT query_id, doc_id, score,
       |         row_number() OVER (PARTITION BY query_id
       |                            ORDER BY round(score, 7) DESC, doc_id ASC) AS rnk
       |  FROM scored)
       |SELECT query_id, CAST(rnk AS INT) AS "rank", conv_id, turn_idx, round(score, 4) AS score
       |FROM ranked JOIN keymap USING (doc_id) WHERE rnk <= $k
       |ORDER BY query_id, rnk""".stripMargin

  /** Transcripts corpus carrying the role attribute (fq/facet twins). */
  def transcriptsCorpusAttrs: String =
    s"""SELECT CAST(row_number() OVER (ORDER BY conv_id, turn_idx) - 1 AS BIGINT) AS doc_id, text, role
       |FROM ($transcriptsSql)""".stripMargin

  /** Twin of Search.searchCorpusFiltered — Solr fq semantics: scores/df/
    * avgdl from the FULL corpus; the predicate filters before ranking. */
  def bm25TopKFiltered(queries: Seq[(Int, String)], k: Int,
                       filterSql: String): String =
    s"""WITH ${indexCtes(transcriptsCorpusAttrs)},
       |queries(query_id, qtext) AS (VALUES ${queryValues(queries)}),
       |qt AS (SELECT DISTINCT query_id, term FROM
       |        (SELECT query_id, unnest(${Analyzer.sqlTokenList("qtext")}) AS term FROM queries)),
       |scored AS (
       |  SELECT qt.query_id, tf.doc_id,
       |         sum( ln(1 + (s.n_docs - df.df + 0.5)/(df.df + 0.5))
       |              * tf.tf / (tf.tf + 1.2*(1 - 0.75 + 0.75*dl.dl/s.avgdl)) ) AS score
       |  FROM qt JOIN tf USING (term) JOIN df USING (term)
       |       JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN stats s
       |  GROUP BY qt.query_id, tf.doc_id),
       |ranked AS (
       |  SELECT query_id, scored.doc_id AS doc_id, score,
       |         row_number() OVER (PARTITION BY query_id
       |                            ORDER BY round(score, 7) DESC, scored.doc_id ASC) AS rnk
       |  FROM scored JOIN corpus ON scored.doc_id = corpus.doc_id
       |  WHERE $filterSql)
       |SELECT query_id, CAST(rnk AS INT) AS "rank", doc_id, round(score, 4) AS score
       |FROM ranked WHERE rnk <= $k
       |ORDER BY query_id, rnk""".stripMargin

  /** Twin of Search.facetCounts (Solr facet.field on the match set). */
  def facetCounts(queries: Seq[(Int, String)], facetCol: String): String =
    s"""WITH ${indexCtes(transcriptsCorpusAttrs)},
       |queries(query_id, qtext) AS (VALUES ${queryValues(queries)}),
       |qt AS (SELECT DISTINCT query_id, term FROM
       |        (SELECT query_id, unnest(${Analyzer.sqlTokenList("qtext")}) AS term FROM queries)),
       |matched AS (SELECT DISTINCT qt.query_id, tf.doc_id
       |  FROM qt JOIN tf USING (term))
       |SELECT query_id, $facetCol, count(*)::BIGINT AS n_docs
       |FROM matched JOIN corpus USING (doc_id)
       |GROUP BY query_id, $facetCol ORDER BY query_id, $facetCol""".stripMargin

  /** Twin of the boolean clause grammar ([[graft.search.Search.searchCorpusClauses]]
    * / [[graft.search.IndexSearch.searchClauses]]); clause lists come from
    * the SAME driver-side parser. The must-count per query is computed
    * driver-side INCLUDING out-of-vocabulary must terms, so an OOV must
    * eliminates the query in both engines. */
  def bm25TopKClauses(corpusSql: String, queries: Seq[(Int, String)],
                      k: Int): String = {
    val parsed = queries.map { case (id, t) =>
      (id, graft.search.Search.parseClauses(t))
    }
    val qtValues0 = parsed.flatMap { case (id, c) =>
      c.must.map(t => s"($id, '${esc(t)}', TRUE)") ++
        c.should.map(t => s"($id, '${esc(t)}', FALSE)")
    }
    // guard the VALUES list: an all-pure-negative query set has no
    // must/should terms anywhere, and `VALUES ()` is a parse error — a
    // never-matching row keeps the CTE well-formed and the result empty
    val qtValues =
      if (qtValues0.nonEmpty) qtValues0
      else Seq("(0, '', FALSE)")
    val nMustValues = parsed.map { case (id, c) => s"($id, ${c.must.size})" }
    val negValues = parsed.flatMap { case (id, c) =>
      c.not.map(t => s"($id, '${esc(t)}')")
    }
    val negCte =
      if (negValues.isEmpty) "negs(query_id, term) AS (SELECT 0, '' WHERE 1 = 0)"
      else s"negs(query_id, term) AS (VALUES ${negValues.mkString(", ")})"
    s"""WITH ${indexCtes(corpusSql)},
       |qt(query_id, term, is_must) AS (VALUES ${qtValues.mkString(", ")}),
       |nmust(query_id, n_must) AS (VALUES ${nMustValues.mkString(", ")}),
       |$negCte,
       |scored AS (
       |  SELECT qt.query_id, tf.doc_id,
       |         sum( ln(1 + (s.n_docs - df.df + 0.5)/(df.df + 0.5))
       |              * tf.tf / (tf.tf + 1.2*(1 - 0.75 + 0.75*dl.dl/s.avgdl)) ) AS score,
       |         count(CASE WHEN is_must THEN 1 END)::BIGINT AS must_matched
       |  FROM qt JOIN tf USING (term) JOIN df USING (term)
       |       JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN stats s
       |  GROUP BY qt.query_id, tf.doc_id),
       |ranked AS (
       |  SELECT query_id, doc_id, score,
       |         row_number() OVER (PARTITION BY query_id
       |                            ORDER BY round(score, 7) DESC, doc_id ASC) AS rnk
       |  FROM scored JOIN nmust USING (query_id)
       |  WHERE must_matched = n_must
       |    AND NOT EXISTS (
       |      SELECT 1 FROM negs JOIN tf USING (term)
       |      WHERE negs.query_id = scored.query_id AND tf.doc_id = scored.doc_id))
       |SELECT query_id, CAST(rnk AS INT) AS "rank", doc_id, round(score, 4) AS score
       |FROM ranked WHERE rnk <= $k
       |ORDER BY query_id, rnk""".stripMargin
  }

  /** Twin of [[graft.search.IndexSearch.searchPhrase]] (Lucene PhraseQuery
    * scoring: idf = Σ per-term idfs with duplicates counted, tf = exact
    * phrase frequency). Token positions come from DuckDB's aligned
    * parallel unnest (list + range of equal length); 1-based vs Spark's
    * 0-based is irrelevant — only consecutive offsets matter. A phrase
    * with an out-of-vocabulary term self-eliminates (its pf self-join
    * matches nothing). */
  def bm25Phrase(corpusSql: String, phrases: Seq[(Int, String)],
                 k: Int, slop: Int = 0): String = {
    val parsed = phrases
      .map { case (id, t) => (id, Analyzer.tokenize(t)) }
      .filter(_._2.nonEmpty)
    require(parsed.nonEmpty, "no non-empty phrases")
    // ordered-window join chain: p_i > p_{i-1} and p_i ≤ p0 + i + slop
    // (the per-level bound is implied by the final one plus ordering);
    // DISTINCT start positions because slop > 0 admits multiple
    // completions per start. At slop = 0 the window pins p_i = p0 + i,
    // the exact-adjacency case, and DISTINCT is a no-op.
    val pfSelects = parsed.map { case (id, terms) =>
      val joins = (1 until terms.size).map { i =>
        s"JOIN ptoks p$i ON p$i.doc_id = p0.doc_id " +
          s"AND p$i.pos > p${i - 1}.pos AND p$i.pos <= p0.pos + ${i + slop} " +
          s"AND p$i.term = '${esc(terms(i))}'"
      }.mkString(" ")
      s"""SELECT $id AS query_id, p0.doc_id AS doc_id,
         |    count(DISTINCT p0.pos)::INT AS pf
         |  FROM ptoks p0 $joins
         |  WHERE p0.term = '${esc(terms.head)}'
         |  GROUP BY p0.doc_id""".stripMargin
    }
    val ptermValues = parsed.flatMap { case (id, ts) =>
      ts.zipWithIndex.map { case (t, i) => s"($id, $i, '${esc(t)}')" }
    }
    s"""WITH ${indexCtes(corpusSql)},
       |toksl AS (SELECT doc_id, ${Analyzer.sqlTokenList("text")} AS l FROM corpus),
       |ptoks AS (SELECT doc_id, unnest(l) AS term, unnest(range(1, len(l)+1)) AS pos FROM toksl),
       |pterms(query_id, slot, term) AS (VALUES ${ptermValues.mkString(", ")}),
       |idfs AS (SELECT query_id, sum(ln(1 + (s.n_docs - df.df + 0.5)/(df.df + 0.5))) AS idf_sum
       |         FROM pterms JOIN df USING (term) CROSS JOIN stats s GROUP BY query_id),
       |pf AS (${pfSelects.mkString("\nUNION ALL\n")}),
       |scored AS (
       |  SELECT pf.query_id, pf.doc_id,
       |         idfs.idf_sum * pf.pf / (pf.pf + 1.2*(1 - 0.75 + 0.75*dl.dl/s.avgdl)) AS score
       |  FROM pf JOIN dl ON pf.doc_id = dl.doc_id
       |       JOIN idfs USING (query_id) CROSS JOIN stats s),
       |ranked AS (
       |  SELECT query_id, doc_id, score,
       |         row_number() OVER (PARTITION BY query_id
       |                            ORDER BY round(score, 7) DESC, doc_id ASC) AS rnk
       |  FROM scored)
       |SELECT query_id, CAST(rnk AS INT) AS "rank", doc_id, round(score, 4) AS score
       |FROM ranked WHERE rnk <= $k
       |ORDER BY query_id, rnk""".stripMargin
  }

  /** Full BM25 top-k oracle. */
  def bm25TopK(corpusSql: String, queries: Seq[(Int, String)], k: Int,
               conjunctive: Boolean): String = {
    val conjJoin =
      if (conjunctive) "JOIN nq USING (query_id) WHERE n_matched = n_q" else ""
    s"""WITH ${indexCtes(corpusSql)},
       |queries(query_id, qtext) AS (VALUES ${queryValues(queries)}),
       |qt AS (SELECT DISTINCT query_id, term FROM
       |        (SELECT query_id, unnest(${Analyzer.sqlTokenList("qtext")}) AS term FROM queries)),
       |nq AS (SELECT query_id, count(*)::BIGINT AS n_q FROM qt GROUP BY query_id),
       |scored AS (
       |  SELECT qt.query_id, tf.doc_id,
       |         sum( ln(1 + (s.n_docs - df.df + 0.5)/(df.df + 0.5))
       |              * tf.tf / (tf.tf + 1.2*(1 - 0.75 + 0.75*dl.dl/s.avgdl)) ) AS score,
       |         count(*)::BIGINT AS n_matched
       |  FROM qt JOIN tf USING (term) JOIN df USING (term)
       |       JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN stats s
       |  GROUP BY qt.query_id, tf.doc_id),
       |ranked AS (
       |  SELECT query_id, doc_id, score,
       |         row_number() OVER (PARTITION BY query_id
       |                            ORDER BY round(score, 7) DESC, doc_id ASC) AS rnk
       |  FROM scored $conjJoin)
       |SELECT query_id, CAST(rnk AS INT) AS "rank", doc_id, round(score, 4) AS score
       |FROM ranked WHERE rnk <= $k
       |ORDER BY query_id, rnk""".stripMargin
  }
}
