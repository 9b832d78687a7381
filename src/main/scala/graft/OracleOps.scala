package graft

import graft.analysis.Analyzer
import graft.ops.{Dedup, TextOps}

/** DuckDB twins for the training-data pipeline operators
  * ([[graft.ops.TextOps]], [[graft.ops.Dedup]], [[graft.ops.Similarity]]).
  * Hash primitives are md5-derived in both engines; verified equivalences:
  * Spark conv(substr(md5(x),1,n),16,10)::long ≡ DuckDB
  * ('0x'||substr(md5(x),1,n))::BIGINT.
  */
object OracleOps {

  private def toks = Analyzer.sqlTokenList("text")
  private def lst(ws: Seq[String]) = ws.map(w => s"'$w'").mkString("[", ", ", "]")

  val corpusCte = s"corpus AS (SELECT doc_id, text FROM documents)"
  val tkCte = s"tk AS (SELECT doc_id, text, $toks AS toks FROM corpus)"

  /** Twin of [[graft.ops.TextOps.trainShards]] — identical 2^31 modular
    * Knuth-hash key, shard mod, and within-shard windows. */
  def trainShards(nShards: Int, seed: Long): String =
    s"""WITH $corpusCte,
       |keyed AS (SELECT doc_id, CAST(len($toks) AS INT) AS n_tokens,
       |                 ((doc_id % 2147483648) * 2654435761 + $seed) % 2147483648 AS key
       |          FROM corpus),
       |sharded AS (SELECT doc_id, n_tokens, key,
       |                   CAST(key % $nShards AS INT) AS shard
       |            FROM keyed)
       |SELECT doc_id, shard,
       |       CAST(row_number() OVER w AS INT) AS pos,
       |       n_tokens,
       |       CAST(COALESCE(SUM(n_tokens) OVER
       |         (PARTITION BY shard ORDER BY key, doc_id
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tok_offset
       |FROM sharded
       |WINDOW w AS (PARTITION BY shard ORDER BY key, doc_id)
       |ORDER BY shard, pos""".stripMargin

  def hitsExpr(markers: Seq[String]): String =
    s"CAST(len(list_filter(toks, t -> list_contains(${lst(markers)}, t))) AS INT)"

  def langId: String = {
    val hits = TextOps.LangMarkers
      .map { case (l, m) => s"${hitsExpr(m)} AS ${l}_hits" }.mkString(",\n  ")
    s"""WITH $corpusCte, $tkCte,
       |hits AS (SELECT doc_id,
       |  $hits
       |FROM tk)
       |SELECT doc_id, en_hits, es_hits, de_hits, fr_hits,
       |  CASE WHEN en_hits >= es_hits AND en_hits >= de_hits AND en_hits >= fr_hits AND en_hits > 0 THEN 'en'
       |       WHEN es_hits >= de_hits AND es_hits >= fr_hits AND es_hits > 0 THEN 'es'
       |       WHEN de_hits >= fr_hits AND de_hits > 0 THEN 'de'
       |       WHEN fr_hits > 0 THEN 'fr'
       |       ELSE 'und' END AS lang_pred
       |FROM hits ORDER BY doc_id""".stripMargin
  }

  def quality: String = {
    val en = TextOps.LangMarkers.head._2
    s"""WITH $corpusCte, $tkCte,
       |base AS (SELECT doc_id,
       |  CAST(length(text) AS BIGINT) AS n_chars,
       |  CAST(len(toks) AS INT) AS n_tokens,
       |  CASE WHEN len(toks) > 0
       |    THEN CAST(list_reduce(list_transform(toks, t -> length(t)), (a, b) -> a + b) AS DOUBLE) / len(toks)
       |    ELSE 0.0 END AS avg_raw,
       |  CASE WHEN len(toks) > 0
       |    THEN CAST(${hitsExpr(en)} AS DOUBLE) / len(toks)
       |    ELSE 0.0 END AS stop_raw,
       |  CASE WHEN length(text) > 0
       |    THEN CAST(length(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS DOUBLE) / length(text)
       |    ELSE 0.0 END AS alnum_raw
       |FROM tk)
       |SELECT doc_id, n_chars, n_tokens,
       |  round(avg_raw, 4) AS avg_token_len,
       |  round(stop_raw, 4) AS stopword_ratio,
       |  round(alnum_raw, 4) AS alnum_ratio,
       |  round(least(n_tokens / 100.0, 1.0) * 0.5 + alnum_raw * 0.3 +
       |        least(stop_raw * 5.0, 1.0) * 0.2, 4) AS quality_score
       |FROM base ORDER BY doc_id""".stripMargin
  }

  def tokenCounts: String =
    s"""WITH $corpusCte
       |SELECT doc_id,
       |  CAST(len(list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '')) AS INT) AS ws_tokens,
       |  ${Analyzer.sqlDocLen("text")} AS analyzer_tokens,
       |  CAST(len(regexp_extract_all(lower(text), '${TextOps.BpeRegex}')) AS INT) AS bpe_units
       |FROM corpus ORDER BY doc_id""".stripMargin

  /** Twin of [[graft.ops.TextOps.chunks]]: starts at every multiple of
    * `stride` below the token count (range is end-exclusive ≡ the
    * engine's 0..nStarts−1 sequence), 1-based inclusive list_slice ≡
    * Spark's 1-based slice(start, length), trailing short windows kept. */
  def chunks(chunkSize: Int, stride: Int): String =
    s"""WITH $corpusCte, $tkCte,
       |st AS (SELECT doc_id, toks,
       |         unnest(range(0, ((len(toks) - 1) // $stride) + 1)) AS i
       |       FROM tk WHERE len(toks) > 0)
       |SELECT doc_id, CAST(i AS INT) AS chunk_idx,
       |  CAST(len(toks[i * $stride + 1 : i * $stride + $chunkSize]) AS INT)
       |    AS n_chunk_tokens,
       |  array_to_string(toks[i * $stride + 1 : i * $stride + $chunkSize], ' ')
       |    AS chunk_text
       |FROM st ORDER BY doc_id, chunk_idx""".stripMargin

  /** DuckDB n-gram list over `toks` — twin of TextOps.ngramList (1-based
    * inclusive slices, < n tokens ⇒ empty list). */
  private def gramsExpr(n: Int): String =
    s"""CASE WHEN len(toks) >= $n
       |  THEN list_transform(range(1, len(toks) - ${n - 1} + 1),
       |                      i -> array_to_string(toks[i:i+${n - 1}], ' '))
       |  ELSE CAST([] AS VARCHAR[]) END""".stripMargin

  /** Twin of [[graft.ops.TextOps.classifierScore]] — identical md5
    * bucket, identical integer milli-weight derivation, identical
    * mean + 6dp round; empty-feature docs coalesce to (0, 0, NULL,
    * false) in both engines. */
  def classifierScore(buckets: Int, seed: Long, threshold: Double): String =
    s"""WITH tk2 AS (SELECT doc_id, $toks AS toks FROM documents),
       |g AS (SELECT doc_id, unnest(list_concat(toks, ${gramsExpr(2)})) AS gram
       |      FROM tk2),
       |gw AS (SELECT doc_id,
       |         ((('0x' || substr(md5(gram), 1, 8))::BIGINT % $buckets)
       |            * 2654435761 + $seed) % 2001 - 1000 AS w
       |       FROM g),
       |sc AS (SELECT doc_id, count(*)::INT AS n_feats,
       |              sum(w)::BIGINT AS lm
       |       FROM gw GROUP BY 1)
       |SELECT d.doc_id,
       |       coalesce(n_feats, 0) AS n_feats,
       |       coalesce(lm, 0) AS logit_milli,
       |       CASE WHEN coalesce(n_feats, 0) > 0
       |            THEN round(lm / (1000.0 * n_feats), 6) END AS score,
       |       (coalesce(n_feats, 0) > 0 AND
       |        round(lm / (1000.0 * n_feats), 6) >= $threshold) AS keep
       |FROM documents d LEFT JOIN sc USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin

  /** Twin of [[graft.ops.TextOps.decontaminate]] with the gate's
    * benchmark set = docs with doc_id ≡ 0 (mod `benchMod`). */
  def decontaminate(n: Int, benchMod: Int): String =
    s"""WITH $corpusCte, $tkCte,
       |g AS (SELECT doc_id, ${gramsExpr(n)} AS grams FROM tk),
       |bg AS (SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id % $benchMod = 0),
       |dg AS (SELECT DISTINCT doc_id, unnest(grams) AS gram FROM g),
       |hits AS (SELECT doc_id, count(*)::BIGINT AS n_gram_hits
       |         FROM dg JOIN bg USING (gram) GROUP BY 1)
       |SELECT c.doc_id,
       |       CAST(coalesce(h.n_gram_hits, 0) AS BIGINT) AS n_gram_hits,
       |       coalesce(h.n_gram_hits, 0) > 0 AS contaminated
       |FROM corpus c LEFT JOIN hits h USING (doc_id)
       |ORDER BY doc_id""".stripMargin

  /** Twin of [[graft.ops.TextOps.gopherRules]] — whitespace words over
    * the lowercased text, exact-integer ratios (no libm anywhere), the
    * paper's own stop list. */
  def gopherRules(minWords: Int, maxWords: Int): String = {
    val stops = lst(TextOps.GopherStops)
    s"""WITH w AS (SELECT doc_id,
       |    list_filter(string_split_regex(trim(lower(text)), '\\s+'), x -> x <> '') AS w,
       |    CAST(len(regexp_extract_all(lower(text), '#|\\.\\.\\.')) AS INT) AS sym
       |  FROM documents),
       |base AS (SELECT doc_id, CAST(len(w) AS INT) AS n_words,
       |  CASE WHEN len(w) > 0 THEN
       |    CAST(list_reduce(list_transform(w, x -> length(x)), (a, b) -> a + b) AS DOUBLE) / len(w)
       |  END AS mwl,
       |  CASE WHEN len(w) > 0 THEN
       |    CAST(len(list_filter(w, x -> regexp_matches(x, '[a-z]'))) AS DOUBLE) / len(w)
       |  END AS alpha,
       |  CASE WHEN len(w) > 0 THEN CAST(sym AS DOUBLE) / len(w) END AS symr,
       |  CAST(len(list_intersect(list_distinct(w), $stops)) AS INT) AS stop_distinct
       |  FROM w)
       |SELECT doc_id, n_words,
       |  round(mwl, 4) AS mean_word_len,
       |  round(alpha, 4) AS alpha_ratio,
       |  round(symr, 4) AS symbol_ratio,
       |  stop_distinct,
       |  (n_words >= $minWords AND n_words <= $maxWords) AS r_words,
       |  coalesce(mwl >= 3.0 AND mwl <= 10.0, false) AS r_wordlen,
       |  coalesce(alpha >= 0.8, false) AS r_alpha,
       |  coalesce(symr < 0.1, false) AS r_symbol,
       |  (stop_distinct >= 2) AS r_stop,
       |  ((n_words >= $minWords AND n_words <= $maxWords)
       |    AND coalesce(mwl >= 3.0 AND mwl <= 10.0, false)
       |    AND coalesce(alpha >= 0.8, false)
       |    AND coalesce(symr < 0.1, false)
       |    AND stop_distinct >= 2) AS keep
       |FROM base ORDER BY doc_id""".stripMargin
  }

  /** Twin of [[graft.ops.TextOps.dsirWeights]] — hashed-bigram
    * likelihood-ratio importance weights, target = `lang = trainLang`
    * docs vs the raw corpus; same md5 bucket primitive, ln drift
    * absorbed by the 6dp round, keep compares the ROUNDED value. */
  def dsirWeights(trainLang: String, buckets: Int, alpha: Double,
                  threshold: Double): String =
    s"""WITH tk2 AS (SELECT doc_id, lang, $toks AS toks FROM documents),
       |g AS (SELECT doc_id, (lang = '$trainLang') AS tgt,
       |        unnest(${gramsExpr(2)}) AS gram FROM tk2),
       |gb AS (SELECT doc_id, tgt,
       |         ('0x' || substr(md5(gram), 1, 8))::BIGINT % $buckets AS bucket
       |       FROM g),
       |st AS (SELECT bucket,
       |         sum(CASE WHEN tgt THEN 1 ELSE 0 END)::BIGINT AS ct,
       |         count(*)::BIGINT AS cr
       |       FROM gb GROUP BY 1),
       |tot AS (SELECT CAST(coalesce(sum(ct), 0) AS DOUBLE) + $alpha * $buckets AS dent,
       |               CAST(coalesce(sum(cr), 0) AS DOUBLE) + $alpha * $buckets AS denr
       |        FROM st),
       |lr AS (SELECT bucket, ln((ct + $alpha) / dent) - ln((cr + $alpha) / denr) AS lr
       |       FROM st CROSS JOIN tot),
       |sc AS (SELECT doc_id, sum(lr) AS lw, count(*)::INT AS n_grams
       |       FROM gb JOIN lr USING (bucket) GROUP BY 1)
       |SELECT d.doc_id, coalesce(n_grams, 0) AS n_grams,
       |       round(lw, 6) AS log_w,
       |       (lw IS NOT NULL AND round(lw, 6) >= $threshold) AS keep
       |FROM documents d LEFT JOIN sc USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin

  /** Twin of [[graft.ops.TextOps.lrQuality]] — full-batch logistic
    * regression unrolled as one CTE chain per iteration (the k-means
    * unrolled-oracle idiom): w0 ≡ 0 folds iteration 1's p into the 0.5
    * constant; every weight update rounds to 1e-9 exactly like the
    * engine's driver-side update, so unordered FP sums cannot fork the
    * trajectory. */
  def lrQuality(trainLang: String, buckets: Int, iters: Int,
                lr: Double): String = {
    val n = "(SELECT n FROM nn)"
    val head =
      s"""WITH tk AS (SELECT doc_id, CAST(lang = '$trainLang' AS INT) AS y, $toks AS l FROM documents),
         |nn AS (SELECT count(*) AS n FROM documents),
         |x AS (SELECT doc_id, y,
         |        ('0x' || substr(md5(tok), 1, 8))::BIGINT % $buckets AS bucket,
         |        CAST(count(*) AS DOUBLE) / any_value(ntok) AS x
         |      FROM (SELECT doc_id, y, len(l) AS ntok, unnest(l) AS tok FROM tk)
         |      GROUP BY doc_id, y, bucket)""".stripMargin
    val iterCtes = (1 to iters).map { t =>
      val grad =
        if (t == 1) s"sum((0.5 - y) * x) / $n"
        else s"sum((p${t - 1}.p - x.y) * x.x) / $n"
      val prev = if (t == 1) "0" else s"any_value(w${t - 1}.w)"
      val joins =
        if (t == 1) "x"
        else s"x JOIN p${t - 1} USING (doc_id) JOIN w${t - 1} ON w${t - 1}.bucket = x.bucket"
      val wCte =
        s"""w$t AS (SELECT x.bucket AS bucket, round($prev - $lr * $grad, 9) AS w
           |        FROM $joins GROUP BY x.bucket)""".stripMargin
      val pCte =
        s"""p$t AS (SELECT doc_id, y, 1/(1 + exp(-sum(w$t.w * x.x))) AS p
           |        FROM x JOIN w$t ON w$t.bucket = x.bucket GROUP BY doc_id, y)""".stripMargin
      s"$wCte,\n$pCte"
    }.mkString(",\n")
    s"""$head,
       |$iterCtes
       |SELECT d.doc_id,
       |       CAST(d.lang = '$trainLang' AS INT) AS y,
       |       round(coalesce(p$iters.p, 0.5), 6) AS p,
       |       CAST(round(coalesce(p$iters.p, 0.5), 6) >= 0.5 AS INT) AS pred
       |FROM documents d LEFT JOIN p$iters ON p$iters.doc_id = d.doc_id
       |ORDER BY d.doc_id""".stripMargin
  }

  /** Twin of [[graft.ops.TextOps.lmPerplexity]] — unigram add-α LM
    * trained on the `lang = trainLang` subset of documents, scoring all
    * docs; ln on both engines is ≤1-ulp libm, absorbed by the 6dp round
    * (the BM25-idf contract). The keep flag compares the ROUNDED value. */
  def lmPerplexity(trainLang: String, alpha: Double, threshold: Double): String =
    s"""WITH toks AS (SELECT doc_id, lang, unnest($toks) AS term
       |               FROM documents),
       |cnt AS (SELECT term, count(*)::BIGINT AS c FROM toks
       |        WHERE lang = '$trainLang' GROUP BY 1),
       |tot AS (SELECT CAST(coalesce(sum(c), 0) AS DOUBLE)
       |               + $alpha * (count(*) + 1) AS denom
       |        FROM cnt),
       |sc AS (SELECT t.doc_id,
       |         -sum(ln((coalesce(c, 0) + $alpha) / denom)) / count(*) AS lppl,
       |         count(*)::INT AS n_tokens
       |       FROM toks t LEFT JOIN cnt USING (term) CROSS JOIN tot
       |       GROUP BY t.doc_id)
       |SELECT d.doc_id, coalesce(n_tokens, 0) AS n_tokens,
       |       round(lppl, 6) AS log_ppl,
       |       (lppl IS NOT NULL AND round(lppl, 6) <= $threshold) AS keep
       |FROM documents d LEFT JOIN sc USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin

  /** Twin of [[graft.ops.TextOps.temperatureSample]] over the transcripts
    * corpus stratified by `strataCol` (dense doc ids by the stable key
    * order, as everywhere). */
  def temperatureSample(strataCol: String, alpha: Double): String =
    s"""WITH t AS (${Oracle.transcriptsSql}),
       |c AS (SELECT $strataCol, count(*)::BIGINT AS c FROM t GROUP BY 1),
       |m AS (SELECT min(c) AS mc FROM c),
       |r AS (SELECT $strataCol,
       |        CAST(floor(1000.0 * pow(CAST(mc AS DOUBLE) / c, ${1.0 - alpha})
       |                   + 1e-9) AS INT) AS rate_permille
       |      FROM c CROSS JOIN m),
       |d AS (SELECT CAST(row_number() OVER (ORDER BY conv_id, turn_idx) - 1
       |               AS BIGINT) AS doc_id, $strataCol
       |      FROM t)
       |SELECT d.doc_id, d.$strataCol, r.rate_permille
       |FROM d JOIN r USING ($strataCol)
       |WHERE ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT % 1000
       |        < rate_permille
       |ORDER BY d.doc_id""".stripMargin

  /** Twin of [[graft.ops.TextOps.lineDedup]] over a corpus with the
    * gate's deterministic duplicate-span injection (docs ≡ 0 mod
    * `injectMod` share one pinned 10-token leading span). rnk=1 over
    * (doc_id, span_idx) ≡ the engine's min-struct winner — (doc_id,
    * span_idx) is unique so the orders agree. */
  def lineDedup(n: Int, injectMod: Int, injectText: String): String =
    s"""WITH corpus AS (
       |  SELECT doc_id, CASE WHEN doc_id % $injectMod = 0
       |           THEN '$injectText ' || text ELSE text END AS text
       |  FROM documents),
       |$tkCte,
       |sp AS (SELECT doc_id, CAST(i AS INT) AS span_idx,
       |         array_to_string(toks[i*$n + 1 : i*$n + $n], ' ') AS span
       |       FROM (SELECT doc_id, toks,
       |               unnest(range(0, ((len(toks) - 1) // $n) + 1)) AS i
       |             FROM tk WHERE len(toks) > 0)),
       |rk AS (SELECT *, row_number() OVER (PARTITION BY span
       |                                    ORDER BY doc_id, span_idx) AS rnk
       |       FROM sp),
       |a AS (SELECT doc_id, count(*)::INT AS n_spans FROM sp GROUP BY doc_id),
       |b AS (SELECT doc_id, count(*)::INT AS n_kept,
       |             string_agg(span, ' ' ORDER BY span_idx) AS text
       |      FROM rk WHERE rnk = 1 GROUP BY doc_id)
       |SELECT a.doc_id, a.n_spans,
       |       CAST(coalesce(b.n_kept, 0) AS INT) AS n_kept,
       |       coalesce(b.text, '') AS text
       |FROM a LEFT JOIN b USING (doc_id)
       |ORDER BY a.doc_id""".stripMargin

  /** Twin of [[graft.ops.TextOps.substringSpans]] — identical md5 window
    * key, ≥ 2-occurrences rule, and p′ − p ≤ k island merge (NULL lag
    * falls to the new-island branch in both engines). */
  def substringSpans(k: Int, injectMod: Int, injectText: String): String =
    s"""WITH corpus AS (
       |  SELECT doc_id, CASE WHEN doc_id % $injectMod = 0
       |           THEN '$injectText ' || text ELSE text END AS text
       |  FROM documents),
       |$tkCte,
       |g AS (SELECT doc_id, CAST(i - 1 AS INT) AS pos,
       |             md5(array_to_string(toks[i:i+${k - 1}], ' ')) AS gh
       |      FROM (SELECT doc_id, toks,
       |              unnest(range(1, len(toks) - $k + 2)) AS i
       |            FROM tk WHERE len(toks) >= $k)),
       |d AS (SELECT gh FROM g GROUP BY gh HAVING count(*) >= 2),
       |m AS (SELECT doc_id, pos FROM g WHERE gh IN (SELECT gh FROM d)),
       |b AS (SELECT doc_id, pos,
       |        CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
       |               <= $k THEN 0 ELSE 1 END AS brk
       |      FROM m),
       |s AS (SELECT doc_id, pos,
       |        sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS gid
       |      FROM b)
       |SELECT doc_id, CAST(min(pos) AS INT) AS span_start,
       |       CAST(max(pos) + ${k - 1} AS INT) AS span_end,
       |       CAST(max(pos) - min(pos) + $k AS INT) AS span_tokens,
       |       CAST(count(*) AS INT) AS n_windows
       |FROM s GROUP BY doc_id, gid
       |ORDER BY doc_id, span_start""".stripMargin

  /** Twin of [[graft.ops.TextOps.repetition]] (Gopher duplicate-n-gram
    * fraction; dup_frac rounded from the RAW ratio in both engines). */
  def repetition(n: Int, maxDupFrac: Double): String =
    s"""WITH $corpusCte, $tkCte,
       |g AS (SELECT doc_id, ${gramsExpr(n)} AS grams FROM tk),
       |base AS (SELECT doc_id, CAST(len(grams) AS INT) AS n_ngrams,
       |                CAST(len(list_distinct(grams)) AS INT) AS n_distinct,
       |                CASE WHEN len(grams) > 0
       |                  THEN CAST(len(grams) - len(list_distinct(grams)) AS DOUBLE) / len(grams)
       |                  ELSE 0.0 END AS raw
       |         FROM g)
       |SELECT doc_id, n_ngrams, n_distinct, round(raw, 4) AS dup_frac,
       |       round(raw, 4) > $maxDupFrac AS flagged
       |FROM base ORDER BY doc_id""".stripMargin

  /** Twin of [[graft.ops.TextOps.redactPii]] over the gate's
    * deterministically PII-injected corpus (docs ≡ 0 mod 3 gain an email
    * + E.164 phone suffix; the rest exercise the no-match path). The
    * regex constants splice VERBATIM from TextOps. */
  def redactPii: String = {
    val em = TextOps.EmailRegex
    val ph = TextOps.PhoneRegex
    s"""WITH pii AS (SELECT doc_id,
       |  CASE WHEN doc_id % 3 = 0
       |    THEN text || ' reach doc' || CAST(doc_id AS VARCHAR) ||
       |         '@test.org or +1415555' || lpad(CAST(doc_id % 1000 AS VARCHAR), 4, '0')
       |    ELSE text END AS text
       |FROM documents)
       |SELECT doc_id,
       |  CAST(len(regexp_extract_all(lower(text), '$em')) AS INT) AS n_emails,
       |  CAST(len(regexp_extract_all(lower(text), '$ph')) AS INT) AS n_phones,
       |  regexp_replace(regexp_replace(lower(text), '$em', '<EMAIL>', 'g'),
       |                 '$ph', '<PHONE>', 'g') AS redacted
       |FROM pii ORDER BY doc_id""".stripMargin
  }

  val fpCte: String =
    s"""fps AS (SELECT doc_id,
       |  md5(array_to_string(toks, ' ')) AS fp,
       |  md5(array_to_string(list_sort(list_distinct(toks)), ' ')) AS fp_bag
       |FROM tk)""".stripMargin

  def fingerprints: String =
    s"WITH $corpusCte, $tkCte, $fpCte SELECT doc_id, fp, fp_bag FROM fps ORDER BY doc_id"

  /** Twin of [[graft.ops.TextOps.rollingFingerprints]] — the identical
    * per-step-mod fold (list_reduce seeded via a prepended 0 ≡ Spark's
    * aggregate with init 0), 1-based inclusive window slices. */
  def rollingFingerprints(k: Int): String = {
    val b = 1L << 20
    val m = (1L << 31) - 1
    s"""WITH $corpusCte, $tkCte,
       |th AS (SELECT doc_id,
       |    list_transform(toks, t -> ('0x' || substr(md5(t), 1, 6))::BIGINT) AS th
       |  FROM tk),
       |w AS (SELECT doc_id,
       |    CASE WHEN len(th) >= $k THEN
       |      list_transform(range(1, len(th) - ${k - 1} + 1), i ->
       |        list_reduce(list_prepend(0, th[i:i+${k - 1}]),
       |                    (h, t) -> (h * $b + t) % $m))
       |    ELSE CAST([] AS BIGINT[]) END AS w
       |  FROM th)
       |SELECT doc_id, CAST(len(w) AS INT) AS n_windows,
       |       COALESCE(list_min(w), -1) AS rh_min,
       |       COALESCE(list_max(w), -1) AS rh_max
       |FROM w ORDER BY doc_id""".stripMargin
  }

  def dupGroups: String =
    s"""WITH $corpusCte, $tkCte, $fpCte
       |SELECT fp_bag, count(*)::BIGINT AS n_docs, min(doc_id) AS canonical
       |FROM fps GROUP BY fp_bag HAVING count(*) >= 2 ORDER BY fp_bag""".stripMargin

  val dtokCte = s"dtok AS (SELECT DISTINCT doc_id, unnest($toks) AS term FROM corpus)"

  /** Exact-Jaccard verification over candidate pairs — shared tail. */
  private def jaccardTail(threshold: Double): String =
    s"""sz AS (SELECT doc_id, count(*)::BIGINT AS sz FROM dtok GROUP BY doc_id),
       |inter AS (SELECT c.doc_a, c.doc_b, count(*)::BIGINT AS inter
       |  FROM cand c
       |  JOIN dtok ta ON ta.doc_id = c.doc_a
       |  JOIN dtok tb ON tb.doc_id = c.doc_b AND tb.term = ta.term
       |  GROUP BY c.doc_a, c.doc_b),
       |jac AS (SELECT c.doc_a, c.doc_b,
       |  round(CAST(COALESCE(i.inter, 0) AS DOUBLE) /
       |        (sza.sz + szb.sz - COALESCE(i.inter, 0)), 4) AS jaccard
       |  FROM cand c
       |  LEFT JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
       |  JOIN sz sza ON sza.doc_id = c.doc_a
       |  JOIN sz szb ON szb.doc_id = c.doc_b)
       |SELECT doc_a, doc_b, jaccard FROM jac
       |WHERE jaccard >= $threshold ORDER BY doc_a, doc_b""".stripMargin

  /** n-gram shingle set CTE named `dtok` (same relation name the jaccard
    * tail expects). */
  private def shingleCte(n: Int): String = {
    val grams = (0 until n).map(o => s"tt[i + $o]").mkString(" || ' ' || ")
    s"""tl AS (SELECT doc_id, $toks AS tt FROM corpus),
       |dtok AS (SELECT DISTINCT doc_id, unnest(
       |    list_transform(range(1, len(tt) - ${n - 2}), i -> $grams)) AS term
       |  FROM tl WHERE len(tt) >= $n)""".stripMargin
  }

  def minhashPairs(threshold: Double, n: Int = 3): String = {
    val h = Dedup.NumHashes
    val r = Dedup.BandRows
    s"""WITH $corpusCte, ${shingleCte(n)},
       |hs AS (SELECT doc_id, i,
       |    min(('0x' || substr(md5(term || '#' || CAST(i AS VARCHAR)), 1, 8))::BIGINT) AS mh
       |  FROM dtok CROSS JOIN (SELECT unnest(range($h)) AS i)
       |  GROUP BY doc_id, i),
       |sig AS (SELECT doc_id, list(mh ORDER BY i) AS sig FROM hs GROUP BY doc_id),
       |bnd AS (SELECT doc_id, band,
       |    md5(array_to_string(sig[band * $r + 1 : band * $r + $r], ',')) AS bucket
       |  FROM sig CROSS JOIN (SELECT unnest(range(${h / r})) AS band)),
       |cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
       |  FROM bnd x JOIN bnd y
       |    ON x.band = y.band AND x.bucket = y.bucket AND x.doc_id < y.doc_id),
       |${jaccardTail(threshold)}""".stripMargin
  }

  /** Twin of [[graft.ops.TextOps.stratifiedSample]]: the md5-threshold
    * per-stratum keep predicate, bit-exact across engines (the shared
    * md5→int64 idiom). */
  def stratifiedSample(strataCol: String, rates: Map[String, Int],
                       defaultRate: Int): String = {
    val rateSql = rates.toSeq.sortBy(_._1).map { case (k, v) =>
      s"WHEN $strataCol = '$k' THEN $v" }.mkString(" ")
    s"""SELECT doc_id, $strataCol FROM documents
       |WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 1000 <
       |      CASE $rateSql ELSE $defaultRate END
       |ORDER BY doc_id""".stripMargin
  }

  /** Twin of the q_pipeline_trainset composition gate: quality gate →
    * canonical-dedup gate (drop non-representative near-dup members) →
    * stratified sample, each stage the SAME SQL its standalone gate runs
    * (nested as CTE bodies), so the composition cannot drift from the
    * parts. */
  def pipelineTrainset(minQuality: Double, rates: Map[String, Int],
                       defaultRate: Int, pairThreshold: Double): String = {
    val rateSql = rates.toSeq.sortBy(_._1).map { case (k, v) =>
      s"WHEN lang = '$k' THEN $v" }.mkString(" ")
    s"""WITH RECURSIVE q AS ($quality),
       |comps AS (${dedupComponents(minhashPairs(pairThreshold))})
       |SELECT documents.doc_id, lang FROM documents
       |JOIN q ON documents.doc_id = q.doc_id
       |WHERE quality_score >= $minQuality
       |  AND documents.doc_id NOT IN
       |      (SELECT doc_id FROM comps WHERE rep <> doc_id)
       |  AND ('0x' || substr(md5(CAST(documents.doc_id AS VARCHAR)), 1, 8))::BIGINT % 1000 <
       |      CASE $rateSql ELSE $defaultRate END
       |ORDER BY documents.doc_id""".stripMargin
  }

  /** Twin of [[graft.ops.Dedup.components]] over any pair SQL (e.g.
    * [[minhashPairs]]): connected components as a RECURSIVE reachability
    * closure — rep = min doc_id reachable over the symmetrized edge set.
    * The UNION (not UNION ALL) dedupes visited (doc, r) states, so the
    * recursion terminates on any graph. */
  def dedupComponents(pairsSql: String): String =
    s"""WITH RECURSIVE pairs AS ($pairsSql),
       |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
       |          UNION SELECT doc_b AS src, doc_a AS dst FROM pairs),
       |verts AS (SELECT DISTINCT src AS doc_id FROM edges),
       |reach(doc_id, r) AS (
       |  SELECT doc_id, doc_id AS r FROM verts
       |  UNION
       |  SELECT e.dst AS doc_id, reach.r FROM reach
       |  JOIN edges e ON e.src = reach.doc_id)
       |SELECT doc_id, CAST(min(r) AS BIGINT) AS rep FROM reach
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  val simhashCte: String = {
    val bits = Dedup.SimhashBits
    s"""tfq AS (SELECT doc_id, term, count(*)::BIGINT AS tf
       |  FROM (SELECT doc_id, unnest($toks) AS term FROM corpus)
       |  GROUP BY doc_id, term),
       |hh AS (SELECT doc_id, tf, ('0x' || substr(md5(term), 1, 15))::BIGINT AS h FROM tfq),
       |w AS (SELECT doc_id, j,
       |    sum(CASE WHEN (h >> CAST(j AS INT)) & 1 = 1 THEN tf ELSE -tf END) AS wsum
       |  FROM hh CROSS JOIN (SELECT unnest(range($bits)) AS j)
       |  GROUP BY doc_id, j),
       |sh AS (SELECT doc_id,
       |    CAST(sum(CASE WHEN wsum > 0 THEN (CAST(1 AS BIGINT) << CAST(j AS INT))
       |             ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS simhash
       |  FROM w GROUP BY doc_id)""".stripMargin
  }

  def simhash: String =
    s"WITH $corpusCte, $simhashCte SELECT doc_id, simhash FROM sh ORDER BY doc_id"

  def simhashPairs(maxDist: Int): String =
    s"""WITH $corpusCte, $simhashCte,
       |bnd AS (SELECT doc_id, simhash, band, (simhash >> CAST(band * 15 AS INT)) & 32767 AS chunk
       |  FROM sh CROSS JOIN (SELECT unnest(range(4)) AS band)),
       |cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
       |    x.simhash AS sha, y.simhash AS shb
       |  FROM bnd x JOIN bnd y
       |    ON x.band = y.band AND x.chunk = y.chunk AND x.doc_id < y.doc_id)
       |SELECT doc_a, doc_b, CAST(bit_count(xor(sha, shb)) AS INT) AS hamming
       |FROM cand WHERE bit_count(xor(sha, shb)) <= $maxDist
       |ORDER BY doc_a, doc_b""".stripMargin

  def ngramPairs(n: Int, threshold: Double): String = {
    s"""WITH $corpusCte, ${shingleCte(n)},
       |rare AS (SELECT term FROM dtok GROUP BY term
       |  HAVING count(*) <= ${Dedup.MaxCandidateShingleDf}),
       |shr AS (SELECT d.doc_id, d.term FROM dtok d JOIN rare r ON r.term = d.term),
       |cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
       |  FROM shr x JOIN shr y ON x.term = y.term AND x.doc_id < y.doc_id),
       |${jaccardTail(threshold)}""".stripMargin
  }

  /** Media table twin: payload = utf-8 text bytes, so md5(text) ≡
    * md5(payload) (ASCII corpus). */
  def mediaFeatures: String =
    s"""WITH media AS (SELECT doc_id AS media_id,
       |    CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS kind,
       |    text FROM documents),
       |f AS (SELECT media_id, kind,
       |    CAST(length(text) AS INT) AS n_bytes,
       |    md5(text) AS sig,
       |    ('0x' || substr(md5(text), 1, 8))::BIGINT AS h
       |  FROM media)
       |SELECT media_id, kind, n_bytes, sig,
       |  CAST(CASE WHEN kind = 'image' THEN 64 + (h % 192) ELSE 0 END AS INT) AS width,
       |  CAST(CASE WHEN kind = 'image' THEN 64 + ((h // 192) % 192) ELSE 0 END AS INT) AS height,
       |  CAST(CASE WHEN kind = 'audio' THEN 16000 ELSE 0 END AS INT) AS sample_rate,
       |  CAST(CASE WHEN kind = 'audio' THEN (n_bytes * 1000) // 16 ELSE 0 END AS BIGINT) AS duration_ms
       |FROM f ORDER BY media_id""".stripMargin

  def mediaFrames(frameBytes: Int, stride: Int): String =
    s"""WITH media AS (SELECT doc_id AS media_id, text FROM documents),
       |fr AS (SELECT media_id, unnest(range(CAST(ceil(length(text) / $frameBytes.0) AS BIGINT))) AS frame_idx, text
       |  FROM media WHERE length(text) > 0)
       |SELECT media_id, CAST(frame_idx AS INT) AS frame_idx,
       |  CAST(length(substr(text, CAST(frame_idx * $frameBytes + 1 AS INT), $frameBytes)) AS INT) AS frame_bytes,
       |  md5(substr(text, CAST(frame_idx * $frameBytes + 1 AS INT), $frameBytes)) AS frame_sig
       |FROM fr WHERE frame_idx % $stride = 0
       |ORDER BY media_id, frame_idx""".stripMargin

  /** Twin of q_events_props (json/map scalar family over events.parquet).
    * DuckDB sum(INT) is HUGEINT — cast to BIGINT to match Spark's long. */
  def eventsProps: String =
    s"""WITH ev AS (SELECT event_type,
       |    CAST(json_extract_string(props, '$$.k') AS INT) AS k FROM events)
       |SELECT event_type, count(*)::BIGINT AS n_events,
       |       CAST(sum(k) AS BIGINT) AS sum_k, max(k) AS max_k, min(k) AS min_k
       |FROM ev GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Twin of q_global_topn (W3 global sort + limit). */
  def globalTopN(n: Int): String =
    s"SELECT doc_id, n_chars FROM documents ORDER BY n_chars DESC, doc_id ASC LIMIT $n"

  /** Twin of q_events_windows (W4 frame-spec windows). Frame metrics are
    * order-independent (count / max / lag) — no FP-sum hazard. */
  def eventsWindows: String =
    s"""SELECT user_id, event_id,
       |  count(*) OVER w3 AS w_n,
       |  round(max(value) OVER w3, 4) AS w_max,
       |  COALESCE(lag(event_type, 1) OVER ws, 'none') AS prev_type
       |FROM events
       |WINDOW w3 AS (PARTITION BY user_id ORDER BY ts, event_id
       |              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
       |       ws AS (PARTITION BY user_id ORDER BY ts, event_id)
       |ORDER BY user_id, event_id""".stripMargin

  /** Twin of [[graft.ops.EventOps.sessionize]] — the gaps-and-islands
    * spelling of session_window: a session break is a gap STRICTLY
    * GREATER than `gapMinutes` — Spark merges touching windows, so an
    * event at exactly prev_ts + gap stays in-session — island id by
    * running sum of breaks, session end = last ts + gap. */
  def eventsSessions(gapMinutes: Int): String =
    s"""WITH o AS (SELECT user_id, ts, value,
       |    CASE WHEN lag(ts) OVER w IS NULL
       |           OR ts - lag(ts) OVER w > INTERVAL $gapMinutes MINUTE
       |         THEN 1 ELSE 0 END AS brk
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
       |i AS (SELECT user_id, ts, value,
       |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts
       |                   ROWS UNBOUNDED PRECEDING) AS sid
       |  FROM o)
       |SELECT user_id, min(ts) AS session_start,
       |  max(ts) + INTERVAL $gapMinutes MINUTE AS session_end,
       |  count(*)::INT AS n_events, round(sum(value), 4) AS sum_value
       |FROM i GROUP BY user_id, sid
       |ORDER BY user_id, session_start""".stripMargin

  /** Twin of [[graft.ops.EventOps.funnel]]. */
  def eventsFunnel(stepA: String, stepB: String, withinHours: Int): String =
    s"""WITH a AS (SELECT user_id, min(ts) AS a_ts FROM events
       |           WHERE event_type = '$stepA' GROUP BY 1),
       |b AS (SELECT e.user_id, min(e.ts) AS b_ts
       |      FROM events e JOIN a USING (user_id)
       |      WHERE e.event_type = '$stepB' AND e.ts > a.a_ts GROUP BY 1)
       |SELECT a.user_id, a.a_ts, b.b_ts,
       |  (b.b_ts IS NOT NULL AND
       |   b.b_ts <= a.a_ts + INTERVAL $withinHours HOUR) AS converted
       |FROM a LEFT JOIN b USING (user_id)
       |ORDER BY a.user_id""".stripMargin

  /** Twin of q_corpus_cube (G7 rollup); GROUPING() relabels rollup nulls
    * as 'ALL' so neither engine emits NULL (pandas str-casts them
    * differently). */
  def corpusCube: String =
    s"""SELECT CASE WHEN GROUPING(lang) = 1 THEN 'ALL' ELSE lang END AS lang,
       |  CASE WHEN GROUPING(source) = 1 THEN 'ALL' ELSE source END AS source,
       |  count(*)::BIGINT AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
       |FROM documents GROUP BY ROLLUP(lang, source)
       |ORDER BY 1, 2""".stripMargin

  /** Twin of q_dedup_embedding: BRUTE-FORCE all-pairs ground truth (the
    * Spark side's banding is provably complete, so filtering the full
    * product by the same exact cosine must produce the identical set).
    * Unit-normalize then left-fold the per-index products — the same
    * sequential order as Spark's zip_with + aggregate, so the doubles are
    * bit-identical. */
  def embeddingPairs(threshold: Double): String =
    s"""WITH emb AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
       |  FROM embeddings),
       |n AS (SELECT vec_id, e,
       |    sqrt(list_reduce(list_transform(e, x -> x * x), (a, b) -> a + b)) AS nrm
       |  FROM emb),
       |u AS (SELECT vec_id, list_transform(e, x -> x / nrm) AS u FROM n),
       |p AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       |    list_reduce(list_transform(range(1, len(a.u) + 1), i -> a.u[i] * b.u[i]),
       |                (x, y) -> x + y) AS cos
       |  FROM u a JOIN u b ON a.vec_id < b.vec_id)
       |SELECT vec_a, vec_b, round(cos, 4) AS cos FROM p
       |WHERE round(cos, 7) >= $threshold ORDER BY vec_a, vec_b""".stripMargin

  /** Twin of q_term_tf_stopped (P4 stopword predicate before G1). */
  def termTfStopped(stopwords: Seq[String]): String =
    s"""WITH $corpusCte,
       |toks AS (SELECT doc_id, unnest($toks) AS term FROM corpus),
       |kept AS (SELECT doc_id, term FROM toks
       |  WHERE NOT list_contains(${lst(stopwords)}, term))
       |SELECT term, doc_id, count(*)::INT AS tf FROM kept
       |GROUP BY term, doc_id ORDER BY term, doc_id""".stripMargin

  /** Shared embedding CTEs: doubled vectors + norms (+ query set). */
  private def embCtes(queryIds: Seq[Long]): String =
    s"""emb AS (SELECT vec_id, label,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
       |  FROM embeddings),
       |n AS (SELECT vec_id, label, e,
       |    sqrt(list_reduce(list_transform(e, x -> x * x), (a, b) -> a + b)) AS nrm
       |  FROM emb),
       |q AS (SELECT vec_id AS query_vec, e AS qe, nrm AS qn FROM n
       |  WHERE vec_id IN (${queryIds.mkString(", ")}))""".stripMargin

  /** Twin of [[graft.ops.Similarity.pqTopK]] — the full PQ chain unrolled
    * ([[kmeansChain]] pattern with the subvector dimension threaded
    * through every key): per-subvector L2 Lloyd's (round(dist², 9) ASC /
    * lowest-label ties, means rounded to 6, empty cells keep their
    * centroid), corpus encoding, and the ADC table-lookup scoring. The
    * squared-L2 fold spells the engine's zip_with+aggregate tree
    * (0.0 + v₁ ≡ v₁), and ds derives from len(e) in-query so the SQL is
    * data-independent. */
  private def l2Sql(a: String, b: String) =
    s"list_reduce(list_transform(range(1, len($a) + 1), i -> ($a[i] - $b[i]) * ($a[i] - $b[i])), (x, y) -> x + y)"

  /** Unrolled PQ train+encode chain over an existing `subs(vec_id, j,
    * sub)` CTE — CTE names carry `pfx` so the chain composes with the
    * coarse-quantizer chain ([[kmeansChain]]) without collisions.
    * Returns (CTEs, final-assignment name, final-codebook name). */
  private def pqSteps(codebookSize: Int, iters: Int,
                      pfx: String): (String, String, String) = {
    def assignCte(name: String, cent: String) =
      s"""$name AS (SELECT vec_id, j, label, sub FROM (
         |    SELECT s.vec_id, s.j, c.label, s.sub,
         |      row_number() OVER (PARTITION BY s.vec_id, s.j ORDER BY
         |        round(${l2Sql("s.sub", "c.c")}, 9) ASC, c.label ASC) AS r
         |    FROM subs s JOIN $cent c USING (j)) WHERE r = 1)""".stripMargin
    val init =
      s"""${pfx}c0 AS (SELECT j, CAST(vec_id AS INT) AS label, sub AS c
         |  FROM subs WHERE vec_id < $codebookSize)""".stripMargin
    val steps = (1 to iters).map { i =>
      s"""${assignCte(s"${pfx}a$i", s"${pfx}c${i - 1}")},
         |${pfx}u$i AS (SELECT j, label, list(cv ORDER BY pos) AS c FROM (
         |    SELECT j, label, pos, round(avg(v), 6) AS cv FROM (
         |      SELECT j, label, unnest(sub) AS v, generate_subscripts(sub, 1) AS pos FROM ${pfx}a$i)
         |    GROUP BY j, label, pos) GROUP BY j, label),
         |${pfx}c$i AS (SELECT p.j, p.label, COALESCE(u.c, p.c) AS c
         |  FROM ${pfx}c${i - 1} p LEFT JOIN ${pfx}u$i u USING (j, label))""".stripMargin
    }
    val fin = assignCte(s"${pfx}afin", s"${pfx}c$iters")
    ((init +: steps :+ fin).mkString(",\n"), s"${pfx}afin", s"${pfx}c$iters")
  }

  def pqTopK(queryIds: Seq[Long], k: Int, m: Int, codebookSize: Int,
             iters: Int): String = {
    val (chain, afin, cbFin) = pqSteps(codebookSize, iters, "")
    s"""WITH kemb AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
       |  FROM embeddings),
       |js AS (SELECT CAST(unnest(range(0, $m)) AS INT) AS j),
       |subs AS (SELECT vec_id, j,
       |    list_slice(e, j * (len(e) // $m) + 1, j * (len(e) // $m) + (len(e) // $m)) AS sub
       |  FROM kemb CROSS JOIN js),
       |$chain,
       |tbl AS (SELECT q.query_vec, c.j, c.label AS code, ${l2Sql("q.qsub", "c.c")} AS part
       |  FROM (SELECT vec_id AS query_vec, j, sub AS qsub FROM subs
       |        WHERE vec_id IN (${queryIds.mkString(", ")})) q
       |  JOIN $cbFin c ON q.j = c.j),
       |scored AS (SELECT t.query_vec, a.vec_id, sum(t.part) AS d
       |  FROM $afin a JOIN tbl t ON a.j = t.j AND a.label = t.code
       |  WHERE a.vec_id <> t.query_vec GROUP BY 1, 2)
       |SELECT query_vec, CAST(rnk AS INT) AS "rank", vec_id, round(d, 4) AS adist FROM (
       |  SELECT query_vec, vec_id, d,
       |    row_number() OVER (PARTITION BY query_vec
       |                       ORDER BY round(d, 9) ASC, vec_id ASC) AS rnk
       |  FROM scored) WHERE rnk <= $k
       |ORDER BY query_vec, rnk""".stripMargin
  }

  /** Twin of [[graft.ops.Similarity.ivfPqTopK]] — the coarse
    * [[kmeansChain]] (same CTEs as the IVF twins), 6-decimal-rounded
    * serving centroids, residual subvectors, the prefixed [[pqSteps]]
    * chain on residuals, cosine probes (dot / (‖q‖·‖c‖) in the engine's
    * association), per-(query, probed-cluster) residual ADC tables, and
    * cluster-scoped code lookups. */
  def ivfPqTopK(queryIds: Seq[Long], k: Int, clusters: Int, nProbe: Int,
                m: Int, codebookSize: Int, iters: Int): String = {
    val (kc, kfin) = kmeansChain(clusters, iters)
    val (chain, pafin, cbFin) = pqSteps(codebookSize, iters, "p")
    val ids = queryIds.mkString(", ")
    def norm(x: String) =
      s"sqrt(list_reduce(list_transform($x, v -> v * v), (a, b) -> a + b))"
    val dotQC =
      s"list_reduce(list_transform(range(1, len(q.e) + 1), i -> q.e[i] * r.c[i]), (x, y) -> x + y)"
    s"""WITH $kc,
       |rcent AS (SELECT label, list(cv ORDER BY pos) AS c FROM (
       |    SELECT label, pos, round(avg(v), 6) AS cv FROM (
       |      SELECT label, unnest(e) AS v, generate_subscripts(e, 1) AS pos FROM $kfin)
       |    GROUP BY label, pos) GROUP BY label),
       |res AS (SELECT a.vec_id, a.label AS clab,
       |    list_transform(range(1, len(a.e) + 1), i -> a.e[i] - r.c[i]) AS rv
       |  FROM $kfin a JOIN rcent r USING (label)),
       |js AS (SELECT CAST(unnest(range(0, $m)) AS INT) AS j),
       |subs AS (SELECT vec_id, clab, j,
       |    list_slice(rv, j * (len(rv) // $m) + 1, j * (len(rv) // $m) + (len(rv) // $m)) AS sub
       |  FROM res CROSS JOIN js),
       |$chain,
       |enc AS (SELECT a.vec_id, a.j, a.label AS code, s.clab
       |  FROM $pafin a JOIN (SELECT DISTINCT vec_id, clab FROM subs) s USING (vec_id)),
       |probes AS (SELECT query_vec, clab, qe, centroid FROM (
       |    SELECT q.vec_id AS query_vec, q.e AS qe, r.label AS clab, r.c AS centroid,
       |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
       |        round($dotQC / (${norm("q.e")} * ${norm("r.c")}), 9) DESC,
       |        r.label ASC) AS pr
       |    FROM kemb q CROSS JOIN rcent r WHERE q.vec_id IN ($ids))
       |  WHERE pr <= $nProbe),
       |qsubs AS (SELECT query_vec, clab, j,
       |    list_slice(rv, j * (len(rv) // $m) + 1, j * (len(rv) // $m) + (len(rv) // $m)) AS qsub
       |  FROM (SELECT query_vec, clab,
       |          list_transform(range(1, len(qe) + 1), i -> qe[i] - centroid[i]) AS rv
       |        FROM probes) CROSS JOIN js),
       |tbl AS (SELECT s.query_vec, s.clab, c.j, c.label AS code,
       |               ${l2Sql("s.qsub", "c.c")} AS part
       |  FROM qsubs s JOIN $cbFin c ON s.j = c.j),
       |scored AS (SELECT t.query_vec, e2.vec_id, sum(t.part) AS d
       |  FROM enc e2 JOIN tbl t ON e2.clab = t.clab AND e2.j = t.j AND e2.code = t.code
       |  WHERE e2.vec_id <> t.query_vec GROUP BY 1, 2)
       |SELECT query_vec, CAST(rnk AS INT) AS "rank", vec_id, round(d, 4) AS adist FROM (
       |  SELECT query_vec, vec_id, d,
       |    row_number() OVER (PARTITION BY query_vec
       |                       ORDER BY round(d, 9) ASC, vec_id ASC) AS rnk
       |  FROM scored) WHERE rnk <= $k
       |ORDER BY query_vec, rnk""".stripMargin
  }

  private def rankedTail(k: Int): String =
    s"""ranked AS (SELECT query_vec, vec_id, sim,
       |    row_number() OVER (PARTITION BY query_vec
       |                       ORDER BY round(sim, 7) DESC, vec_id ASC) AS rnk
       |  FROM scored)
       |SELECT query_vec, CAST(rnk AS INT) AS "rank", vec_id, round(sim, 4) AS sim
       |FROM ranked WHERE rnk <= $k ORDER BY query_vec, rnk""".stripMargin

  /** Twin of [[graft.ops.Similarity.mrlTopK]] — truncated-prefix cosine
    * shortlist (pinned boundary: round(simt,7) DESC, vec_id ASC), then
    * full-dimension re-rank over the shortlist only. */
  def mrlTopK(queryIds: Seq[Long], k: Int, dims: Int,
              shortlist: Int): String =
    s"""WITH ${embCtes(queryIds)},
       |qt AS (SELECT query_vec, qe, qn, qe[1:$dims] AS qte,
       |    sqrt(list_reduce(list_transform(qe[1:$dims], x -> x * x),
       |         (a, b) -> a + b)) AS qtn FROM q),
       |nt AS (SELECT vec_id, e, nrm, e[1:$dims] AS ete,
       |    sqrt(list_reduce(list_transform(e[1:$dims], x -> x * x),
       |         (a, b) -> a + b)) AS etn FROM n),
       |tdots AS (SELECT query_vec, vec_id, sum(a * b) AS dot
       |  FROM (SELECT query_vec, vec_id, unnest(qte) AS a, unnest(ete) AS b
       |        FROM qt CROSS JOIN nt WHERE nt.vec_id <> qt.query_vec)
       |  GROUP BY query_vec, vec_id),
       |ts AS (SELECT d.query_vec, d.vec_id,
       |    d.dot / (q2.qtn * n2.etn) AS simt
       |  FROM tdots d JOIN qt q2 USING (query_vec) JOIN nt n2 USING (vec_id)),
       |heads AS (SELECT query_vec, vec_id FROM (
       |    SELECT query_vec, vec_id, row_number() OVER (
       |      PARTITION BY query_vec
       |      ORDER BY round(simt, 7) DESC, vec_id ASC) AS r FROM ts)
       |  WHERE r <= $shortlist),
       |pairs AS (SELECT h.query_vec, h.vec_id, q.qe, n.e, q.qn, n.nrm
       |  FROM heads h JOIN q USING (query_vec) JOIN n USING (vec_id)),
       |dots AS (SELECT query_vec, vec_id, sum(a * b) AS dot
       |  FROM (SELECT query_vec, vec_id, unnest(qe) AS a, unnest(e) AS b FROM pairs)
       |  GROUP BY query_vec, vec_id),
       |scored AS (SELECT d.query_vec, d.vec_id, d.dot / (p.qn * p.nrm) AS sim
       |  FROM dots d JOIN pairs p ON p.query_vec = d.query_vec AND p.vec_id = d.vec_id),
       |${rankedTail(k)}""".stripMargin

  /** Twin of [[graft.ops.Similarity.sq8TopK]] — per-dim (min,max) train,
    * clamp(floor(·),0,255)+0.5 mid-bucket dequant, asymmetric cosine; the
    * quantization arithmetic is operand-order-identical to the engine. */
  def sq8TopK(queryIds: Seq[Long], k: Int): String =
    s"""WITH ${embCtes(queryIds)},
       |dx AS (SELECT unnest(range(1, len(e) + 1)) AS dim, unnest(e) AS x
       |       FROM emb),
       |st AS (SELECT dim, min(x) AS mn, max(x) AS mx FROM dx GROUP BY 1),
       |stl AS (SELECT list(mn ORDER BY dim) AS mnl,
       |    list(CASE WHEN mx > mn THEN (mx - mn) / 255.0 ELSE 0.0 END
       |         ORDER BY dim) AS sl FROM st),
       |xh AS (SELECT vec_id,
       |    list_transform(range(1, len(e) + 1), i ->
       |      CASE WHEN sl[i] = 0.0 THEN mnl[i]
       |           ELSE mnl[i] + (least(greatest(floor((e[i] - mnl[i]) / sl[i]),
       |                                         0.0), 255.0) + 0.5) * sl[i]
       |      END) AS xhat
       |  FROM n CROSS JOIN stl),
       |pairs AS (SELECT q.query_vec, x.vec_id, q.qe, x.xhat, q.qn,
       |    sqrt(list_reduce(list_transform(x.xhat, v -> v * v),
       |         (a, b) -> a + b)) AS hn
       |  FROM q CROSS JOIN xh x WHERE x.vec_id <> q.query_vec),
       |dots AS (SELECT query_vec, vec_id, sum(a * b) AS dot
       |  FROM (SELECT query_vec, vec_id, unnest(qe) AS a, unnest(xhat) AS b FROM pairs)
       |  GROUP BY query_vec, vec_id),
       |scored AS (SELECT d.query_vec, d.vec_id, d.dot / (p.qn * p.hn) AS sim
       |  FROM dots d JOIN pairs p ON p.query_vec = d.query_vec AND p.vec_id = d.vec_id),
       |${rankedTail(k)}""".stripMargin

  /** Twin of [[graft.ops.Similarity.rrfTopK]] — the two ranker twins as
    * nested CTEs, full-outer rank join, exact reciprocal sums. */
  def rrfTopK(queryIds: Seq[Long], k: Int, depth: Int, k0: Int): String =
    s"""WITH ca AS (${cosineTopK(queryIds, depth)}),
       |cb AS (${sq8TopK(queryIds, depth)}),
       |f AS (SELECT coalesce(a.query_vec, b.query_vec) AS query_vec,
       |    coalesce(a.vec_id, b.vec_id) AS vec_id,
       |    coalesce(1.0 / ($k0 + a."rank"), 0.0)
       |      + coalesce(1.0 / ($k0 + b."rank"), 0.0) AS rrf
       |  FROM ca a FULL OUTER JOIN cb b
       |    ON a.query_vec = b.query_vec AND a.vec_id = b.vec_id)
       |SELECT query_vec, CAST(rnk AS INT) AS "rank", vec_id,
       |  round(rrf, 9) AS rrf
       |FROM (SELECT query_vec, vec_id, rrf,
       |        row_number() OVER (PARTITION BY query_vec
       |          ORDER BY round(rrf, 9) DESC, vec_id ASC) AS rnk FROM f)
       |WHERE rnk <= $k ORDER BY query_vec, rnk""".stripMargin

  def cosineTopK(queryIds: Seq[Long], k: Int): String =
    s"""WITH ${embCtes(queryIds)},
       |pairs AS (SELECT q.query_vec, n.vec_id, q.qe, n.e, q.qn, n.nrm
       |  FROM q CROSS JOIN n WHERE n.vec_id <> q.query_vec),
       |dots AS (SELECT query_vec, vec_id, sum(a * b) AS dot
       |  FROM (SELECT query_vec, vec_id, unnest(qe) AS a, unnest(e) AS b FROM pairs)
       |  GROUP BY query_vec, vec_id),
       |scored AS (SELECT d.query_vec, d.vec_id, d.dot / (p.qn * p.nrm) AS sim
       |  FROM dots d JOIN pairs p ON p.query_vec = d.query_vec AND p.vec_id = d.vec_id),
       |${rankedTail(k)}""".stripMargin

  /** Unrolled Lloyd's k-means CTE chain — twin of
    * [[graft.ops.Similarity.kmeansLabels]]'s pinned semantics (init from
    * vec_id < k, cosine assignment on round(sim, 9) with lowest-label
    * ties, per-coordinate mean rounded to 6 decimals, empty clusters keep
    * their previous centroid, fixed iterations). Returns (CTE prelude,
    * name of the final-assignment CTE). The cosine spells the exact
    * sequential fold of the Spark side (list_reduce ≡ the native
    * DotProduct — see [[embeddingPairs]]), so the round(…, 9) argmax
    * agrees bit-for-bit. */
  private def kmeansChain(k: Int, iters: Int): (String, String) = {
    def assignCte(name: String, centName: String) =
      s"""$name AS (SELECT vec_id, label, e FROM (
         |    SELECT en.vec_id, c.label, en.e,
         |      row_number() OVER (PARTITION BY en.vec_id ORDER BY
         |        round(list_reduce(list_transform(range(1, len(en.e) + 1), j -> en.e[j] * c.c[j]), (x, y) -> x + y)
         |              / (en.nrm * sqrt(list_reduce(list_transform(c.c, x -> x * x), (a, b) -> a + b))), 9) DESC,
         |        c.label ASC) AS r
         |    FROM en CROSS JOIN $centName c) WHERE r = 1)""".stripMargin
    val head =
      s"""kemb AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
         |  FROM embeddings),
         |en AS (SELECT vec_id, e,
         |    sqrt(list_reduce(list_transform(e, x -> x * x), (a, b) -> a + b)) AS nrm
         |  FROM kemb),
         |c0 AS (SELECT CAST(vec_id AS INT) AS label, e AS c FROM kemb WHERE vec_id < $k)""".stripMargin
    val steps = (1 to iters).map { i =>
      s"""${assignCte(s"a$i", s"c${i - 1}")},
         |u$i AS (SELECT label, list(cv ORDER BY pos) AS c FROM (
         |    SELECT label, pos, round(avg(v), 6) AS cv FROM (
         |      SELECT label, unnest(e) AS v, generate_subscripts(e, 1) AS pos FROM a$i)
         |    GROUP BY label, pos) GROUP BY label),
         |c$i AS (SELECT p.label, COALESCE(u.c, p.c) AS c
         |  FROM c${i - 1} p LEFT JOIN u$i u USING (label))""".stripMargin
    }
    val fin = assignCte("afin", s"c$iters")
    ((head +: steps :+ fin).mkString(",\n"), "afin")
  }

  /** Twin of q_ann_kmeans: final (vec_id, label) assignments. */
  def kmeans(k: Int, iters: Int): String = {
    val (ctes, fin) = kmeansChain(k, iters)
    s"""WITH $ctes
       |SELECT vec_id, label FROM $fin ORDER BY vec_id""".stripMargin
  }

  /** Twin of q_dedup_semantic — SemDeDup (Abbas et al. 2023) over the
    * TRAINED k-means assignment: within-cluster greedy keep-most-central
    * under a cosine threshold. Mirrors
    * [[graft.ops.Similarity.semDedup]]'s pinned semantics verbatim:
    * centroid = per-coordinate avg rounded to 6, rank = round(centroid
    * cosine, 9) DESC then vec_id ASC, drop iff a higher-ranked
    * cluster-mate has round(pair cosine, 7) ≥ threshold. All dots are the
    * sequential list_reduce fold (≡ Spark's native DotProduct). */
  def semDedup(clusters: Int, iters: Int, threshold: Double): String = {
    val (ctes, fin) = kmeansChain(clusters, iters)
    def dotSeq(a: String, b: String) =
      s"list_reduce(list_transform(range(1, len($a) + 1), j -> $a[j] * $b[j]), (x, y) -> x + y)"
    s"""WITH $ctes,
       |n AS (SELECT a.vec_id, a.label, a.e,
       |    sqrt(list_reduce(list_transform(a.e, x -> x * x), (p, q) -> p + q)) AS nrm
       |  FROM $fin a),
       |cent AS (SELECT label, list(c ORDER BY pos) AS centroid FROM (
       |    SELECT label, pos, round(avg(v), 6) AS c FROM (
       |      SELECT label, unnest(e) AS v, generate_subscripts(e, 1) AS pos FROM n)
       |    GROUP BY label, pos) GROUP BY label),
       |centn AS (SELECT label, centroid,
       |    sqrt(list_reduce(list_transform(centroid, x -> x * x), (a, b) -> a + b)) AS cnrm
       |  FROM cent),
       |ranked AS (SELECT n.vec_id, n.label, n.e, n.nrm,
       |    row_number() OVER (PARTITION BY n.label ORDER BY
       |      round(${dotSeq("n.e", "c.centroid")} / (n.nrm * c.cnrm), 9) DESC,
       |      n.vec_id ASC) AS r
       |  FROM n JOIN centn c USING (label)),
       |dropped AS (SELECT DISTINCT x.vec_id FROM ranked x JOIN ranked y
       |    ON y.label = x.label AND y.r < x.r
       |  WHERE round(${dotSeq("x.e", "y.e")} / (x.nrm * y.nrm), 7) >= $threshold)
       |SELECT rk.vec_id, rk.label, d.vec_id IS NULL AS keep
       |FROM ranked rk LEFT JOIN dropped d USING (vec_id)
       |ORDER BY rk.vec_id""".stripMargin
  }

  /** Twin of q_ann_ivf_kmeans: [[ivfTopK]] with the label column replaced
    * by the TRAINED k-means assignment (the serving path over its own
    * training operator — the self-contained ANN story). */
  def ivfKmeans(queryIds: Seq[Long], k: Int, nProbe: Int,
                clusters: Int, iters: Int): String = {
    val (ctes, fin) = kmeansChain(clusters, iters)
    s"""WITH $ctes,
       |n AS (SELECT en.vec_id, a.label, en.e, en.nrm
       |  FROM en JOIN $fin a USING (vec_id)),
       |q AS (SELECT vec_id AS query_vec, e AS qe, nrm AS qn FROM n
       |  WHERE vec_id IN (${queryIds.mkString(", ")})),
       |cent AS (SELECT label, list(c ORDER BY pos) AS centroid FROM (
       |    SELECT label, pos, avg(v) AS c FROM (
       |      SELECT label, unnest(e) AS v, generate_subscripts(e, 1) AS pos FROM n)
       |    GROUP BY label, pos) GROUP BY label),
       |centn AS (SELECT label, centroid,
       |    sqrt(list_reduce(list_transform(centroid, x -> x * x), (a, b) -> a + b)) AS cnrm
       |  FROM cent),
       |cpairs AS (SELECT q.query_vec, q.qe, q.qn, c.label, c.centroid, c.cnrm
       |  FROM q CROSS JOIN centn c),
       |cdots AS (SELECT query_vec, label, sum(a * b) AS dot
       |  FROM (SELECT query_vec, label, unnest(qe) AS a, unnest(centroid) AS b FROM cpairs)
       |  GROUP BY query_vec, label),
       |probes AS (SELECT query_vec, label FROM (
       |    SELECT d.query_vec, d.label,
       |      row_number() OVER (PARTITION BY d.query_vec
       |        ORDER BY round(d.dot / (p.qn * p.cnrm), 9) DESC, d.label ASC) AS pr
       |    FROM cdots d JOIN cpairs p ON p.query_vec = d.query_vec AND p.label = d.label)
       |  WHERE pr <= $nProbe),
       |pairs AS (SELECT q.query_vec, n.vec_id, q.qe, n.e, q.qn, n.nrm
       |  FROM probes pb JOIN q ON q.query_vec = pb.query_vec
       |  JOIN n ON n.label = pb.label
       |  WHERE n.vec_id <> q.query_vec),
       |dots AS (SELECT query_vec, vec_id, sum(a * b) AS dot
       |  FROM (SELECT query_vec, vec_id, unnest(qe) AS a, unnest(e) AS b FROM pairs)
       |  GROUP BY query_vec, vec_id),
       |scored AS (SELECT d.query_vec, d.vec_id, d.dot / (p.qn * p.nrm) AS sim
       |  FROM dots d JOIN pairs p ON p.query_vec = d.query_vec AND p.vec_id = d.vec_id),
       |${rankedTail(k)}""".stripMargin
  }

  def ivfTopK(queryIds: Seq[Long], k: Int, nProbe: Int): String =
    s"""WITH ${embCtes(queryIds)},
       |cent AS (SELECT label, list(c ORDER BY pos) AS centroid FROM (
       |    SELECT label, pos, avg(v) AS c FROM (
       |      SELECT label, unnest(e) AS v, generate_subscripts(e, 1) AS pos FROM n)
       |    GROUP BY label, pos) GROUP BY label),
       |centn AS (SELECT label, centroid,
       |    sqrt(list_reduce(list_transform(centroid, x -> x * x), (a, b) -> a + b)) AS cnrm
       |  FROM cent),
       |cpairs AS (SELECT q.query_vec, q.qe, q.qn, c.label, c.centroid, c.cnrm
       |  FROM q CROSS JOIN centn c),
       |cdots AS (SELECT query_vec, label, sum(a * b) AS dot
       |  FROM (SELECT query_vec, label, unnest(qe) AS a, unnest(centroid) AS b FROM cpairs)
       |  GROUP BY query_vec, label),
       |probes AS (SELECT query_vec, label FROM (
       |    SELECT d.query_vec, d.label,
       |      row_number() OVER (PARTITION BY d.query_vec
       |        ORDER BY round(d.dot / (p.qn * p.cnrm), 9) DESC, d.label ASC) AS pr
       |    FROM cdots d JOIN cpairs p ON p.query_vec = d.query_vec AND p.label = d.label)
       |  WHERE pr <= $nProbe),
       |pairs AS (SELECT q.query_vec, n.vec_id, q.qe, n.e, q.qn, n.nrm
       |  FROM probes pb JOIN q ON q.query_vec = pb.query_vec
       |  JOIN n ON n.label = pb.label
       |  WHERE n.vec_id <> q.query_vec),
       |dots AS (SELECT query_vec, vec_id, sum(a * b) AS dot
       |  FROM (SELECT query_vec, vec_id, unnest(qe) AS a, unnest(e) AS b FROM pairs)
       |  GROUP BY query_vec, vec_id),
       |scored AS (SELECT d.query_vec, d.vec_id, d.dot / (p.qn * p.nrm) AS sim
       |  FROM dots d JOIN pairs p ON p.query_vec = d.query_vec AND p.vec_id = d.vec_id),
       |${rankedTail(k)}""".stripMargin

  /** Twin of [[graft.ops.TextOps.fimExamples]]: the same two-hash cut
    * geometry (md5 per-doc, mod the remaining length) and PSM render,
    * end-inclusive bracket slices mirroring Spark's (start, length)
    * slice() calls exactly. */
  def fimExamples: String =
    s"""WITH t AS (SELECT doc_id, ${Analyzer.sqlTokenList("text")} AS tk FROM documents),
       |c AS (SELECT doc_id, tk, len(tk) AS n,
       |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#1'), 1, 8))::BIGINT
       |         % (len(tk) + 1) AS INT) AS cut_a
       |  FROM t),
       |c2 AS (SELECT doc_id, tk, n, cut_a,
       |    CAST(cut_a + ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#2'), 1, 8))::BIGINT
       |         % (n - cut_a + 1) AS INT) AS cut_b
       |  FROM c)
       |SELECT doc_id, CAST(n AS INT) AS n_tokens, cut_a, cut_b,
       |  '<PRE> ' || coalesce(array_to_string(tk[1:cut_a], ' '), '')
       |    || ' <SUF> '
       |    || coalesce(array_to_string(tk[cut_b+1:n], ' '), '')
       |    || ' <MID>' AS fim_input,
       |  coalesce(array_to_string(tk[cut_a+1:cut_b], ' '), '') AS fim_target
       |FROM c2 ORDER BY doc_id""".stripMargin

  /** Twin of [[graft.ops.TextOps.pplBuckets]] — the [[lmPerplexity]] CTE
    * ranked on (log_ppl, doc_id) with the ceil(N/3)/ceil(2N/3) integer
    * boundaries; unscored docs in their own bucket outside N. */
  def pplBuckets(trainLang: String, alpha: Double): String =
    s"""WITH lp AS (${lmPerplexity(trainLang, alpha, 0.0)}),
       |nn AS (SELECT count(*)::BIGINT AS n FROM lp WHERE log_ppl IS NOT NULL),
       |rk AS (SELECT doc_id, log_ppl,
       |    row_number() OVER (ORDER BY log_ppl ASC, doc_id ASC) AS r
       |  FROM lp WHERE log_ppl IS NOT NULL)
       |SELECT doc_id, log_ppl,
       |  CASE WHEN r <= (n + 2) // 3 THEN 'head'
       |       WHEN r <= (2 * n + 2) // 3 THEN 'middle'
       |       ELSE 'tail' END AS bucket
       |FROM rk CROSS JOIN nn
       |UNION ALL
       |SELECT doc_id, log_ppl, 'unscored' AS bucket
       |FROM lp WHERE log_ppl IS NULL
       |ORDER BY doc_id""".stripMargin

  /** Twin of [[graft.ops.Dedup.pagerank]] — unrolled fixed-iteration
    * chain (the kmeansChain pattern) over the MATERIALIZED symmetrized
    * edge set; every iterate rounded to 9 dp before the next round so
    * the engines' unordered in-neighbor sums re-agree. */
  def pagerank(pairsSql: String, iters: Int, d: Double): String = {
    val rounds = (1 to iters).map { k =>
      s"""r$k AS (SELECT e.dst AS doc_id,
         |    round((1.0 - $d) / (SELECT n FROM nn)
         |          + $d * sum(r.pr / dg.deg), 9) AS pr
         |  FROM edges e
         |  JOIN r${k - 1} r ON r.doc_id = e.src
         |  JOIN deg dg ON dg.src = e.src
         |  GROUP BY e.dst)""".stripMargin
    }.mkString(",\n")
    s"""WITH pairs AS ($pairsSql),
       |edges AS MATERIALIZED (SELECT doc_a AS src, doc_b AS dst FROM pairs
       |          UNION SELECT doc_b AS src, doc_a AS dst FROM pairs),
       |deg AS MATERIALIZED (SELECT src, count(*)::BIGINT AS deg
       |                     FROM edges GROUP BY 1),
       |nn AS (SELECT count(*)::BIGINT AS n FROM deg),
       |r0 AS (SELECT src AS doc_id, round(1.0 / (SELECT n FROM nn), 9) AS pr
       |       FROM deg),
       |$rounds
       |SELECT doc_id, pr FROM r$iters ORDER BY doc_id""".stripMargin
  }

  /** Twin of [[graft.ops.Dedup.bfsExpand]] seeded by the
    * [[decontaminate]] contaminated set (bench = doc_id ≡ 0 mod
    * `benchMod`): a DEPTH-BOUNDED recursive CTE over the symmetrized
    * pair relation, min-depth per doc — the independent spelling of the
    * Spark side's iterative frontier/anti-join BFS. */
  def contaminationSpread(pairsSql: String, n: Int, benchMod: Int,
                          maxDepth: Int): String =
    s"""WITH RECURSIVE pairs AS ($pairsSql),
       |$corpusCte, $tkCte,
       |g AS (SELECT doc_id, ${gramsExpr(n)} AS grams FROM tk),
       |bg AS (SELECT DISTINCT unnest(grams) AS gram FROM g
       |       WHERE doc_id % $benchMod = 0),
       |seeds AS (SELECT DISTINCT dg.doc_id
       |          FROM (SELECT doc_id, unnest(grams) AS gram FROM g) dg
       |          JOIN bg USING (gram)),
       |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
       |          UNION SELECT doc_b AS src, doc_a AS dst FROM pairs),
       |reach(doc_id, depth) AS (
       |  SELECT doc_id, 0 AS depth FROM seeds
       |  UNION
       |  SELECT e.dst AS doc_id, reach.depth + 1 FROM reach
       |  JOIN edges e ON e.src = reach.doc_id
       |  WHERE reach.depth < $maxDepth)
       |SELECT doc_id, CAST(min(depth) AS INT) AS depth FROM reach
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Twin of [[graft.ops.TextOps.bpeMerges]] — the full training loop
    * unrolled as a CTE chain (the kmeansChain pattern): per round, pair
    * stats over the word table (lead() adjacency), argmax with the
    * pinned lexicographic tie-break, and the greedy replacement spelled
    * in its CHAIN-PARITY form (islands of consecutive candidate
    * positions via i − row_number(); keep odd offsets) — provably the
    * same non-overlapping merge as the engine's left-to-right fold. */
  def bpeMerges(numMerges: Int): String = {
    val rounds = bpeRounds(numMerges)
    val tail = (1 to numMerges)
      .map(k => s"SELECT $k AS merge_rank, l AS lhs, r AS rhs, cnt AS freq FROM b$k")
      .mkString("\nUNION ALL\n")
    s"""WITH ${bpePrelude(rounds)}
       |$tail
       |ORDER BY merge_rank""".stripMargin
  }

  /** Twin of [[graft.ops.TextOps.bpeEncode]]: the same unrolled chain,
    * finished by the vocab-sized word→subword join + per-doc sums. */
  def bpeEncode(numMerges: Int): String =
    s"""WITH ${bpePrelude(bpeRounds(numMerges))},
       |dt AS (SELECT doc_id, unnest($toks) AS word FROM documents),
       |sw AS (SELECT doc_id, count(*)::INT AS n_tokens,
       |    sum(len(syms))::BIGINT AS n_subwords
       |  FROM dt JOIN w$numMerges USING (word) GROUP BY 1)
       |SELECT d.doc_id, coalesce(n_tokens, 0) AS n_tokens,
       |  CAST(coalesce(n_subwords, 0) AS BIGINT) AS n_subwords
       |FROM documents d LEFT JOIN sw USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin

  private def bpeRounds(numMerges: Int): String = {
    (1 to numMerges).map { k =>
      val p = k - 1
      s"""ex$k AS (SELECT word, freq, unnest(range(1, len(syms) + 1)) AS i,
         |    unnest(syms) AS sym FROM w$p),
         |nx$k AS MATERIALIZED (SELECT word, freq, i, sym,
         |    lead(sym) OVER (PARTITION BY word ORDER BY i) AS nxt FROM ex$k),
         |b$k AS MATERIALIZED (SELECT sym AS l, nxt AS r, sum(freq)::BIGINT AS cnt
         |  FROM nx$k WHERE nxt IS NOT NULL GROUP BY 1, 2
         |  ORDER BY cnt DESC, l, r LIMIT 1),
         |cd$k AS (SELECT n.word, n.i FROM nx$k n
         |  JOIN b$k b ON n.sym = b.l AND n.nxt = b.r),
         |is$k AS (SELECT word, i,
         |    i - row_number() OVER (PARTITION BY word ORDER BY i) AS g
         |  FROM cd$k),
         |kp$k AS MATERIALIZED (SELECT word, i FROM (
         |    SELECT word, i, row_number() OVER (PARTITION BY word, g
         |                                       ORDER BY i) AS rj FROM is$k)
         |  WHERE rj % 2 = 1),
         |w$k AS MATERIALIZED (SELECT n.word, n.freq,
         |    list(CASE WHEN k1.i IS NOT NULL THEN n.sym || n.nxt
         |         ELSE n.sym END ORDER BY n.i) AS syms
         |  FROM nx$k n
         |  LEFT JOIN kp$k k1 ON k1.word = n.word AND k1.i = n.i
         |  LEFT JOIN kp$k k2 ON k2.word = n.word AND k2.i = n.i - 1
         |  WHERE k2.i IS NULL
         |  GROUP BY n.word, n.freq)""".stripMargin
    }.mkString(",\n")
  }

  private def bpePrelude(rounds: String): String =
    s"""wf AS (SELECT word, count(*)::BIGINT AS freq
       |  FROM (SELECT unnest($toks) AS word FROM documents) GROUP BY 1),
       |w0 AS (SELECT word, freq,
       |    list_append(list_transform(range(1, len(word) + 1),
       |                               i -> word[i]), '_') AS syms
       |  FROM wf),
       |$rounds""".stripMargin

  /** Twin of [[graft.ops.TextOps.kneserNeyBigrams]]: identical integer
    * inputs and pinned arithmetic order; every probability rounded to
    * 9 dp on both engines. */
  def kneserNeyBigrams(d: Double): String =
    s"""WITH tk AS (SELECT $toks AS toks FROM documents),
       |bg AS (SELECT unnest(list_transform(range(1, len(toks)),
       |           i -> struct_pack(w1 := toks[i], w2 := toks[i+1]))) AS b
       |       FROM tk WHERE len(toks) >= 2),
       |c AS (SELECT b.w1 AS w1, b.w2 AS w2, count(*)::BIGINT AS c
       |      FROM bg GROUP BY 1, 2),
       |s1 AS (SELECT w1, sum(c)::BIGINT AS tot1, count(*)::BIGINT AS n1fwd
       |       FROM c GROUP BY 1),
       |s2 AS (SELECT w2, count(*)::BIGINT AS n1bwd FROM c GROUP BY 1),
       |bt AS (SELECT CAST(count(*) AS DOUBLE) AS b FROM c)
       |SELECT w1, w2, c,
       |  round(n1bwd / b, 9) AS p_cont,
       |  round($d * n1fwd / tot1, 9) AS lambda,
       |  round(greatest(c - $d, 0.0) / tot1
       |        + ($d * n1fwd / tot1) * (n1bwd / b), 9) AS p_kn
       |FROM c JOIN s1 USING (w1) JOIN s2 USING (w2) CROSS JOIN bt
       |ORDER BY w1, w2""".stripMargin

  /** Twin of [[graft.ops.TextOps.sftPairs]]: the same one-window
    * adjacency pairing over the derived transcripts — string_agg with an
    * explicit running frame for the context render, lead() for the
    * (next_role, next_turn, response) adjacency gate. */
  def sftPairs: String =
    s"""WITH t AS (${graft.sources.Transcripts.sqlFromDocuments}),
       |w AS (SELECT conv_id, turn_idx, role, text,
       |    string_agg(role || ': ' || text, chr(10)) OVER (
       |      PARTITION BY conv_id ORDER BY turn_idx
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS context,
       |    lead(role) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS next_role,
       |    lead(turn_idx) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS next_turn,
       |    lead(text) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS response
       |  FROM t)
       |SELECT conv_id, turn_idx, text AS prompt, context, response
       |FROM w
       |WHERE role = 'user' AND next_role = 'assistant'
       |  AND next_turn = turn_idx + 1
       |ORDER BY conv_id, turn_idx""".stripMargin

  /** Twin of [[graft.ops.TextOps.convPrefixGroups]]: rank turns per
    * conversation, md5 the '#'-joined first-k texts, report groups ≥ 2.
    * `transcriptsSql` must yield (conv_id, turn_idx, text). */
  def convPrefixGroups(transcriptsSql: String, k: Int): String =
    s"""WITH t AS ($transcriptsSql),
       |rk AS (SELECT conv_id, text,
       |         row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx) AS rn
       |       FROM t),
       |fp AS (SELECT conv_id, count(*) AS n,
       |         md5(string_agg(text, '#' ORDER BY rn)) AS prefix_fp
       |       FROM rk WHERE rn <= $k GROUP BY conv_id),
       |ok AS (SELECT conv_id, prefix_fp FROM fp WHERE n = $k),
       |sz AS (SELECT prefix_fp, count(*)::BIGINT AS group_size
       |       FROM ok GROUP BY prefix_fp)
       |SELECT conv_id, prefix_fp, group_size FROM ok JOIN sz USING (prefix_fp)
       |WHERE group_size >= 2 ORDER BY conv_id""".stripMargin

  /** Twin of [[graft.ops.Dedup.keepBestByQuality]]: the components twin
    * and the quality twin as nested CTE bodies, then the keep window
    * (quality_score DESC, doc_id ASC). */
  def dedupKeepBest(pairsSql: String): String =
    s"""WITH comp AS (${dedupComponents(pairsSql)}),
       |q AS ($quality)
       |SELECT doc_id, rep, quality_score,
       |       row_number() OVER (PARTITION BY rep
       |         ORDER BY quality_score DESC, doc_id ASC) = 1 AS keep
       |FROM comp JOIN q USING (doc_id)
       |ORDER BY doc_id""".stripMargin

  /** Twin of [[graft.ops.TextOps.unigramEncode]]: identical pinned vocab
    * (chars + minCount-pruned 2..L-grams, 9-dp log-probs), the Viterbi
    * forward pass unrolled as one CTE per position (the bpeMerges
    * unrolled-chain idiom — d_j picks each word's best edge into j by
    * (score DESC, start ASC), ≡ the engine's array_max(score, pieceLen)),
    * and the backtrack unrolled as maxWordLen hop CTEs. */
  def unigramEncode(minCount: Long, maxPieceLen: Int, maxWordLen: Int): String = {
    val dpRounds = (1 to maxWordLen).map { j =>
      val prev = if (j == 1) "d0" else s"a${j - 1}"
      // MATERIALIZED (the bpeMerges chain idiom): a_j is referenced by
      // both d_{j+1} and a_{j+1} — inlining would expand 2^maxWordLen×
      s"""d$j AS MATERIALIZED (SELECT word, j, best, back FROM (
         |  SELECT e.word, e.j, d.best + e.logp AS best, e.i AS back,
         |         row_number() OVER (PARTITION BY e.word
         |           ORDER BY d.best + e.logp DESC, e.i ASC) AS rn
         |  FROM e JOIN $prev d ON d.word = e.word AND d.j = e.i
         |  WHERE e.j = $j) WHERE rn = 1),
         |a$j AS MATERIALIZED (SELECT * FROM $prev UNION ALL SELECT * FROM d$j)"""
        .stripMargin
    }.mkString(",\n")
    val dall = s"a$maxWordLen"
    val btRounds = (1 to maxWordLen).map { s =>
      s"""bt$s AS (SELECT b.word,
         |  CASE WHEN b.pos > 0 THEN d.back ELSE b.pos END AS pos,
         |  CASE WHEN b.pos > 0 THEN concat(
         |         substr(b.word, d.back + 1, b.pos - d.back),
         |         CASE WHEN b.pieces = '' THEN '' ELSE '${"|"}' END, b.pieces)
         |       ELSE b.pieces END AS pieces,
         |  CASE WHEN b.pos > 0 THEN b.np + 1 ELSE b.np END AS np
         |FROM bt${s - 1} b LEFT JOIN $dall d
         |  ON d.word = b.word AND d.j = b.pos)""".stripMargin
    }.mkString(",\n")
    s"""WITH $corpusCte, $tkCte,
       |w AS (SELECT unnest(toks) AS word FROM tk),
       |wf AS MATERIALIZED (SELECT * FROM (SELECT word, count(*)::BIGINT AS freq
       |       FROM w GROUP BY word) WHERE length(word) <= $maxWordLen),
       |cand AS MATERIALIZED (SELECT word, freq, ss.s, ll.l,
       |           substr(word, ss.s + 1, ll.l) AS piece
       |         FROM wf
       |         CROSS JOIN generate_series(0, ${maxWordLen - 1}) ss(s)
       |         CROSS JOIN generate_series(1, $maxPieceLen) ll(l)
       |         WHERE ss.s + ll.l <= length(word)),
       |vocab AS (SELECT piece, sum(freq) AS w FROM cand GROUP BY piece
       |          HAVING length(piece) = 1 OR sum(freq) >= $minCount),
       |t AS (SELECT sum(w) AS t FROM vocab),
       |lp AS (SELECT piece,
       |         round(ln(CAST(w AS DOUBLE) / CAST(t.t AS DOUBLE)), 9) AS logp
       |       FROM vocab CROSS JOIN t),
       |e AS MATERIALIZED (SELECT c.word, CAST(c.s AS INT) AS i,
       |             CAST(c.s + c.l AS INT) AS j, lp.logp
       |      FROM cand c JOIN lp USING (piece)),
       |d0 AS (SELECT word, 0 AS j, CAST(0 AS DOUBLE) AS best, -1 AS back FROM wf),
       |$dpRounds,
       |bt0 AS (SELECT word, CAST(length(word) AS INT) AS pos,
       |               CAST('' AS VARCHAR) AS pieces, 0 AS np FROM wf),
       |$btRounds
       |SELECT f.word, f.pieces, CAST(f.np AS INT) AS n_pieces,
       |       round(d.best, 6) AS logp
       |FROM bt$maxWordLen f JOIN $dall d
       |  ON d.word = f.word AND d.j = length(f.word)
       |ORDER BY f.word""".stripMargin
  }

  /** Twin of [[graft.ops.HeavyHitters.topTermsSketched]] — the sketch
    * path is PROVEN exact (or fails loudly), so the twin is simply the
    * exact token-frequency top-k with the same (freq DESC, term ASC)
    * tie. */
  def topTermsSketched(k: Int): String =
    s"""WITH $corpusCte, $tkCte,
       |w AS (SELECT unnest(toks) AS term FROM tk),
       |f AS (SELECT term, count(*)::BIGINT AS freq FROM w GROUP BY term),
       |r AS (SELECT term, freq,
       |        row_number() OVER (ORDER BY freq DESC, term ASC) AS rnk
       |      FROM f)
       |SELECT CAST(rnk AS INT) AS "rank", term, freq
       |FROM r WHERE rnk <= $k ORDER BY rnk""".stripMargin

  /** Twin of [[graft.ops.TextOps.wordpieceEncode]] — same two-namespace
    * pinned vocab (word-initial vs continuation counts, single-char
    * floor), the greedy longest-match scan unrolled as one MATERIALIZED
    * round per possible cursor advance (≤ maxWordLen — every advance
    * consumes ≥ 1 char; `pick` pre-resolves the longest valid piece per
    * (word, position) so each round is a single deterministic join). */
  def wordpieceEncode(minCount: Long, maxPieceLen: Int, maxWordLen: Int): String = {
    val rounds = (1 to maxWordLen).map { j =>
      s"""g$j AS MATERIALIZED (SELECT g.word,
         |  CASE WHEN g.pos < length(g.word) THEN g.pos + p.l ELSE g.pos END AS pos,
         |  CASE WHEN g.pos < length(g.word) THEN concat(g.pieces,
         |         CASE WHEN g.pieces = '' THEN '' ELSE '${"|"}' END,
         |         CASE WHEN g.pos > 0 THEN '##' ELSE '' END, p.piece)
         |       ELSE g.pieces END AS pieces,
         |  CASE WHEN g.pos < length(g.word) THEN g.np + 1 ELSE g.np END AS np
         |FROM g${j - 1} g LEFT JOIN pick p
         |  ON p.word = g.word AND p.s = g.pos)""".stripMargin
    }.mkString(",\n")
    s"""WITH $corpusCte, $tkCte,
       |w AS (SELECT unnest(toks) AS word FROM tk),
       |wf AS MATERIALIZED (SELECT * FROM (SELECT word, count(*)::BIGINT AS freq
       |       FROM w GROUP BY word) WHERE length(word) <= $maxWordLen),
       |cand AS MATERIALIZED (SELECT word, freq, ss.s, ll.l,
       |           substr(word, ss.s + 1, ll.l) AS piece,
       |           ss.s > 0 AS cont
       |         FROM wf
       |         CROSS JOIN generate_series(0, ${maxWordLen - 1}) ss(s)
       |         CROSS JOIN generate_series(1, $maxPieceLen) ll(l)
       |         WHERE ss.s + ll.l <= length(word)),
       |vocab AS (SELECT piece, cont FROM cand GROUP BY piece, cont
       |          HAVING length(piece) = 1 OR sum(freq) >= $minCount),
       |pick AS MATERIALIZED (SELECT word, s, l, piece FROM (
       |         SELECT c.word, c.s, c.l, c.piece,
       |                row_number() OVER (PARTITION BY c.word, c.s
       |                                   ORDER BY c.l DESC) AS rn
       |         FROM cand c JOIN vocab USING (piece, cont)) WHERE rn = 1),
       |g0 AS (SELECT word, 0 AS pos, CAST('' AS VARCHAR) AS pieces, 0 AS np
       |       FROM wf),
       |$rounds
       |SELECT word, pieces, CAST(np AS INT) AS n_pieces
       |FROM g$maxWordLen
       |ORDER BY word""".stripMargin
  }

  /** Twin of [[graft.ops.Dedup.bloomDedup]] over the gate's incoming
    * batch (docs ≡ 0 mod 4 verbatim = true dups, ≡ 1 mod 4 with ' novel'
    * appended = novel). The twin verifies filter SEMANTICS set-wise — a
    * probe hits iff every double-hashed position is in the corpus's
    * set-bit position set, which is the bitset test by construction (the
    * word encoding itself is spec-tested). */
  def bloomDedup(mBits: Int, kHashes: Int): String = {
    val is = (0 until kHashes).map(i => s"($i)").mkString(", ")
    s"""WITH $corpusCte, $tkCte,
       |fps AS (SELECT doc_id, md5(array_to_string(toks, ' ')) AS fp FROM tk),
       |inc AS (SELECT doc_id, text FROM documents WHERE doc_id % 4 = 0
       |        UNION ALL
       |        SELECT doc_id, text || ' novel' FROM documents WHERE doc_id % 4 = 1),
       |ifps AS (SELECT doc_id, md5(array_to_string($toks, ' ')) AS fp
       |         FROM (SELECT doc_id, text FROM inc)),
       |i(i) AS (VALUES $is),
       |ch AS (SELECT ('0x' || substr(fp, 1, 8))::BIGINT AS h1,
       |              ('0x' || substr(fp, 9, 8))::BIGINT AS h2 FROM fps),
       |cpos AS (SELECT DISTINCT (h1 + i.i * h2) % $mBits AS p
       |         FROM ch CROSS JOIN i),
       |ih AS (SELECT doc_id, fp,
       |              ('0x' || substr(fp, 1, 8))::BIGINT AS h1,
       |              ('0x' || substr(fp, 9, 8))::BIGINT AS h2 FROM ifps),
       |probe AS (SELECT doc_id, fp,
       |            min(CASE WHEN (h1 + i.i * h2) % $mBits IN (SELECT p FROM cpos)
       |                THEN 1 ELSE 0 END) AS bloom_hit
       |          FROM ih CROSS JOIN i GROUP BY doc_id, fp),
       |ex AS (SELECT p.doc_id, p.bloom_hit,
       |              CASE WHEN EXISTS (SELECT 1 FROM fps f WHERE f.fp = p.fp)
       |              THEN 1 ELSE 0 END AS exact_dup
       |       FROM probe p)
       |SELECT doc_id, CAST(bloom_hit AS INT) AS bloom_hit,
       |       CAST(exact_dup AS INT) AS exact_dup,
       |       CAST(CASE WHEN bloom_hit = 1 AND exact_dup = 0
       |            THEN 1 ELSE 0 END AS INT) AS false_pos
       |FROM ex ORDER BY doc_id""".stripMargin
  }
}
