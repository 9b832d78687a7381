package graft.ops

import graft.analysis.Analyzer
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline over
  * the `documents` corpus: language ID (marker-token heuristic), quality
  * scoring (length/charset/stopword ratios), token counting (whitespace /
  * analyzer / BPE-ish greedy subwords), and content fingerprinting (exact
  * and bag-of-words). Every operator is pure Column expressions (codegen,
  * no UDFs) with a DuckDB twin in [[graft.OracleOps]].
  */
object TextOps {

  /** Marker stopwords per language — the classic cheap lang-ID heuristic.
    * Tie-break priority order is pinned: en > es > de > fr. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "is", "in", "that"),
    "es" -> Seq("el", "la", "de", "que", "y", "los", "un", "por"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "fr" -> Seq("le", "la", "de", "et", "un", "que", "pas", "pour"))

  def markerHits(tokens: Column, markers: Seq[String]): Column =
    size(filter(tokens, t => array_contains(
      array(markers.map(lit): _*), t))).cast("int")

  /** (doc_id, en_hits, es_hits, de_hits, fr_hits, lang_pred) */
  def langId(corpus: DataFrame): DataFrame = {
    val toks = Analyzer.tokens(col("text"))
    val withHits = corpus.select(
      col("doc_id") +:
        LangMarkers.map { case (l, m) => markerHits(toks, m).as(s"${l}_hits") }: _*)
    val Seq(en, es, de, fr) = LangMarkers.map(l => col(s"${l._1}_hits"))
    withHits.withColumn("lang_pred",
      when(en >= es && en >= de && en >= fr && en > 0, "en")
        .when(es >= de && es >= fr && es > 0, "es")
        .when(de >= fr && de > 0, "de")
        .when(fr > 0, "fr")
        .otherwise("und"))
      .orderBy("doc_id")
  }

  /** (doc_id, n_chars, n_tokens, avg_token_len, stopword_ratio,
    *  alnum_ratio, quality_score) — the pinned quality formula:
    *  0.5·min(n_tokens/100, 1) + 0.3·alnum_ratio + 0.2·min(5·stop, 1). */
  def quality(corpus: DataFrame): DataFrame = {
    val toks = Analyzer.tokens(col("text"))
    val enMarkers = LangMarkers.head._2
    corpus.select(col("doc_id"), col("text"),
        toks.as("_toks"), markerHits(toks, enMarkers).cast("double").as("_stop"))
      .select(col("doc_id"),
        length(col("text")).cast("long").as("n_chars"),
        size(col("_toks")).cast("int").as("n_tokens"),
        when(size(col("_toks")) > 0,
          aggregate(col("_toks"), lit(0L), (acc, t) => acc + length(t))
            .cast("double") / size(col("_toks"))).otherwise(0.0)
          .as("_avg_raw"),
        when(size(col("_toks")) > 0,
          col("_stop") / size(col("_toks"))).otherwise(0.0)
          .as("_stop_raw"),
        when(length(col("text")) > 0,
          length(regexp_replace(lower(col("text")), "[^a-z0-9]", ""))
            .cast("double") / length(col("text"))).otherwise(0.0)
          .as("_alnum_raw"))
      // the score is computed from RAW ratios: building it from rounded
      // 4dp components puts it exactly on .5 rounding boundaries, where
      // Spark (rounds the shortest decimal repr) and DuckDB (rounds the
      // binary value) disagree on the last digit
      .select(col("doc_id"), col("n_chars"), col("n_tokens"),
        round(col("_avg_raw"), 4).as("avg_token_len"),
        round(col("_stop_raw"), 4).as("stopword_ratio"),
        round(col("_alnum_raw"), 4).as("alnum_ratio"),
        round(least(col("n_tokens") / 100.0, lit(1.0)) * 0.5 +
          col("_alnum_raw") * 0.3 +
          least(col("_stop_raw") * 5.0, lit(1.0)) * 0.2, 4).as("quality_score"))
      .orderBy("doc_id")
  }

  /** BPE-ish greedy subword chunking regex (≤4-char letter runs, digit
    * runs, single punctuation) — shared with the oracle verbatim. */
  final val BpeRegex = "[a-z]{1,4}|[0-9]+|[^a-z0-9\\s]"

  /** (doc_id, ws_tokens, analyzer_tokens, bpe_units) */
  def tokenCounts(corpus: DataFrame): DataFrame =
    corpus.select(col("doc_id"),
      size(filter(split(trim(col("text")), "\\s+"), t => t =!= ""))
        .cast("int").as("ws_tokens"),
      Analyzer.docLen(col("text")).as("analyzer_tokens"),
      size(regexp_extract_all(lower(col("text")), lit(BpeRegex), lit(0)))
        .cast("int").as("bpe_units"))
      .orderBy("doc_id")

  /** Sliding-window document CHUNKING — the context-window cutter of an
    * LLM-pretraining data pipeline: each document's analyzed token stream
    * is cut into windows of `chunkSize` tokens advancing by `stride`
    * (stride < chunkSize ⇒ overlapping windows). Pinned semantics: a
    * window starts at every multiple of `stride` strictly below the
    * doc's token count, trailing windows may be SHORTER than `chunkSize`
    * (kept — deterministic and twin-expressible; filter on
    * n_chunk_tokens for full-window-only consumers), and an empty doc
    * yields no chunks. Output (doc_id, chunk_idx, n_chunk_tokens,
    * chunk_text) with chunk_text the space-joined analyzed window.
    *
    * Scale shape: pure Column expressions + one generator — a map-only
    * pass, no shuffle at any corpus size; output volume is bounded by
    * ~(chunkSize/stride)× the input tokens, a constant the caller picks. */
  def chunks(corpus: DataFrame, chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize > 0, s"chunkSize must be positive (got $chunkSize)")
    require(stride > 0 && stride <= chunkSize,
      s"stride must be in [1, chunkSize] (got $stride, chunkSize=$chunkSize)")
    val nStarts = // = ceil(n / stride) over n ≥ 1: starts 0, s, 2s, … < n
      floor((size(col("_toks")) - 1) / lit(stride)).cast("int") + 1
    corpus.select(col("doc_id"), Analyzer.tokens(col("text")).as("_toks"))
      .where(size(col("_toks")) > 0)
      .select(col("doc_id"), posexplode(transform(
        sequence(lit(0), nStarts - 1),
        i => slice(col("_toks"), i * stride + 1, lit(chunkSize)))))
      .select(col("doc_id"), col("pos").cast("int").as("chunk_idx"),
        size(col("col")).cast("int").as("n_chunk_tokens"),
        array_join(col("col"), " ").as("chunk_text"))
      .orderBy("doc_id", "chunk_idx")
  }

  /** Space-joined n-gram list over the analyzed token stream (the
    * decontamination / repetition-statistic unit); docs shorter than n
    * tokens yield an empty list. */
  private def ngramList(text: Column, n: Int): Column = {
    val toks = Analyzer.tokens(text)
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => array_join(slice(toks, i, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))
  }

  /** Benchmark DECONTAMINATION — the test-set-overlap filter every
    * serious pretraining pipeline runs (the GPT-3 appendix-C shape:
    * drop/flag training docs sharing any long n-gram with an evaluation
    * set): a corpus doc is contaminated iff any of its analyzed
    * `n`-grams appears in `bench`'s n-gram set. Output one row per
    * corpus doc: (doc_id, n_gram_hits = how many DISTINCT of the doc's
    * n-grams hit, contaminated). Docs shorter than n tokens cannot hit.
    *
    * Scale shape: the benchmark side is an EVAL SET — thousands of
    * docs, not billions — so its distinct n-gram relation broadcasts;
    * the corpus side is one generator + one broadcast semi-shaped join
    * + one hash agg, no corpus-sized shuffle. (A benchmark too large to
    * broadcast degrades to a shuffle join of corpus n-grams — still
    * candidate-bounded, never all-pairs.) */
  def decontaminate(corpus: DataFrame, bench: DataFrame, n: Int = 8): DataFrame = {
    require(n > 0, s"n-gram order must be positive (got $n)")
    val benchGrams = bench
      .select(explode(ngramList(col("text"), n)).as("gram")).distinct()
    val hits = corpus
      .select(col("doc_id"), explode(ngramList(col("text"), n)).as("gram"))
      .distinct() // a doc's repeated gram counts once
      .join(broadcast(benchGrams), "gram")
      .groupBy("doc_id").agg(count(lit(1)).as("n_gram_hits"))
    corpus.select("doc_id")
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_gram_hits"), lit(0L)).as("n_gram_hits"))
      .withColumn("contaminated", col("n_gram_hits") > 0)
      .orderBy("doc_id")
  }

  /** Within-document REPETITION statistics — the Gopher-rule family's
    * duplicate-n-gram filter (Rae et al. 2021 [PUB], table A1: drop docs
    * whose duplicate n-gram fraction exceeds a threshold): per doc the
    * n-gram count, distinct count, dup_frac = (count − distinct)/count
    * (0 for docs with < n tokens), and the filter flag at `maxDupFrac`.
    * Pure per-row Column expressions — map-only, no shuffle, no UDF. */
  def repetition(corpus: DataFrame, n: Int = 3,
                 maxDupFrac: Double = 0.2): DataFrame = {
    require(maxDupFrac >= 0 && maxDupFrac <= 1,
      s"maxDupFrac must be in [0,1] (got $maxDupFrac)")
    corpus.select(col("doc_id"), ngramList(col("text"), n).as("_g"))
      .select(col("doc_id"),
        size(col("_g")).cast("int").as("n_ngrams"),
        size(array_distinct(col("_g"))).cast("int").as("n_distinct"))
      .withColumn("dup_frac",
        when(col("n_ngrams") > 0,
          round((col("n_ngrams") - col("n_distinct")).cast("double") /
            col("n_ngrams"), 4)).otherwise(0.0))
      .withColumn("flagged", col("dup_frac") > maxDupFrac)
      .orderBy("doc_id")
  }

  /** Gopher stopword list for rule 5 — the paper's own eight words. */
  final val GopherStops: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** GOPHER QUALITY RULES (Rae et al. 2021 [PUB], table A1 — the
    * document-level heuristics, each reported as its own boolean so a
    * pipeline can audit which rule dropped a doc):
    *
    *   r_words:   word count ∈ [minWords, maxWords]
    *   r_wordlen: mean word length ∈ [3, 10]
    *   r_alpha:   ≥ 80% of words contain an alphabetic character
    *   r_symbol:  symbol-to-word ratio (`#` or `...`) < 0.1
    *   r_stop:    ≥ 2 DISTINCT words from the paper's stop list
    *   keep = every rule passes.
    *
    * "Word" is whitespace-delimited over the lowercased text (the
    * paper's unit — NOT the analyzer token stream; both engines split
    * identically). The line-level rules (bullet-start / ellipsis-end
    * fractions) are out of scope for a single-turn corpus with no line
    * structure — documented, not approximated. All ratios divide exact
    * integer counts (bit-exact across engines, no libm); the 4dp rounds
    * are display-only. Map-only Column expressions, no shuffle. */
  def gopherRules(corpus: DataFrame, minWords: Int = 50,
                  maxWords: Int = 100000): DataFrame = {
    require(minWords >= 0 && maxWords >= minWords, "bad word-count bounds")
    val words = filter(split(trim(lower(col("text"))), "\\s+"), w => w =!= "")
    val base = corpus.select(col("doc_id"), words.as("_w"),
      size(regexp_extract_all(lower(col("text")), lit("#|\\.\\.\\."), lit(0)))
        .cast("int").as("_sym"))
      .select(col("doc_id"),
        size(col("_w")).cast("int").as("n_words"),
        when(size(col("_w")) > 0,
          aggregate(col("_w"), lit(0L), (a, w) => a + length(w)).cast("double")
            / size(col("_w"))).as("_mwl"),
        when(size(col("_w")) > 0,
          size(filter(col("_w"), w => w.rlike("[a-z]"))).cast("double")
            / size(col("_w"))).as("_alpha"),
        when(size(col("_w")) > 0,
          col("_sym").cast("double") / size(col("_w"))).as("_symr"),
        size(array_intersect(array_distinct(col("_w")),
          array(GopherStops.map(lit): _*))).cast("int").as("stop_distinct"))
    base.select(col("doc_id"), col("n_words"),
        round(col("_mwl"), 4).as("mean_word_len"),
        round(col("_alpha"), 4).as("alpha_ratio"),
        round(col("_symr"), 4).as("symbol_ratio"),
        col("stop_distinct"),
        (col("n_words") >= minWords && col("n_words") <= maxWords).as("r_words"),
        coalesce(col("_mwl") >= 3.0 && col("_mwl") <= 10.0, lit(false)).as("r_wordlen"),
        coalesce(col("_alpha") >= 0.8, lit(false)).as("r_alpha"),
        coalesce(col("_symr") < 0.1, lit(false)).as("r_symbol"),
        (col("stop_distinct") >= 2).as("r_stop"))
      .withColumn("keep", col("r_words") && col("r_wordlen") &&
        col("r_alpha") && col("r_symbol") && col("r_stop"))
      .orderBy("doc_id")
  }

  /** PII patterns shared VERBATIM with the oracle — kept to the
    * Java ≡ RE2-portable regex subset (character classes, +/{m,}, no
    * backrefs/lookaround) so both engines match identically. */
  final val EmailRegex = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  final val PhoneRegex = "\\+[0-9]{7,15}"

  /** PII REDACTION — the scrubbing pass of a training-data pipeline:
    * emails → `<EMAIL>`, E.164-style phone numbers → `<PHONE>`, with
    * per-doc match counts (n_emails, n_phones) BEFORE redaction so the
    * pass is auditable. Case-insensitive inputs are handled by matching
    * on the lowercased text (this engine's corpus normalization); the
    * redacted output is the lowercased text — pinned, documented.
    * Map-only Column expressions; the patterns are the portable-subset
    * constants above. */
  def redactPii(corpus: DataFrame): DataFrame = {
    val low = lower(col("text"))
    corpus.select(col("doc_id"),
      size(regexp_extract_all(low, lit(EmailRegex), lit(0)))
        .cast("int").as("n_emails"),
      size(regexp_extract_all(low, lit(PhoneRegex), lit(0)))
        .cast("int").as("n_phones"),
      regexp_replace(regexp_replace(low, EmailRegex, "<EMAIL>"),
        PhoneRegex, "<PHONE>").as("redacted"))
      .orderBy("doc_id")
  }

  /** (doc_id, fp, fp_bag): fp = md5 of the normalized token stream
    * (order-sensitive exact-dup key); fp_bag = md5 of the sorted distinct
    * token set (order- and multiplicity-insensitive near-dup key). */
  def fingerprints(corpus: DataFrame): DataFrame = {
    val toks = Analyzer.tokens(col("text"))
    corpus.select(col("doc_id"),
      md5(array_join(toks, " ")).as("fp"),
      md5(array_join(array_sort(array_distinct(toks)), " ")).as("fp_bag"))
      .orderBy("doc_id")
  }

  /** ROLLING-HASH document fingerprints (Rabin–Karp over the analyzed
    * token stream): every k-token window hashes iteratively as
    * h = (h·B + tok) mod M with per-token 24-bit md5-derived values — the
    * mod applies at EVERY step so no intermediate exceeds M·B + 2^24
    * (long-safe under ANSI mode) and the DuckDB twin can spell the
    * identical fold. The doc fingerprint is the MIN window hash
    * (winnowing-style local fingerprinting — Schleimer et al., SIGMOD
    * 2003 [PUB]: the minimum of a window-hash family is robust to
    * insertions outside the matching region, unlike the whole-doc md5).
    * Output: (doc_id, n_windows, rh_min, rh_max); docs shorter than k
    * tokens report (0, -1, -1).
    *
    * COST BOUND: each window is folded from scratch (aggregate over
    * slice), so the per-doc cost is O(n·k) hash steps, NOT the O(n) of a
    * true rolling update — fine at the default k = 3; for large k spell
    * the subtract-leading-term recurrence (precomputed B^(k−1) mod M)
    * instead. A sequential scan is not expressible as an O(n) Column HOF
    * (aggregate-with-array-append copies the accumulator per step), which
    * is why the window fold is pinned at small k. */
  def rollingFingerprints(corpus: DataFrame, k: Int = 3): DataFrame = {
    val B = 1L << 20
    val M = (1L << 31) - 1
    val th = transform(Analyzer.tokens(col("text")),
      t => conv(substring(md5(t), 1, 6), 16, 10).cast("long"))
    val n = size(col("_th"))
    val windows = transform(sequence(lit(1), n - (k - 1)),
      i => aggregate(slice(col("_th"), i, lit(k)), lit(0L),
        (h, t) => pmod(h * B + t, lit(M))))
    corpus.select(col("doc_id"), th.as("_th"))
      .select(col("doc_id"),
        when(n >= k, windows)
          .otherwise(array().cast("array<bigint>")).as("_w"))
      .select(col("doc_id"),
        size(col("_w")).as("n_windows"),
        coalesce(array_min(col("_w")), lit(-1L)).as("rh_min"),
        coalesce(array_max(col("_w")), lit(-1L)).as("rh_max"))
      .orderBy("doc_id")
  }

  /** Exact/bag duplicate groups: (fp_bag, n_docs, canonical) for groups
    * with ≥ 2 members; canonical = smallest doc_id (the survivor a dedup
    * pass would keep). */
  def dupGroups(corpus: DataFrame): DataFrame =
    fingerprints(corpus)
      .groupBy("fp_bag")
      .agg(count(lit(1)).as("n_docs"), min("doc_id").as("canonical"))
      .where(col("n_docs") >= 2)
      .orderBy("fp_bag")

  /** Deterministic STRATIFIED SAMPLING — the language-rebalancing /
    * split-assignment step of a training-data pipeline: keep a doc iff
    * md5(doc_id) mod 1000 < its stratum's per-mille rate. Hash-based (not
    * `TABLESAMPLE`/`rand()`) so the sample is (a) reproducible across
    * runs, engines, and partitionings, (b) CONSISTENT — re-running over a
    * grown corpus keeps every previously-sampled doc whose rate did not
    * drop, the property incremental pipelines need, and (c) embarrassingly
    * parallel: a pure per-row predicate pushed into the scan, no shuffle
    * at any scale. md5 (not xxhash64) so the DuckDB twin is bit-exact —
    * the same engine-pairing rule as every dedup hash here. Rates are
    * per-mille; strata keyed by `strataCol` with `defaultRate` for
    * unlisted values. */
  /** C4-style global span dedup (public C4 pipeline semantics: discard
    * every occurrence but the first of any duplicated three-sentence
    * span — here the span unit is a fixed `n`-token window, the
    * punctuation-free corpus's sentence analog): split each doc into
    * non-overlapping n-token spans, keep a span occurrence iff it is the
    * GLOBALLY first (minimum (doc_id, span_idx)) occurrence of that span
    * text, and rebuild the doc from its surviving spans in order.
    *
    * Scale shape: one shuffle keyed on the span text (the Zipf head of
    * duplicated spans spreads across partitions — each span group
    * reduces to a single min, so a million-fold duplicated span costs a
    * partial-aggregated min, not a hot task), a semi join back, and a
    * per-doc regroup. No driver state, no windows over the corpus.
    *
    * Output: (doc_id, n_spans, n_kept, text) — docs whose every span
    * lost elsewhere survive with n_kept = 0 and empty text (the caller
    * filters, as C4 does with its length floor).
    */
  def lineDedup(corpus: DataFrame, n: Int = 10): DataFrame = {
    require(n > 0, s"span length must be positive (got $n)")
    val spans = corpus
      .select(col("doc_id"), Analyzer.tokens(col("text")).as("_toks"))
      .where(size(col("_toks")) > 0)
      .select(col("doc_id"), posexplode(transform(
        sequence(lit(0), floor((size(col("_toks")) - 1) / lit(n)).cast("int")),
        i => array_join(slice(col("_toks"), i * n + 1, lit(n)), " "))))
      .select(col("doc_id"), col("pos").cast("int").as("span_idx"),
        col("col").as("span"))
    val winners = spans.groupBy("span")
      .agg(min(struct(col("doc_id"), col("span_idx"))).as("w"))
      .select(col("span"), col("w.doc_id").as("doc_id"),
        col("w.span_idx").as("span_idx"))
    val kept = spans.join(winners, Seq("span", "doc_id", "span_idx"), "left_semi")
    spans.groupBy("doc_id")
      .agg(count(lit(1)).cast("int").as("n_spans"))
      .join(kept.groupBy("doc_id")
        .agg(count(lit(1)).cast("int").as("n_kept"),
          array_join(transform(
            array_sort(collect_list(struct(col("span_idx"), col("span")))),
            x => x("span")), " ").as("text")),
        Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_spans"),
        coalesce(col("n_kept"), lit(0)).as("n_kept"),
        coalesce(col("text"), lit("")).as("text"))
      .orderBy("doc_id")
  }

  /** Greedy context-window packing — the inverse of [[chunks]]: pack each
    * conversation's turns, IN ORDER, into training sequences ("bins") of
    * at most `budget` tokens without splitting a turn. Greedy first-fit-
    * in-order (what sequence-packing pipelines actually run: concatenate
    * until the next item would overflow, then start a new bin; an
    * oversized single turn occupies its own bin). Deterministic — bin
    * assignment is a pure fold over the (turn_idx-sorted) turn lengths.
    *
    * Scale shape: ONE shuffle (groupBy conv_id); each group is one
    * conversation (≤ tens of turns — bounded by the source, never by the
    * corpus), folded by a codegen'd higher-order `aggregate`, so no
    * driver state, no window over the corpus, no UDF. At 10^12 turns the
    * plan is a hash-agg whose per-group state is O(turns-per-conv).
    *
    * Output: (conv_id, turn_idx, dl, bin), ordered. The DuckDB twin
    * ([[graft.Oracle.packGreedy]]) walks the same fold as a recursive CTE.
    */
  def packGreedy(transcripts: DataFrame, budget: Int): DataFrame = {
    require(budget > 0, s"token budget must be positive (got $budget)")
    val turns = transcripts.select(col("conv_id"),
      struct(col("turn_idx"), Analyzer.docLen(col("text")).as("dl")).as("t"))
    val init = struct(lit(0).as("bin"), lit(0).as("acc"),
      array().cast("array<struct<turn_idx:int,dl:int,bin:int>>").as("out"))
    turns.groupBy("conv_id")
      .agg(array_sort(collect_list(col("t"))).as("ts"))
      .select(col("conv_id"), explode(aggregate(col("ts"), init,
        (st, x) => {
          // overflow only once the bin is non-empty: the first turn (and
          // any oversized turn) always lands, opening its own bin
          val over = st("acc") > 0 && st("acc") + x("dl") > lit(budget)
          val bin = when(over, st("bin") + 1).otherwise(st("bin"))
          struct(bin.as("bin"),
            when(over, x("dl")).otherwise(st("acc") + x("dl")).as("acc"),
            concat(st("out"), array(struct(x("turn_idx").as("turn_idx"),
              x("dl").as("dl"), bin.as("bin")))).as("out"))
        },
        st => st("out"))).as("p"))
      .select(col("conv_id"), col("p.turn_idx"), col("p.dl"), col("p.bin"))
      .orderBy("conv_id", "turn_idx")
  }

  /** Temperature-based source mixing (the public multilingual-pretraining
    * resampling rule: sample sources ∝ p^α, α = 1/T — XLM-R/mT5 shape):
    * derive per-stratum Bernoulli keep-rates from the strata's own
    * frequencies so the KEPT distribution follows p_i^α, with the rarest
    * stratum kept whole (no upsampling):
    *   rate_i = ⌊1000 · (c_min / c_i)^(1−α) + 1e-9⌋ per-mille,
    * then the same deterministic md5(doc_id) per-mille filter as
    * [[stratifiedSample]]. The 1e-9 guard pins the floor against ULP
    * drift between the engine's and the oracle's libm pow. α = 1 is
    * proportional (every rate 1000); α → 0 approaches uniform-by-stratum.
    *
    * Scale shape: strata counts are one partial-agg pass (|strata| rows
    * broadcast back); the only driver state is the single min count. */
  def temperatureSample(corpus: DataFrame, strataCol: String,
                        alpha: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1] (got $alpha)")
    val counts = corpus.groupBy(strataCol).agg(count(lit(1)).as("_c"))
    val minC = counts.agg(min(col("_c"))).head().getLong(0) // O(1) driver
    val rates = counts.withColumn("rate_permille",
      floor(lit(1000.0) * pow(lit(minC.toDouble) / col("_c"),
        lit(1.0 - alpha)) + lit(1e-9)).cast("int"))
    corpus
      .join(broadcast(rates.select(col(strataCol), col("rate_permille"))),
        strataCol)
      .where(conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long") % 1000 < col("rate_permille"))
      .select(col("doc_id"), col(strataCol), col("rate_permille"))
      .orderBy("doc_id")
  }

  /** N-gram LM PERPLEXITY filter (the CCNet quality signal, Wenzek et al.
    * LREC 2020: score every document by a language model trained on an
    * in-domain reference corpus, keep the low-perplexity band): here a
    * unigram add-α LM trained on the `trainFilter` subset of the corpus
    * itself (CCNet trains on Wikipedia; the gate trains on lang='en'),
    * scoring ALL docs —
    *
    *   p(t) = (c_t + α) / (T + α·(V+1)),   log_ppl(d) = −Σ ln p(t_i) / n
    *
    * with c_t the train-set term count, T = Σ c, V = train vocab size and
    * the +1 vocab slot reserving OOV mass (an unseen token scores c=0,
    * never −∞). Output (doc_id, n_tokens, log_ppl, keep): log_ppl is
    * round(·, 6) natural-log perplexity (the keep threshold applies on
    * the log scale so neither engine exponentiates), keep = n > 0 AND
    * log_ppl ≤ threshold; a tokenless doc reports NULL log_ppl, keep
    * false.
    *
    * Scale shape: train counts are one hash agg (vocab-sized, stays
    * distributed); T and V are a 1-row collect (two driver scalars, like
    * collection stats G3); scoring is explode → term-keyed join against
    * the counts (the tf ⋈ dictionary shuffle shape — NOT broadcast, a
    * 100-TB vocab outgrows the driver) → per-doc hash agg; the corpus
    * spine left-joins back so empty docs survive. FP: Σ ln over a doc's
    * tokens is order-nondeterministic in a distributed sum — the 6dp
    * round absorbs the ≤1-ulp-per-term drift, the same contract every
    * BM25 gate relies on. */
  def lmPerplexity(corpus: DataFrame, trainFilter: Column, alpha: Double,
                   threshold: Double): DataFrame = {
    require(alpha > 0, s"alpha must be positive (got $alpha)")
    val toks = corpus.select(col("doc_id"), col("text"), trainFilter.as("_train"))
      .select(col("doc_id"), col("_train"),
        explode(Analyzer.tokens(col("text"))).as("term"))
    val counts = toks.where(col("_train")).groupBy("term")
      .agg(count(lit(1)).as("_c"))
    // T and V: O(1) driver state, the G3 collection-stats idiom
    val Array(totT, totV) = counts.agg(sum(col("_c")), count(lit(1)))
      .head().toSeq.map(v => Option(v).fold(0L)(_.asInstanceOf[Long])).toArray
    val denom = totT + alpha * (totV + 1)
    val scored = toks
      .join(counts.select(col("term"), col("_c")), Seq("term"), "left")
      .select(col("doc_id"),
        log((coalesce(col("_c"), lit(0L)) + lit(alpha)) / lit(denom)).as("_lp"))
      .groupBy("doc_id")
      .agg((-sum(col("_lp")) / count(lit(1))).as("_lppl"),
        count(lit(1)).cast("int").as("n_tokens"))
    corpus.select(col("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0)).as("n_tokens"),
        round(col("_lppl"), 6).as("log_ppl"),
        // the flag compares the ROUNDED value both engines agree on —
        // a raw-value compare could flip keep across engines at the
        // threshold boundary
        (col("_lppl").isNotNull &&
          round(col("_lppl"), 6) <= threshold).as("keep"))
      .orderBy("doc_id")
  }

  /** CCNet HEAD/MIDDLE/TAIL perplexity buckets (Wenzek et al. LREC 2020
    * §4.3 — the corpus is split into equal THIRDS by LM perplexity; the
    * head third is the highest-quality slice pipelines keep): docs are
    * ranked by (round(log_ppl, 6) ASC, doc_id ASC) — the rounded value
    * both engines agree on, doc_id pinning ties — and bucketed at the
    * ceil(N/3) / ceil(2N/3) rank boundaries; docs the LM cannot score
    * (no tokens) land in an explicit 'unscored' bucket, outside N.
    *
    * Scale shape: the ranking is ONE corpus-wide sort of a TWO-column
    * projection (log_ppl, doc_id) — the same discipline CCNet itself
    * runs (it sorts the corpus by perplexity). At 100 TB the two bucket
    * THRESHOLDS would come from a one-pass mergeable quantile sketch
    * (percentile_approx) and bucketing would be map-only; the exact-rank
    * form here is the deterministic, oracle-twinnable variant, and the
    * sorted relation is 16 bytes/doc, not the corpus. */
  def pplBuckets(corpus: DataFrame, trainFilter: Column,
                 alpha: Double): DataFrame = {
    val scored = lmPerplexity(corpus, trainFilter, alpha, 0.0)
      .select(col("doc_id"), col("log_ppl"))
    val n = scored.where(col("log_ppl").isNotNull).count()
    val h = (n + 2) / 3          // ceil(N/3)
    val m = (2 * n + 2) / 3      // ceil(2N/3)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("log_ppl").asc, col("doc_id").asc)
    val ranked = scored.where(col("log_ppl").isNotNull)
      .withColumn("_r", row_number().over(w))
      .select(col("doc_id"), col("log_ppl"),
        when(col("_r") <= h, "head")
          .when(col("_r") <= m, "middle")
          .otherwise("tail").as("bucket"))
    scored.where(col("log_ppl").isNull)
      .select(col("doc_id"), col("log_ppl"), lit("unscored").as("bucket"))
      .unionByName(ranked)
      .orderBy("doc_id")
  }

  /** DSIR importance weights (Data Selection with Importance Resampling,
    * Xie et al. NeurIPS 2023): score every document by the hashed-n-gram
    * likelihood ratio between a TARGET domain and the RAW corpus —
    *
    *   features: each analyzed bigram hashes into one of `buckets`
    *     fixed buckets (md5-derived, the cross-engine hash primitive);
    *   models:   p_b = (c_target,b + α)/(T_target + α·B) and q_b likewise
    *     over the raw corpus (add-α over the FIXED bucket space — unlike
    *     [[lmPerplexity]]'s open vocab there is no OOV slot, B is known);
    *   weight:   log w(d) = Σ_grams (ln p_b(g) − ln q_b(g)).
    *
    * keep = round(log_w, 6) ≥ threshold — a deterministic threshold in
    * lieu of the paper's Gumbel-top-k resampling (sampling noise is
    * incompatible with bit-exact cross-engine verification; the paper's
    * appendix top-k heuristic is this rule on the weight ordering).
    * Docs with < 2 tokens have no features: NULL log_w, keep false.
    *
    * Scale shape: bucket stats are ONE conditional-sum hash agg over the
    * exploded grams (both models in one pass) with ≤ B output rows — B
    * is a caller constant, so the stats BROADCAST to the scoring join
    * (unlike the perplexity dictionary, which grows with the corpus);
    * T_target/T_raw are a 1-row collect; scoring is gram-explode →
    * broadcast join → per-doc hash agg. */
  def dsirWeights(corpus: DataFrame, targetFilter: Column, buckets: Int,
                  alpha: Double, threshold: Double): DataFrame = {
    require(buckets > 0, s"buckets must be positive (got $buckets)")
    require(alpha > 0, s"alpha must be positive (got $alpha)")
    val grams = corpus
      .select(col("doc_id"), targetFilter.as("_target"),
        explode(ngramList(col("text"), 2)).as("gram"))
      .select(col("doc_id"), col("_target"),
        (conv(substring(md5(col("gram")), 1, 8), 16, 10)
          .cast("long") % buckets).as("bucket"))
    val stats = grams.groupBy("bucket").agg(
      sum(when(col("_target"), 1L).otherwise(0L)).as("_ct"),
      count(lit(1)).as("_cr"))
    val Array(tt, tr) = stats.agg(sum(col("_ct")), sum(col("_cr"))).head()
      .toSeq.map(v => Option(v).fold(0L)(_.asInstanceOf[Long])).toArray
    val (denT, denR) = (tt + alpha * buckets, tr + alpha * buckets)
    val contrib = stats.select(col("bucket"),
      (log((col("_ct") + lit(alpha)) / lit(denT)) -
        log((col("_cr") + lit(alpha)) / lit(denR))).as("_lr"))
    val scored = grams.select("doc_id", "bucket")
      .join(broadcast(contrib), "bucket") // ≤ B rows, B a caller constant
      .groupBy("doc_id")
      .agg(sum(col("_lr")).as("_lw"), count(lit(1)).cast("int").as("n_grams"))
    corpus.select(col("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_grams"), lit(0)).as("n_grams"),
        round(col("_lw"), 6).as("log_w"),
        (col("_lw").isNotNull &&
          round(col("_lw"), 6) >= threshold).as("keep"))
      .orderBy("doc_id")
  }

  /** LOGISTIC-REGRESSION classifier TRAINING (the fastText-style
    * supervised quality/domain filter a large pipeline trains ON-cluster
    * before applying it corpus-wide): full-batch gradient descent on
    * hashed token-unigram features, weak labels from the stored `lang`
    * column (y = 1 iff lang = trainLang). The scale shape is Lloyd's:
    * the model is B driver-side doubles (B a caller constant), the data
    * is only SCANNED — one cached feature relation feeds every
    * iteration, no per-iteration shuffle growth.
    *
    * Determinism contract (the k-means centroid-rounding idiom): each
    * iteration's weight update is rounded to 1e-9 —
    * w_j ← round(w_j − lr·Σ_i (p_i − y_i)x_ij / N, 9) — so the unordered
    * FP sums of both oracle engines land on the same trajectory.
    * Features x_ij = (tokens of doc i in bucket j) / |tokens of doc i|
    * (bucket = the md5-prefix hash shared with [[dsirWeights]]); w
    * starts at 0, so iteration 1 sees p ≡ 0.5. Zero-token docs carry no
    * features (p stays 0.5) but DO count in N. Output: one row per doc
    * with the final sigmoid score (6dp), the weak label, and the
    * ≥ 0.5-thresholded prediction. */
  def lrQuality(corpus: DataFrame, trainLang: String = "en",
                buckets: Int = 8, iters: Int = 3,
                lr: Double = 2.0): DataFrame = {
    require(buckets > 0 && iters > 0 && lr > 0,
      s"bad lrQuality config (buckets=$buckets, iters=$iters, lr=$lr)")
    val spark = corpus.sparkSession
    import spark.implicits._
    val n = corpus.count()
    def features(): DataFrame = corpus
      .select(col("doc_id"),
        (col("lang") === trainLang).cast("int").as("y"),
        size(Analyzer.tokens(col("text"))).as("_ntok"),
        explode(Analyzer.tokens(col("text"))).as("_tok"))
      .withColumn("bucket",
        (conv(substring(md5(col("_tok")), 1, 8), 16, 10)
          .cast("long") % buckets).as("bucket"))
      .groupBy("doc_id", "y", "bucket")
      .agg((count(lit(1)).cast("double") / first(col("_ntok"))).as("x"))
    def pFrame(x: DataFrame, w: Map[Long, Double]): DataFrame = {
      val wDf = broadcast(
        (0L until buckets).map(j => (j, w(j))).toDF("bucket", "_w"))
      x.join(wDf, "bucket")
        .groupBy("doc_id", "y")
        .agg((lit(1.0) / (lit(1.0) + exp(-sum(col("_w") * col("x")))))
          .as("p"))
    }
    val x = features().cache()
    val w =
      try {
        def round9(v: Double): Double =
          BigDecimal(v).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
        var w0 = Map.empty[Long, Double].withDefaultValue(0.0)
        (1 to iters).foreach { _ =>
          // driver boundary: ≤ B gradient rows per iteration
          val grads = x.join(pFrame(x, w0), Seq("doc_id", "y"))
            .groupBy("bucket")
            .agg((sum((col("p") - col("y")) * col("x")) / n).as("g"))
            .collect().map(r => r.getLong(0) -> r.getDouble(1))
          w0 = grads.foldLeft(w0) { case (m, (j, g)) =>
            m.updated(j, round9(m(j) - lr * g))
          }
        }
        w0
      } finally x.unpersist()
    // the returned plan re-derives features lazily (nothing cached rides
    // out; the model itself is the B broadcast weights — never the data)
    corpus.select(col("doc_id"), col("lang"))
      .join(pFrame(features(), w).drop("y"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        (col("lang") === trainLang).cast("int").as("y"),
        round(coalesce(col("p"), lit(0.5)), 6).as("p"))
      .withColumn("pred", (col("p") >= 0.5).cast("int"))
      .orderBy("doc_id")
  }

  /** SFT PAIR EXTRACTION (the canonical transcripts → instruction-tuning
    * step): each user turn followed IMMEDIATELY by an assistant turn
    * (next turn_idx = turn_idx + 1 — gaps and non-assistant followups
    * never pair) yields one training example. `prompt` is the user
    * turn's text; `context` is the dialogue up to and including the
    * prompt ("role: text" lines in turn order — the chat-template
    * render); `response` is the assistant turn. ONE window over
    * (conv_id, turn_idx) — a single shuffle by conversation at any
    * scale, no self-join; conversations are short (≤ tens of turns), so
    * the running-context frame never accumulates unbounded state. */
  def sftPairs(transcripts: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("conv_id").orderBy("turn_idx")
    transcripts
      .withColumn("context", array_join(collect_list(
        concat(col("role"), lit(": "), col("text"))).over(w), "\n"))
      .withColumn("next_role", lead("role", 1).over(w))
      .withColumn("next_turn", lead("turn_idx", 1).over(w))
      .withColumn("response", lead("text", 1).over(w))
      .where(col("role") === "user" && col("next_role") === "assistant" &&
        col("next_turn") === col("turn_idx") + 1)
      .select(col("conv_id"), col("turn_idx"), col("text").as("prompt"),
        col("context"), col("response"))
      .orderBy("conv_id", "turn_idx")
  }

  /** FIM SPAN-CORRUPTION example construction (Bavarian et al. 2022,
    * arXiv:2207.14255 PSM format; the T5 span-corruption shape with one
    * span): each doc's token stream is cut at two DETERMINISTIC points
    * (md5(doc_id#1) mod (n+1), then a second hash over the remainder —
    * the pinned stand-in for the paper's uniform draws), rendered as
    * `<PRE> prefix <SUF> suffix <MID>` input with the excised middle as
    * the target. Pure map-only Column expressions — no shuffle at any
    * corpus size; cut points ride along so both engines' geometry is
    * verified, not just the strings. */
  def fimExamples(corpus: DataFrame): DataFrame = {
    val toks = Analyzer.tokens(col("text"))
    def h(salt: String) = conv(substring(md5(
      concat(col("doc_id").cast("string"), lit(salt))), 1, 8), 16, 10)
      .cast("long")
    corpus
      .select(col("doc_id"), toks.as("_t"))
      .withColumn("n_tokens", size(col("_t")))
      .withColumn("cut_a", (h("#1") % (col("n_tokens") + 1)).cast("int"))
      .withColumn("cut_b", (col("cut_a") +
        h("#2") % (col("n_tokens") - col("cut_a") + 1)).cast("int"))
      .select(col("doc_id"), col("n_tokens"), col("cut_a"), col("cut_b"),
        concat(lit("<PRE> "),
          array_join(slice(col("_t"), lit(1), col("cut_a")), " "),
          lit(" <SUF> "),
          array_join(slice(col("_t"), col("cut_b") + 1,
            col("n_tokens") - col("cut_b")), " "),
          lit(" <MID>")).as("fim_input"),
        array_join(slice(col("_t"), col("cut_a") + 1,
          col("cut_b") - col("cut_a")), " ").as("fim_target"))
      .orderBy("doc_id")
  }

  /** Interpolated KNESER–NEY bigram LM table (Kneser & Ney 1995; the
    * Chen & Goodman 1999 interpolated form that KenLM estimates — the
    * standard n-gram LM behind CCNet-style corpus filtering). Per
    * observed bigram (w1, w2) over the analyzed token streams:
    *
    *   p_kn(w2|w1) = max(c(w1,w2) − d, 0)/c(w1·)
    *               + λ(w1) · p_cont(w2)
    *   λ(w1)    = d · N1+(w1,·) / c(w1·)      (the discount mass)
    *   p_cont(w2) = N1+(·,w2) / B              (continuation probability)
    *
    * with c(w1·) = Σ_w2 c(w1,w2), N1+(w1,·)/N1+(·,w2) the distinct
    * follower/predecessor counts and B the distinct-bigram-type total.
    * All inputs are exact integers, the arithmetic order is pinned
    * identically in the DuckDB twin, and every probability is emitted
    * ROUNDED to 9 dp (the cross-engine float contract).
    *
    * Scale shape: bigram counting is ONE explode + hash agg (the G1 tf
    * shape — map-side partial combine, shuffle on the bigram key); the
    * three stats relations (per-w1, per-w2, B) derive from the COMPACT
    * count table (vocab²-bounded, corpus-independent), so the two stats
    * joins shuffle only that table; B is a 1-row collect (O(1) driver
    * state, the G3 idiom). */
  def kneserNeyBigrams(corpus: DataFrame, d: Double): DataFrame = {
    require(d > 0 && d < 1, s"discount must be in (0,1) (got $d)")
    val toks = Analyzer.tokens(col("text"))
    val bigrams = corpus
      .select(col("doc_id"), toks.as("_t"))
      .where(size(col("_t")) >= 2)
      .select(explode(transform(sequence(lit(1), size(col("_t")) - 1),
        i => struct(element_at(col("_t"), i).as("w1"),
          element_at(col("_t"), i + 1).as("w2")))).as("_b"))
      .select(col("_b.w1").as("w1"), col("_b.w2").as("w2"))
    val c = bigrams.groupBy("w1", "w2").agg(count(lit(1)).as("c"))
    val w1Stats = c.groupBy("w1").agg(sum(col("c")).as("_tot1"),
      count(lit(1)).as("_n1fwd"))
    val w2Stats = c.groupBy("w2").agg(count(lit(1)).as("_n1bwd"))
    // B: distinct bigram types — a 1-row collect, O(1) driver state
    val b = c.agg(count(lit(1))).head().getLong(0).toDouble
    c.join(w1Stats, Seq("w1")).join(w2Stats, Seq("w2"))
      .select(col("w1"), col("w2"), col("c"),
        round(col("_n1bwd") / lit(b), 9).as("p_cont"),
        round(lit(d) * col("_n1fwd") / col("_tot1"), 9).as("lambda"),
        round(greatest(col("c") - lit(d), lit(0.0)) / col("_tot1") +
          (lit(d) * col("_n1fwd") / col("_tot1")) *
            (col("_n1bwd") / lit(b)), 9).as("p_kn"))
      .orderBy("w1", "w2")
  }

  /** BPE MERGE TRAINING (Sennrich et al. ACL 2016, arXiv:1508.07909 —
    * the tokenizer-training step of every LLM data pipeline): start from
    * per-word character sequences (+ the `_` end-of-word symbol), then
    * `numMerges` times (a) count every adjacent symbol pair weighted by
    * word frequency (the paper's get_stats — overlapping occurrences all
    * count), (b) pick the max-count pair (tie-break pinned lexicographic
    * on (lhs, rhs) — the paper leaves ties arbitrary), (c) replace its
    * non-overlapping occurrences greedily left-to-right in every word.
    *
    * GREEDY ≡ CHAIN PARITY: scanning candidates ascending and skipping
    * any candidate overlapping the previously-kept one keeps exactly the
    * odd-offset members of each maximal run of CONSECUTIVE candidate
    * positions (candidates ≥ 2 apart never conflict; within a run each
    * kept merge consumes its right neighbour). The Spark side folds the
    * scan directly; the DuckDB twin spells the parity form with window
    * functions — both provably the same replacement.
    *
    * Output: (merge_rank, lhs, rhs, freq) — the learned merge table.
    *
    * Scale shape: everything after the first aggregation operates on the
    * WORD-FREQUENCY table (vocab-sized — orders of magnitude below the
    * corpus at any scale; the reason BPE training is feasible at all);
    * per round ONE pair-count hash agg + a 1-ROW collect (the chosen
    * pair — O(numMerges) driver state, the centroid idiom) + a map-only
    * rewrite, with the word table re-materialized to temp parquet each
    * round (truncated lineage, the components idiom). */
  def bpeMerges(corpus: DataFrame, numMerges: Int): DataFrame =
    bpeTrain(corpus, numMerges)._1

  /** BPE SUBWORD ENCODING — apply the merge table [[bpeMerges]] learns to
    * the corpus itself (the tokenizer-application half of the pipeline):
    * per doc, the analyzed token count and the total subword count after
    * all `numMerges` merges. The final word table from training IS the
    * word → subword-sequence map, so encoding is one vocab-sized join
    * (shuffle keyed on `word`) + a per-doc sum — the corpus text is never
    * re-segmented. Docs with no tokens report (0, 0). */
  def bpeEncode(corpus: DataFrame, numMerges: Int): DataFrame = {
    val words = bpeTrain(corpus, numMerges)._2
      .select(col("word"), size(col("syms")).cast("long").as("_ns"))
    val perDoc = corpus
      .select(col("doc_id"), explode(Analyzer.tokens(col("text"))).as("word"))
      .join(words, Seq("word"))
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("int").as("n_tokens"),
        sum(col("_ns")).as("n_subwords"))
    corpus.select("doc_id")
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0)).as("n_tokens"),
        coalesce(col("n_subwords"), lit(0L)).as("n_subwords"))
      .orderBy("doc_id")
  }

  private def bpeTrain(corpus: DataFrame,
                       numMerges: Int): (DataFrame, DataFrame) = {
    require(numMerges > 0 && numMerges <= 64,
      s"numMerges must be in [1,64] (got $numMerges)")
    val spark = corpus.sparkSession
    def emptyInts = array().cast("array<int>")
    def pairsOf(s: Column): Column =
      when(size(s) >= 2, transform(sequence(lit(1), size(s) - 1),
        i => struct(element_at(s, i).as("l"), element_at(s, i + 1).as("r"))))
        .otherwise(array().cast("array<struct<l:string,r:string>>"))
    /** Greedy left-to-right non-overlapping replacement of (l,r) by lr. */
    def mergeOnce(s: Column, l: String, r: String): Column = {
      val cand = when(size(s) >= 2, filter(sequence(lit(1), size(s) - 1),
        i => element_at(s, i) === l && element_at(s, i + 1) === r))
        .otherwise(emptyInts)
      // fold: keep candidate i iff it starts after the last consumed slot
      val kept = aggregate(cand,
        struct(lit(0).as("e"), emptyInts.as("k")),
        (st, i) => when(i > st.getField("e"),
          struct((i + 1).as("e"),
            concat(st.getField("k"), array(i)).as("k")))
          .otherwise(st)).getField("k")
      transform(
        filter(sequence(lit(1), size(s)), j => !array_contains(kept, j - 1)),
        j => when(array_contains(kept, j),
          concat(element_at(s, j), element_at(s, j + 1)))
          .otherwise(element_at(s, j)))
    }
    var wordsPath = graft.TempDirs.create("graft_bpe_w0")
    corpus.select(explode(Analyzer.tokens(col("text"))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .select(col("word"), col("freq"),
        concat(transform(sequence(lit(1), length(col("word"))),
          i => col("word").substr(i, lit(1))),
          array(lit("_"))).as("syms"))
      .write.mode("overwrite").parquet(wordsPath)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    for (it <- 1 to numMerges) {
      val words = spark.read.parquet(wordsPath)
      // 1-row collect: the argmax pair (pinned lexicographic tie-break)
      val best = words
        .select(col("freq"), explode(pairsOf(col("syms"))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (best.nonEmpty) {
        val (l, r, cnt) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += ((it, l, r, cnt))
        val nextPath = graft.TempDirs.create(s"graft_bpe_w$it")
        words.select(col("word"), col("freq"),
          mergeOnce(col("syms"), l, r).as("syms"))
          .write.mode("overwrite").parquet(nextPath)
        wordsPath = nextPath
      }
    }
    val rows = merges.map { case (i, l, r, c) =>
      org.apache.spark.sql.Row(i, l, r, c) }
    import org.apache.spark.sql.types._
    val mergeDf = spark.createDataFrame(
      java.util.Arrays.asList(rows.toSeq: _*),
      StructType(Seq(StructField("merge_rank", IntegerType, nullable = false),
        StructField("lhs", StringType, nullable = false),
        StructField("rhs", StringType, nullable = false),
        StructField("freq", LongType, nullable = false))))
      .orderBy("merge_rank")
    (mergeDf, spark.read.parquet(wordsPath))
  }

  def stratifiedSample(corpus: DataFrame, strataCol: String,
                       rates: Map[String, Int], defaultRate: Int): DataFrame = {
    require((rates.values ++ Seq(defaultRate)).forall(r => r >= 0 && r <= 1000),
      "sampling rates are per-mille (0..1000)")
    val h = conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
      .cast("long") % 1000
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (k, v)) =>
      when(col(strataCol) === k, lit(v)).otherwise(acc) }
    corpus.where(h < rate)
      .select(col("doc_id"), col(strataCol))
      .orderBy("doc_id")
  }

  /** Deterministic corpus shuffle + shard assignment — the "shuffle and
    * shard" step a pretraining pipeline runs before writing training
    * shards (the T5/C4-style sort-by-pseudorandom-key trick: a true
    * Fisher–Yates is not distributable, sorting by a permutation-ish hash
    * key is). Key = Knuth multiplicative hash of doc_id in EXACT modular
    * arithmetic over 2^31 (every intermediate BIGINT product stays
    * < 2^63, so the identical expression runs overflow-free in any SQL
    * engine — the DuckDB twin is [[graft.OracleOps.trainShards]]);
    * doc_ids ≥ 2^31 alias into the same key space and fall back to the
    * pinned (key, doc_id) tie-break — still deterministic, still
    * well-spread. shard = key mod nShards (balanced in expectation at any
    * corpus size); `pos` and `tok_offset` are the rank and running token
    * start within the shard — exactly what a sequence-packing shard
    * writer consumes.
    *
    * Scale shape: ONE hash-partitioned window keyed by shard — the sort
    * parallelizes across shards (no global sort), each shard's rows sort
    * by an 8-byte key. At 10^12 docs pick nShards ≫ executors. */
  def trainShards(corpus: DataFrame, nShards: Int, seed: Long = 1L): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    require(seed >= 0 && seed < (1L << 31), "seed must fit the 2^31 key space")
    val W = org.apache.spark.sql.expressions.Window
    val M = 2147483648L // 2^31
    val key = ((col("doc_id") % M) * lit(2654435761L) + lit(seed)) % lit(M)
    val w = W.partitionBy("shard").orderBy(col("_key"), col("doc_id"))
    corpus
      .select(col("doc_id"), Analyzer.docLen(col("text")).as("n_tokens"))
      .withColumn("_key", key)
      .withColumn("shard", (col("_key") % nShards).cast("int"))
      .withColumn("pos", row_number().over(w).cast("int"))
      .withColumn("tok_offset",
        coalesce(sum(col("n_tokens").cast("long"))
          .over(w.rowsBetween(W.unboundedPreceding, -1)), lit(0L)))
      .select("doc_id", "shard", "pos", "n_tokens", "tok_offset")
      .orderBy("shard", "pos")
  }

  /** fastText-STYLE LINEAR QUALITY CLASSIFIER inference (Joulin et al.
    * EACL 2017, arXiv:1607.01759 "Bag of Tricks" — the quality-classifier
    * shape of the LLaMA/CCNet/GPT-3 data pipelines: score every document
    * with a linear model over hashed bag-of-ngram features and keep above
    * a threshold). Features are unigrams ++ bigrams hashed into `buckets`
    * buckets (fastText's hashing trick); the document logit is the MEAN
    * feature weight (fastText mean-pools before its linear layer); the
    * sigmoid is omitted on purpose — it is strictly monotone, so
    * thresholding the raw mean is decision-identical and saves a
    * cross-engine exp().
    *
    * The weight table is a PINNED DETERMINISTIC STAND-IN for trained
    * weights (no labeled data or training jobs exist in this sandbox —
    * the [[Multimodal]] fake-decoder precedent): w(b) =
    * ((b·2654435761 + seed) mod 2001) − 1000 ∈ [−1000, 1000] milli-units,
    * exact 64-bit modular arithmetic. Because the table is
    * hash-derivable, inference here is a PURE per-row Column fold — zero
    * shuffle at any corpus size; with a real trained table the same op is
    * one broadcast join of a ≤`buckets`-row relation (the [[dsirWeights]]
    * plan shape), which is why the bucket count, not the vocab, bounds
    * the broadcast.
    *
    * Exactness: the logit accumulates in INTEGER milli-units (`Σ w` is
    * exact in any engine); the only FP ops are one division and one
    * 6dp round. Docs with zero features score NULL and never keep.
    *
    * @return (doc_id, n_feats, logit_milli, score, keep) */
  def classifierScore(corpus: DataFrame, buckets: Int, seed: Long,
                      threshold: Double): DataFrame = {
    require(buckets > 0, s"buckets must be positive (got $buckets)")
    require(seed >= 0, s"seed must be non-negative (got $seed)")
    def w(g: Column): Column = {
      val b = conv(substring(md5(g), 1, 8), 16, 10).cast("long") % buckets
      (b * lit(2654435761L) + lit(seed)) % lit(2001L) - lit(1000L)
    }
    val grams = concat(Analyzer.tokens(col("text")), ngramList(col("text"), 2))
    corpus
      .select(col("doc_id"), grams.as("_g"))
      .select(col("doc_id"),
        size(col("_g")).cast("int").as("n_feats"),
        aggregate(col("_g"), lit(0L), (acc, g) => acc + w(g))
          .as("logit_milli"))
      .withColumn("score",
        when(col("n_feats") > 0,
          round(col("logit_milli") / (lit(1000.0) * col("n_feats")), 6)))
      .withColumn("keep",
        col("n_feats") > 0 && col("score") >= threshold)
      .orderBy("doc_id")
  }

  /** EXACT-SUBSTRING span dedup geometry (ExactSubstr semantics of Lee et
    * al., "Deduplicating Training Data Makes Language Models Better", ACL
    * 2022 [PUB]): report, per doc, the MAXIMAL token spans covered by any
    * k-token window whose text occurs ≥ 2 times ANYWHERE in the corpus
    * (a second doc or a self-repeat — both dedupe, as in the paper). The
    * paper builds a corpus-wide suffix array; the distributed re-shape is
    * the k-gram inversion the index build already uses: explode every
    * overlapping k-token window (the suffix-array match floor — a
    * duplicated substring of length ≥ k contains a duplicated k-window,
    * so coverage is EXACTLY the paper's ≥ k-token duplicated regions),
    * count occurrences with one hash-keyed groupBy, and merge surviving
    * window starts into maximal spans with per-doc gaps-and-islands
    * (windows at p, p′ merge iff p′ − p ≤ k: overlapping or exactly
    * adjacent coverage).
    *
    * Scale shape: the groupBy keys on md5(window text) — a fixed 32-char
    * key rides the shuffle instead of k tokens, and a million-fold
    * duplicated window partial-aggregates to one count per partition
    * (no hot task). The only other shuffles are the left-semi back-join
    * on the same key and the per-doc window (keyed on doc_id — bounded
    * by doc length, never corpus-wide). An md5 collision would merge two
    * distinct windows identically in both engines (the twin hashes the
    * same string), so the oracle gate stays bit-exact.
    *
    * @return (doc_id, span_start, span_end, span_tokens, n_windows) —
    *         0-based token positions, end inclusive; one row per maximal
    *         duplicated span, docs with none absent. */
  def substringSpans(corpus: DataFrame, k: Int = 8): DataFrame = {
    require(k > 0, s"window length must be positive (got $k)")
    val toks = Analyzer.tokens(col("text"))
    val grams = corpus
      .select(col("doc_id"), toks.as("_toks"))
      .where(size(col("_toks")) >= k)
      .select(col("doc_id"), posexplode(transform(
        sequence(lit(0), size(col("_toks")) - k),
        i => md5(array_join(slice(col("_toks"), i + 1, lit(k)), " ")))))
      .select(col("doc_id"), col("pos").cast("int").as("pos"),
        col("col").as("gh"))
    val dup = grams.groupBy("gh").agg(count(lit(1)).as("_n"))
      .where(col("_n") >= 2).select("gh")
    val marked = grams.join(dup, Seq("gh"), "left_semi")
    val w = Window.partitionBy("doc_id").orderBy("pos")
    marked
      .withColumn("_brk",
        when(col("pos") - lag(col("pos"), 1).over(w) <= k, 0).otherwise(1))
      .withColumn("_gid", sum(col("_brk")).over(w))
      .groupBy(col("doc_id"), col("_gid"))
      .agg(min("pos").as("span_start"),
        (max("pos") + lit(k - 1)).cast("int").as("span_end"),
        count(lit(1)).cast("int").as("n_windows"))
      .select(col("doc_id"), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + 1).cast("int")
          .as("span_tokens"),
        col("n_windows"))
      .orderBy("doc_id", "span_start")
  }

  /** Shared-prefix conversation grouping — the agent-corpus dedup shape:
    * fleets of conversations bootstrapped from identical system prompts /
    * scaffold turns. Fingerprint = md5 over the first `k` turns' RAW
    * texts in stable (conv_id, turn_idx) order, '#'-joined (the corpus
    * token alphabet cannot contain '#', so the join is collision-free);
    * only conversations with ≥ k turns participate (a shorter
    * conversation has no k-prefix); groups of ≥ 2 are reported with
    * their size. Scale shape: ONE by-conversation shuffle (the window
    * and the fingerprint agg share it), then a fingerprint-keyed size
    * agg + broadcast-able join — never all-pairs, no corpus-sized
    * driver state. */
  def convPrefixGroups(transcripts: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1 (got $k)")
    val w = Window.partitionBy("conv_id").orderBy("turn_idx")
    val fps = transcripts.select(col("conv_id"), col("turn_idx"), col("text"))
      .withColumn("_rn", row_number().over(w))
      .where(col("_rn") <= k)
      .groupBy("conv_id")
      .agg(count(lit(1)).as("_n"),
        md5(concat_ws("#",
          transform(
            array_sort(collect_list(struct(col("_rn").as("r"),
              col("text").as("t")))),
            s => s.getField("t")))).as("prefix_fp"))
      .where(col("_n") === k)
      .select("conv_id", "prefix_fp")
    val sizes = fps.groupBy("prefix_fp")
      .agg(count(lit(1)).cast("long").as("group_size"))
    fps.join(sizes, "prefix_fp").where(col("group_size") >= 2)
      .select("conv_id", "prefix_fp", "group_size")
      .orderBy("conv_id")
  }

  /** UNIGRAM-LM SUBWORD SEGMENTATION (Kudo, ACL 2018, arXiv:1804.10959 —
    * the SentencePiece unigram model's Viterbi ENCODE step; the other
    * mainstream tokenizer family next to [[bpeEncode]]): each distinct
    * corpus word splits into the maximum-likelihood piece sequence
    * argmax Σ log p(piece) under a unigram piece LM. The paper's EM vocab
    * estimation is replaced by a PINNED deterministic model (the
    * lrQuality/kmeans idiom — training stochasticity is not portable
    * across engines, the INFERENCE algorithm is the verified artifact):
    * vocab = every single character (the reachability floor the paper
    * also keeps) plus every 2..`maxPieceLen`-char substring with
    * freq-weighted occurrence count ≥ `minCount`; p(piece) = count /
    * Σ vocab counts, log-probs rounded to 9 dp in BOTH engines so DP sums
    * are bit-identical. Viterbi ties break toward the LONGER last piece
    * (array_max on (score, pieceLen) ≡ the twin's score DESC, start ASC).
    * Words longer than `maxWordLen` are excluded (pinned bound — it sizes
    * the twin's unrolled DP); production fallback is char segmentation.
    *
    * Scale shape: everything runs on the DISTINCT-WORD table (Heaps-law
    * sized, the [[bpeMerges]] contract), never the corpus: candidate
    * explode is ≤ maxWordLen·maxPieceLen rows per word, the vocab is one
    * hash agg, the DP is a pure per-row Column fold (aggregate HOF) over
    * the word's own edge list — map-only after one vocab join, no
    * iteration over the data, no driver model. Output: (word, pieces
    * '|'-joined, n_pieces, logp). */
  def unigramEncode(corpus: DataFrame, minCount: Long, maxPieceLen: Int = 4,
                    maxWordLen: Int = 16): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1 (got $minCount)")
    require(maxPieceLen >= 1 && maxPieceLen <= maxWordLen,
      s"need 1 <= maxPieceLen <= maxWordLen (got $maxPieceLen, $maxWordLen)")
    val wf = corpus
      .select(explode(Analyzer.tokens(col("text"))).as("word"))
      .groupBy("word").agg(count(lit(1)).cast("long").as("freq"))
      .where(length(col("word")) <= maxWordLen)
    val cand = wf
      .select(col("word"), col("freq"),
        explode(flatten(transform(sequence(lit(0), length(col("word")) - 1),
          s => transform(sequence(lit(1), lit(maxPieceLen)),
            l => struct(s.as("s"), l.as("l")))))).as("sl"))
      .select(col("word"), col("freq"),
        col("sl.s").as("s"), col("sl.l").as("l"))
      .where(col("s") + col("l") <= length(col("word")))
      .withColumn("piece", expr("substring(word, s + 1, l)"))
    val vocab = cand.groupBy("piece").agg(sum(col("freq")).as("w"))
      .where(length(col("piece")) === 1 || col("w") >= minCount)
    val tRel = vocab.agg(sum(col("w")).as("t"))
    val lp = vocab.crossJoin(broadcast(tRel))
      .select(col("piece"),
        round(log(col("w").cast("double") / col("t").cast("double")), 9)
          .as("logp"))
    val edges = cand.join(lp, "piece")
      .select(col("word"), col("s").cast("int").as("i"),
        (col("s") + col("l")).cast("int").as("j"), col("logp"))
      .groupBy("word")
      .agg(collect_list(struct(col("i"), col("j"), col("logp"))).as("_E"))
    val len = length(col("word"))
    val NEG = lit(-1e18)
    // Viterbi forward pass: state = (best[0..len], back[0..len])
    val init = struct(
      concat(array(lit(0.0)), array_repeat(NEG, len)).as("best"),
      array_repeat(lit(-1), len + 1).as("back"))
    val dp = aggregate(sequence(lit(1), len), init, (st, j) => {
      val cands = transform(sequence(lit(1), lit(maxPieceLen)), o => {
        val i = j - o
        val edge = try_element_at(filter(col("_E"),
          e => e.getField("i") === i && e.getField("j") === j), lit(1))
        val b = when(i >= 0 && edge.isNotNull &&
            element_at(st.getField("best"), i + 1) > lit(-1e17),
          element_at(st.getField("best"), i + 1) + edge.getField("logp"))
          .otherwise(NEG)
        struct(b.as("b"), o.as("o"))
      })
      val top = array_max(cands)
      struct(
        transform(st.getField("best"), (x, idx) =>
          when(idx === j, top.getField("b")).otherwise(x)).as("best"),
        transform(st.getField("back"), (x, idx) =>
          when(idx === j, (j - top.getField("o")).cast("int")).otherwise(x))
          .as("back"))
    })
    // backtrack: ≤ maxWordLen hops from len to 0 via back pointers
    val bt = aggregate(sequence(lit(1), lit(maxWordLen)),
      struct(len.cast("int").as("pos"),
        array().cast("array<string>").as("ps")),
      (st, _) => {
        val pos = st.getField("pos")
        val i = element_at(col("_dp").getField("back"), pos + 1)
        when(pos > 0,
          struct(i.as("pos"),
            concat(array(col("word").substr(i + 1, pos - i)),
              st.getField("ps")).as("ps")))
          .otherwise(st)
      })
    wf.join(edges, "word")
      .withColumn("_dp", dp)
      .withColumn("_bt", bt)
      .select(col("word"),
        array_join(col("_bt").getField("ps"), "|").as("pieces"),
        size(col("_bt").getField("ps")).cast("int").as("n_pieces"),
        round(element_at(col("_dp").getField("best"), len + 1), 6).as("logp"))
      .orderBy("word")
  }

  /** WORDPIECE SUBWORD SEGMENTATION (Wu et al. 2016, arXiv:1609.08144 —
    * the BERT tokenizer's greedy longest-match-first ENCODE, the third
    * mainstream tokenizer family next to [[bpeEncode]] and
    * [[unigramEncode]]): each distinct corpus word splits by repeatedly
    * taking the LONGEST vocabulary piece matching at the cursor, with
    * word-initial and continuation ("##"-marked) pieces living in
    * SEPARATE vocab namespaces, exactly BERT's vocab shape. The trained
    * vocab is replaced by the same PINNED deterministic model as
    * [[unigramEncode]] (training stochasticity is not portable; the
    * inference algorithm is the verified artifact): per namespace, every
    * single character (so the HuggingFace [UNK] branch is structurally
    * unreachable — pinned) plus every 2..`maxPieceLen`-char substring
    * with freq-weighted occurrence count ≥ `minCount` in that namespace
    * (word-initial counts come from word-start offsets only). Words
    * longer than `maxWordLen` are excluded (the bound sizes the twin's
    * unrolled greedy rounds).
    *
    * Scale shape mirrors unigramEncode: everything on the DISTINCT-WORD
    * table, candidate explode ≤ maxWordLen·maxPieceLen rows per word,
    * vocab one hash agg, the greedy scan a pure per-row Column fold over
    * the word's own valid-piece list — map-only after one vocab join.
    * Output: (word, pieces '|'-joined with '##' continuation marks,
    * n_pieces). */
  def wordpieceEncode(corpus: DataFrame, minCount: Long, maxPieceLen: Int = 4,
                      maxWordLen: Int = 16): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1 (got $minCount)")
    require(maxPieceLen >= 1 && maxPieceLen <= maxWordLen,
      s"need 1 <= maxPieceLen <= maxWordLen (got $maxPieceLen, $maxWordLen)")
    val wf = corpus
      .select(explode(Analyzer.tokens(col("text"))).as("word"))
      .groupBy("word").agg(count(lit(1)).cast("long").as("freq"))
      .where(length(col("word")) <= maxWordLen)
    val cand = wf
      .select(col("word"), col("freq"),
        explode(flatten(transform(sequence(lit(0), length(col("word")) - 1),
          s => transform(sequence(lit(1), lit(maxPieceLen)),
            l => struct(s.as("s"), l.as("l")))))).as("sl"))
      .select(col("word"), col("freq"),
        col("sl.s").as("s"), col("sl.l").as("l"))
      .where(col("s") + col("l") <= length(col("word")))
      .withColumn("piece", expr("substring(word, s + 1, l)"))
      .withColumn("cont", (col("s") > 0).cast("boolean"))
    val vocab = cand.groupBy("piece", "cont")
      .agg(sum(col("freq")).as("w"))
      .where(length(col("piece")) === 1 || col("w") >= minCount)
      .select("piece", "cont")
    // per word: the valid (start, len) pieces under the namespace rule
    val edges = cand.join(vocab, Seq("piece", "cont"))
      .select(col("word"), col("s").cast("int").as("i"),
        col("l").cast("int").as("l"))
      .groupBy("word")
      .agg(collect_list(struct(col("i"), col("l"))).as("_E"))
    val len = length(col("word"))
    // greedy longest-match fold: ≤ maxWordLen cursor advances (each ≥ 1)
    val greedy = aggregate(sequence(lit(1), lit(maxWordLen)),
      struct(lit(0).cast("int").as("pos"),
        array().cast("array<string>").as("ps")),
      (st, _) => {
        val pos = st.getField("pos")
        val lmax = array_max(transform(
          filter(col("_E"), e => e.getField("i") === pos),
          e => e.getField("l")))
        val piece = col("word").substr(pos + 1, lmax)
        val marked = when(pos > 0, concat(lit("##"), piece)).otherwise(piece)
        when(pos < len,
          struct((pos + lmax).cast("int").as("pos"),
            concat(st.getField("ps"), array(marked)).as("ps")))
          .otherwise(st)
      })
    wf.join(edges, "word")
      .withColumn("_g", greedy)
      .select(col("word"),
        array_join(col("_g").getField("ps"), "|").as("pieces"),
        size(col("_g").getField("ps")).cast("int").as("n_pieces"))
      .orderBy("word")
  }
}
