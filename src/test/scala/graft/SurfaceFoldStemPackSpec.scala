package graft

import graft.analysis.Analyzer
import graft.ops.TextOps
import org.apache.spark.sql.functions._

/** Analyzer-chain extensions (ASCII folding, minimal English stemming)
  * and greedy context-window packing: Column/Scala twin equivalence,
  * the pinned Lucene stem-rule cases, and the packing invariants. */
class SurfaceFoldStemPackSpec extends SparkSpec {
  import spark.implicits._

  test("foldAscii: Column ≡ Scala twin over the pinned charset") {
    val samples = Seq("dáta slòw", "fást scân mérge", "véctor", "ascii only",
      "ÿñç ûüî", "mixed áscii ánd plain")
    val got = samples.toDF("s")
      .select(Analyzer.foldAscii(col("s"))).as[String].collect().toSeq
    assert(got == samples.map(Analyzer.foldAsciiString))
    assert(Analyzer.foldAsciiString("dáta slòw") == "data slow")
    // idempotent: folded text refolds to itself
    assert(got.map(Analyzer.foldAsciiString) == got)
  }

  test("minimal English stem: the pinned Lucene rule cases, both twins") {
    // (input, EnglishMinimalStemFilter output): len<3 keep, final-s only,
    // u/s-before-s keeps (virus, mass), plain plural drops
    val cases = Seq("tables" -> "table", "joins" -> "join", "rows" -> "row",
      "windows" -> "window", "mass" -> "mass", "virus" -> "virus",
      "its" -> "it", "as" -> "as", "us" -> "us", "ss" -> "ss",
      "table" -> "table", "s" -> "s")
    for ((in, want) <- cases)
      assert(Analyzer.stemString(in) == want, s"stem($in)")
    // Column twin ≡ Scala twin on whole texts
    val texts = Seq("tables joins mass", "its virus windows", "no plurals here")
    val got = texts.toDF("s")
      .select(Analyzer.stemmedText(col("s"))).as[String].collect().toSeq
    assert(got == texts.map(Analyzer.stemString))
  }

  test("parser: fielded clauses — extraction, text: default field, guards") {
    import graft.search.Search
    val c = Search.parseClauses("+role:user spark -tool:tool3 conv_id:conv000007^2")
    assert(c.fieldedMust == Seq(("role", "user")))
    assert(c.fieldedNot == Seq(("tool", "tool3")))
    assert(c.fieldedShould == Seq(("conv_id", "conv000007")))
    assert(c.fieldedBoost(("conv_id", "conv000007")) == 2.0)
    assert(c.should == Seq("spark"))
    // text: is the default field — body continues through the normal path
    val t = Search.parseClauses("text:spark +text:me*ge")
    assert(!t.hasFielded && t.should == Seq("spark") && t.mustGroups.size == 1)
    // quoted bodies never parse as fielded
    assert(!Search.parseClauses("\"role:user\"").hasFielded)
    // wildcard in a fielded value fails loudly (StrField — no analysis)
    intercept[IllegalArgumentException](Search.parseClauses("role:us*r"))
    // must-over-should dedupe + not side
    val d = Search.parseClauses("+role:user role:user -role:user")
    assert(d.fieldedMust == Seq(("role", "user")) && d.fieldedShould.isEmpty &&
      d.fieldedNot == Seq(("role", "user")))
  }

  test("frange: bounds, inclusivity flags, and loud failures") {
    import graft.search.FilterQuery
    val df = Seq((1L, 10), (2L, 50), (3L, 90)).toDF("doc_id", "dl")
    def ids(fq: String): Seq[Long] =
      df.where(FilterQuery.parse(fq)).select("doc_id").as[Long].collect().toSeq.sorted
    // recip(dl,1,10,10) = 10/(dl+10): dl=10→0.5, 50→0.1667, 90→0.1
    assert(ids("{!frange l=0.1 u=0.2}recip(dl,1,10,10)") == Seq(2L, 3L))
    assert(ids("{!frange l=0.1 u=0.2 incl=false}recip(dl,1,10,10)") == Seq(2L))
    assert(ids("{!frange u=0.3}recip(dl,1,10,10)") == Seq(2L, 3L))
    assert(ids("{!frange l=0.15}recip(dl,1,10,10)") == Seq(1L, 2L))
    intercept[IllegalArgumentException](FilterQuery.parse("{!frange}dl"))
    intercept[IllegalArgumentException](FilterQuery.parse("{!frange lo=1}dl"))
    intercept[IllegalArgumentException](FilterQuery.parse("{!frange l=x}dl"))
  }

  test("lineDedup: global first-occurrence wins, counts, rebuild order") {
    val docs = Seq(
      (0L, "a b c d e f g h i j k l"),          // spans: [a..j], [k l]
      (1L, "a b c d e f g h i j z z z z z z z z z z"), // first span dups doc 0
      (2L, "unique tokens only here p q r s t u"))
      .toDF("doc_id", "text")
    val got = TextOps.lineDedup(docs, 10).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3))).toSeq
    assert(got == Seq(
      (0L, 2, 2, "a b c d e f g h i j k l"),
      (1L, 2, 1, "z z z z z z z z z z"),
      (2L, 1, 1, "unique tokens only here p q r s t u")))
  }

  test("packGreedy: budget, ordering, and oversized-turn invariants") {
    // conv a: 50+60 fit 128, 30 opens bin 1, 200 oversized → own bin 2,
    // 10 opens bin 3 (greedy never looks back). conv b: single turn.
    val t = Seq(
      ("a", 0, "user", ("w " * 50).trim, null.asInstanceOf[String], null.asInstanceOf[java.sql.Timestamp]),
      ("a", 1, "assistant", ("w " * 60).trim, null.asInstanceOf[String], null.asInstanceOf[java.sql.Timestamp]),
      ("a", 2, "user", ("w " * 30).trim, null.asInstanceOf[String], null.asInstanceOf[java.sql.Timestamp]),
      ("a", 3, "assistant", ("w " * 200).trim, null.asInstanceOf[String], null.asInstanceOf[java.sql.Timestamp]),
      ("a", 4, "user", ("w " * 10).trim, null.asInstanceOf[String], null.asInstanceOf[java.sql.Timestamp]),
      ("b", 0, "user", ("w " * 5).trim, null.asInstanceOf[String], null.asInstanceOf[java.sql.Timestamp]))
      .toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
    val got = TextOps.packGreedy(t, 128).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getInt(3))).toSeq
    assert(got == Seq(("a", 0, 50, 0), ("a", 1, 60, 0), ("a", 2, 30, 1),
      ("a", 3, 200, 2), ("a", 4, 10, 3), ("b", 0, 5, 0)))
    // invariants on a wider synthetic corpus: bins are consecutive from 0
    // per conv; every multi-turn bin's dl sum ≤ budget; turn order is
    // non-decreasing in bin
    val syn = graft.sources.Transcripts.synthetic(spark, 60)
    val p = TextOps.packGreedy(syn, 64).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    p.groupBy(_._1).foreach { case (conv, rows) =>
      val byTurn = rows.sortBy(_._2)
      val bins = byTurn.map(_._4)
      assert(bins.head == 0 && bins.zip(bins.tail).forall { case (a, b) =>
        b == a || b == a + 1 }, s"$conv bins not consecutive: ${bins.toSeq}")
      byTurn.groupBy(_._4).values.foreach { bin =>
        assert(bin.length == 1 || bin.map(_._3).sum <= 64,
          s"$conv overfull multi-turn bin: ${bin.toSeq}")
      }
    }
  }

  test("lmPerplexity: closed form, OOV penalty, empty doc, keep flag") {
    val docs = Seq(
      (0L, "a a b", "en"),     // train
      (1L, "a", "en"),         // in-domain, high-prob token
      (2L, "zz qq", "de"),     // all-OOV
      (3L, "", "de")           // tokenless
    ).toDF("doc_id", "text", "lang")
    val out = TextOps.lmPerplexity(docs, col("lang") === "en", 0.5, 1.0)
      .collect().map(r => (r.getLong(0),
        r.getInt(1), if (r.isNullAt(2)) None else Some(r.getDouble(2)),
        r.getBoolean(3))).toSeq
    // train set: c(a)=3, c(b)=1 over docs 0,1; T=4, V=2, denom=4+0.5*3=5.5
    def lp(c: Long) = math.log((c + 0.5) / 5.5)
    def r6(v: Double) = BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(0) == ((0L, 3, Some(r6(-(2 * lp(3) + lp(1)) / 3)), true)))
    assert(out(1) == ((1L, 1, Some(r6(-lp(3))), true)), s"got ${out(1)}")
    assert(out(2) == ((2L, 2, Some(r6(-lp(0))), false)))
    assert(out(3) == ((3L, 0, None, false)))
    // OOV scores strictly worse than any in-vocab token
    assert(out(2)._3.get > out(0)._3.get)
  }

  test("classifierScore ≡ independent Scala model; empty doc; threshold") {
    val rows = Seq(
      (0L, "spark spark indexes"),
      (1L, "fast analytics engine rocks"),
      (2L, ""))
    val docs = rows.toDF("doc_id", "text")
    val (buckets, seed) = (512, 7L)
    // independent reimplementation of the pinned model
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def w(g: String): Long = {
      val b = java.lang.Long.parseLong(md5hex(g).take(8), 16) % buckets
      (b * 2654435761L + seed) % 2001L - 1000L
    }
    def expected(text: String): (Int, Long, Option[Double]) = {
      val toks = Analyzer.tokenize(text)
      val grams = toks ++ toks.sliding(2).filter(_.size == 2).map(_.mkString(" "))
      val lm = grams.map(w).sum
      val sc = if (grams.isEmpty) None else Some(BigDecimal(lm / (1000.0 * grams.size))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      (grams.size, lm, sc)
    }
    val out = TextOps.classifierScore(docs, buckets, seed, threshold = 0.0)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)), r.getBoolean(4)))
    out.foreach { case (id, n, lm, sc, keep) =>
      val (en, elm, esc) = expected(rows.find(_._1 == id).get._2)
      assert((n, lm, sc) == ((en, elm, esc)), s"doc $id")
      assert(keep == esc.exists(_ >= 0.0), s"keep flag doc $id")
    }
    assert(out.find(_._1 == 2L).get._2 == 0, "empty doc has zero features")
    // a threshold above every score keeps nothing
    val none = TextOps.classifierScore(docs, buckets, seed, threshold = 1.5)
    assert(none.where(col("keep")).count() == 0)
  }

  test("dsirWeights: target-domain docs score higher; featureless doc NULL") {
    // target docs share bigrams with each other; the off-domain doc's
    // bigrams appear only in the raw corpus
    val docs = Seq(
      (0L, "spark merge spark merge", "en"),
      (1L, "spark merge window", "en"),
      (2L, "ganz anderes thema hier", "de"),
      (3L, "x", "de") // single token → no bigram features
    ).toDF("doc_id", "text", "lang")
    val out = TextOps.dsirWeights(docs, col("lang") === "en", 4096, 0.5, 0.0)
      .collect().map(r => (r.getLong(0), r.getInt(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)), r.getBoolean(3)))
    assert(out.map(_._2).toSeq == Seq(3, 2, 3, 0), "bigram counts")
    // en docs carry positive log-ratio weight, the de doc negative
    assert(out(0)._3.get > 0 && out(1)._3.get > 0 && out(2)._3.get < 0)
    assert(out.map(_._4).toSeq == Seq(true, true, false, false))
    // deterministic
    val again = TextOps.dsirWeights(docs, col("lang") === "en", 4096, 0.5, 0.0)
      .collect().map(_.toSeq).toSeq
    assert(again == out.map(t =>
      Seq[Any](t._1, t._2, t._3.getOrElse(null), t._4)).toSeq)
  }

  test("gopherRules: hand-audited per-rule booleans") {
    val docs = Seq(
      // passes all: 8 words, mean len in [3,10], all alpha, 2 stops
      (0L, "the analyzer keeps pace with all of this"),
      // stop-rule fail: only one distinct stop word
      (1L, "spark merges windows with vectors quickly again"),
      // word-len fail: mean word length < 3
      (2L, "a b c d e f"),
      // symbol fail: 2 symbols / 6 words > 0.1; alpha fail: digits
      (3L, "x1 23 45 ... 67 # the of"),
      (4L, "")) // empty → every rule false
      .toDF("doc_id", "text")
    val out = TextOps.gopherRules(docs, minWords = 5).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getBoolean(6), r.getBoolean(7),
        r.getBoolean(8), r.getBoolean(9), r.getBoolean(10), r.getBoolean(11)))
    //                    n_w  r_words r_wlen r_alpha r_sym r_stop keep
    assert(out(0) == ((0L, 8, true, true, true, true, true, true)))
    assert(out(1) == ((1L, 7, true, true, true, true, false, false)))
    assert(out(2) == ((2L, 6, true, false, true, true, false, false)))
    assert(out(3)._1 == 3L && !out(3)._5 && !out(3)._6 && !out(3)._8)
    assert(out(4) == ((4L, 0, false, false, false, false, false, false)))
  }

  test("kneserNeyBigrams: hand-computed KN probabilities; per-w1 mass identity") {
    import spark.implicits._
    val docs = Seq((0L, "a b a b c")).toDF("doc_id", "text")
    val out = TextOps.kneserNeyBigrams(docs, 0.75).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))).toMap
    // bigrams: (a,b) c=2; (b,a) c=1; (b,c) c=1; B=3, p_cont=1/3 each
    assert(out(("a", "b")) == ((2L, 0.333333333, 0.375, 0.75)))
    assert(out(("b", "a")) == ((1L, 0.333333333, 0.75, 0.375)))
    assert(out(("b", "c")) == ((1L, 0.333333333, 0.75, 0.375)))
    // mass identity over OBSERVED rows: sum p_kn = (1-lambda) + lambda*sum(p_cont)
    val byW1 = out.toSeq.groupBy(_._1._1)
    byW1.foreach { case (w1, rows) =>
      val lam = rows.head._2._3
      val lhs = rows.map(_._2._4).sum
      val rhs = (1.0 - lam) + lam * rows.map(_._2._2).sum
      assert(math.abs(lhs - rhs) < 1e-8, s"mass identity fails for $w1")
    }
    // discount must be a valid probability mass
    intercept[IllegalArgumentException](TextOps.kneserNeyBigrams(docs, 1.5))
  }

  test("bpeMerges ≡ independent reference BPE; overlap runs merge greedily left-to-right") {
    import spark.implicits._
    // reference implementation: straightforward imperative BPE
    def refBpe(words: Map[String, Long], n: Int): Seq[(Int, String, String, Long)] = {
      var tbl = words.map { case (w, f) => (w.map(_.toString) :+ "_", f) }.toSeq
      (1 to n).flatMap { it =>
        val stats = tbl.flatMap { case (s, f) =>
          s.zip(s.tail).map(p => p -> f) }
          .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
        if (stats.isEmpty) None else {
          val ((l, r), c) = stats.minBy { case ((a, b), c) => (-c, a, b) }
          tbl = tbl.map { case (s, f) =>
            val out = scala.collection.mutable.ArrayBuffer.empty[String]
            var i = 0
            while (i < s.length) {
              if (i + 1 < s.length && s(i) == l && s(i + 1) == r) {
                out += (l + r); i += 2
              } else { out += s(i); i += 1 }
            }
            (out.toIndexedSeq, f)
          }
          Some((it, l, r, c))
        }
      }
    }
    // corpus with repeat runs (aaa: overlapping (a,a) candidates) and a
    // classic low/lower/lowest family
    val docs = Seq(
      (0L, "low low low low low"), (1L, "lower lower newer newer newer"),
      (2L, "aaa aaa aaaa bb"), (3L, "newest widest lowest"))
      .toDF("doc_id", "text")
    val words = docs.as[(Long, String)].collect()
      .flatMap(t => graft.analysis.Analyzer.tokenize(t._2))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val expected = refBpe(words, 10)
    val got = TextOps.bpeMerges(docs, 10).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(got == expected, s"merge tables differ:\n got $got\n exp $expected")
    // determinism
    assert(TextOps.bpeMerges(docs, 10).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq == got)
    intercept[IllegalArgumentException](TextOps.bpeMerges(docs, 0))
  }

  test("bpeEncode: subword counts bounded by chars+1 and >= token count; merges shrink") {
    import spark.implicits._
    val docs = Seq((0L, "low lower lowest"), (1L, ""), (2L, "low low"))
      .toDF("doc_id", "text")
    def counts(n: Int) = TextOps.bpeEncode(docs, n).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
    val c4 = counts(4)
    assert(c4(1L) == ((0, 0L)), "empty doc reports (0,0)")
    val (nt, ns) = c4(0L)
    assert(nt == 3 && ns >= 3 && ns <= ("lowlowerlowest".length + 3),
      s"subword count out of bounds: $ns")
    // more merges never increase the subword count
    assert(counts(8)(0L)._2 <= ns)
  }

  test("pplBuckets: ceil-third split on the rounded-ppl rank; unscored bucket; deterministic") {
    import org.apache.spark.sql.functions.col
    // 7 scored docs (varying OOV mix → distinct ppl) + 1 empty doc
    val docs = ((0L until 7L).map(i =>
      (i, ("the " * (i + 1).toInt + "zzz " * (7 - i).toInt).trim, "en")) :+
      (7L, "", "en")).toDF("doc_id", "text", "lang")
    val out = TextOps.pplBuckets(docs, col("lang") === "en", 0.5).collect()
      .map(r => (r.getLong(0), Option(r.get(1)).map(_.toString.toDouble), r.getString(2)))
    assert(out.length == 8)
    val byBucket = out.groupBy(_._3).view.mapValues(_.length).toMap
    // N=7: head = ceil(7/3) = 3, middle = ceil(14/3) - 3 = 2, tail = 2
    assert(byBucket == Map("head" -> 3, "middle" -> 2, "tail" -> 2, "unscored" -> 1),
      s"split: $byBucket")
    assert(out.find(_._1 == 7L).get._3 == "unscored")
    // every head ppl <= every middle ppl <= every tail ppl
    def ppls(b: String) = out.filter(_._3 == b).flatMap(_._2)
    assert(ppls("head").max <= ppls("middle").min)
    assert(ppls("middle").max <= ppls("tail").min)
  }

  test("unigramEncode ≡ independent imperative Viterbi; reconstruction + tie rules") {
    // corpus engineered so multi-char pieces clear minCount: 'abcd'/'ab'/
    // 'cd' frequent, plus rare words that must fall back to chars
    val docs = (
      Seq.fill(12)("abcd ab cd") ++ Seq.fill(6)("abx cdy") :+ "zq abcdab"
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = TextOps.unigramEncode(docs, minCount = 5, maxPieceLen = 4,
      maxWordLen = 16).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getDouble(3)))
    // independent model: same pinned vocab + probs
    val words = docs.collect().flatMap(r =>
      graft.analysis.Analyzer.tokenize(r.getString(1)))
      .groupBy(identity).map { case (w, o) => (w, o.length.toLong) }
      .filter(_._1.length <= 16)
    val counts = scala.collection.mutable.Map[String, Long]()
    words.foreach { case (w, f) =>
      for (s <- 0 until w.length; l <- 1 to 4 if s + l <= w.length)
        counts(w.substring(s, s + l)) = counts.getOrElse(w.substring(s, s + l), 0L) + f
    }
    val vocab = counts.filter { case (p, c) => p.length == 1 || c >= 5 }
    val t = vocab.values.sum.toDouble
    val lp = vocab.map { case (p, c) =>
      p -> BigDecimal(math.log(c / t)).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble }
    def viterbi(w: String): (Seq[String], Double) = {
      val best = Array.fill(w.length + 1)(-1e18); best(0) = 0.0
      val back = Array.fill(w.length + 1)(-1)
      for (j <- 1 to w.length) {
        // tie rule: score DESC then start ASC → iterate i ascending, strict >
        for (i <- math.max(0, j - 4) until j) {
          val piece = w.substring(i, j)
          lp.get(piece).foreach { p =>
            if (best(i) > -1e17 && best(i) + p > best(j)) {
              best(j) = best(i) + p; back(j) = i
            }
          }
        }
      }
      val ps = scala.collection.mutable.ArrayBuffer[String]()
      var pos = w.length
      while (pos > 0) { ps.prepend(w.substring(back(pos), pos)); pos = back(pos) }
      (ps.toSeq, best(w.length))
    }
    assert(got.nonEmpty && got.map(_._1).toSet == words.map(_._1).toSet)
    got.foreach { case (w, pieces, np, logp) =>
      val (wantPs, wantLp) = viterbi(w)
      assert(pieces == wantPs.mkString("|"), s"word $w")
      assert(np == wantPs.size)
      assert(math.abs(logp - wantLp) < 5e-7, s"word $w: $logp vs $wantLp")
      assert(pieces.replace("|", "") == w) // reconstruction
    }
    // frequent collocation keeps its multi-char piece whole
    assert(got.find(_._1 == "abcd").get._2 == "abcd")
    // rare word with no frequent pieces char-falls-back where needed
    assert(got.find(_._1 == "zq").get._2 == "z|q")
    intercept[IllegalArgumentException](
      TextOps.unigramEncode(docs, minCount = 0))
    intercept[IllegalArgumentException](
      TextOps.unigramEncode(docs, minCount = 1, maxPieceLen = 20, maxWordLen = 16))
  }

  test("wordpieceEncode ≡ independent imperative greedy; namespaces + floor") {
    val docs = (
      Seq.fill(12)("abcd ab cd") ++ Seq.fill(6)("abx cdy") :+ "zq abcdab xab"
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = TextOps.wordpieceEncode(docs, minCount = 5, maxPieceLen = 4,
      maxWordLen = 16).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2)))
    // independent model: two-namespace pinned vocab (initial vs ##)
    val words = docs.collect().flatMap(r =>
      graft.analysis.Analyzer.tokenize(r.getString(1)))
      .groupBy(identity).map { case (w, o) => (w, o.length.toLong) }
      .filter(_._1.length <= 16)
    val counts = scala.collection.mutable.Map[(String, Boolean), Long]()
    words.foreach { case (w, f) =>
      for (s <- 0 until w.length; l <- 1 to 4 if s + l <= w.length) {
        val k = (w.substring(s, s + l), s > 0)
        counts(k) = counts.getOrElse(k, 0L) + f
      }
    }
    val vocab = counts.filter { case ((p, _), c) => p.length == 1 || c >= 5 }.keySet
    def greedy(w: String): Seq[String] = {
      val ps = scala.collection.mutable.ArrayBuffer[String]()
      var pos = 0
      while (pos < w.length) {
        val l = (math.min(4, w.length - pos) to 1 by -1)
          .find(l => vocab.contains((w.substring(pos, pos + l), pos > 0))).get
        ps += (if (pos > 0) "##" else "") + w.substring(pos, pos + l)
        pos += l
      }
      ps.toSeq
    }
    assert(got.nonEmpty && got.map(_._1).toSet == words.map(_._1).toSet)
    got.foreach { case (w, pieces, np) =>
      val want = greedy(w)
      assert(pieces == want.mkString("|"), s"word $w")
      assert(np == want.size)
      assert(pieces.replace("|", "").replace("##", "") == w) // reconstruction
    }
    // frequent word-initial collocation stays whole
    assert(got.find(_._1 == "abcd").get._2 == "abcd")
    // 'ab' frequent INITIALLY; in 'xab' the continuation namespace decides
    val xab = got.find(_._1 == "xab").get._2
    assert(xab == greedy("xab").mkString("|") && xab.startsWith("x|##"))
    // rare word floors to single chars
    assert(got.find(_._1 == "zq").get._2 == "z|##q")
    intercept[IllegalArgumentException](
      TextOps.wordpieceEncode(docs, minCount = 0))
  }
}
