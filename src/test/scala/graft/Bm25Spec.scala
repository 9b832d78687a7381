package graft

import graft.search.{Bm25, Search}

class Bm25Spec extends SparkSpec {
  import spark.implicits._

  /** Hand-checkable corpus: 3 docs. */
  val corpus = Seq(
    (0L, "spark spark fast"),  // dl=3, tf(spark)=2
    (1L, "spark slow slow engine"), // dl=4
    (2L, "duck duck duck"))   // dl=3
    .toDF("doc_id", "text")

  def bm25(tf: Int, dl: Int, df: Long, n: Long, avgdl: Double): Double = {
    val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    idf * tf / (tf + Bm25.K1 * (1 - Bm25.B + Bm25.B * dl / avgdl))
  }

  test("exhaustive BM25 matches hand computation") {
    val got = Search.searchCorpus(corpus, Seq(1 -> "spark"))
      .orderBy("rank").collect()
    // N=3, avgdl=10/3, df(spark)=2
    val s0 = bm25(2, 3, 2, 3, 10.0 / 3)
    val s1 = bm25(1, 4, 2, 3, 10.0 / 3)
    assert(got.map(_.getLong(2)).toSeq == Seq(0L, 1L))
    assert(math.abs(got(0).getDouble(3) - math.rint(s0 * 1e4) / 1e4) < 1e-9)
    assert(math.abs(got(1).getDouble(3) - math.rint(s1 * 1e4) / 1e4) < 1e-9)
  }

  test("absent query terms contribute nothing; unknown-only query is empty") {
    assert(Search.searchCorpus(corpus, Seq(1 -> "zzz")).count() == 0)
    val withUnknown = Search.searchCorpus(corpus, Seq(1 -> "spark zzz"))
      .orderBy("rank").collect()
    val alone = Search.searchCorpus(corpus, Seq(1 -> "spark"))
      .orderBy("rank").collect()
    assert(withUnknown.map(r => (r.getLong(2), r.getDouble(3))).toSeq ==
      alone.map(r => (r.getLong(2), r.getDouble(3))).toSeq)
  }

  test("duplicate query terms count once") {
    val a = Search.searchCorpus(corpus, Seq(1 -> "spark spark spark")).collect()
    val b = Search.searchCorpus(corpus, Seq(1 -> "spark")).collect()
    assert(a.map(r => (r.getLong(2), r.getDouble(3))).toSeq ==
      b.map(r => (r.getLong(2), r.getDouble(3))).toSeq)
  }

  test("tie-break: equal scores rank by doc_id ascending") {
    val tied = Seq((5L, "x y"), (3L, "x y"), (9L, "x y"))
      .toDF("doc_id", "text")
    val got = Search.searchCorpus(tied, Seq(1 -> "x")).orderBy("rank")
      .collect().map(_.getLong(2)).toSeq
    assert(got == Seq(3L, 5L, 9L))
  }

  test("conjunctive requires all terms") {
    val got = Search.searchCorpus(corpus, Seq(1 -> "spark fast"),
      conjunctive = true).collect()
    assert(got.map(_.getLong(2)).toSeq == Seq(0L))
    // disjunctive returns both spark docs
    val disj = Search.searchCorpus(corpus, Seq(1 -> "spark fast")).count()
    assert(disj == 2)
  }

  test("top-k truncates at k") {
    val many = (0L until 30L).map(i => (i, "common")).toDF("doc_id", "text")
    val got = Search.searchCorpus(many, Seq(1 -> "common"), k = 10).collect()
    assert(got.length == 10)
    assert(got.map(_.getLong(2)).sorted.toSeq == (0L until 10L))
  }

  test("quantizeNorms flag routes exhaustive scoring through quantized dl") {
    // 40-token doc: quantizeDl(40) = 40 cleared below bit 2 = 40? 40 =
    // 0b101000, numBits 6, shift 2 → keeps 0b1010 << 2 = 40 (exact bucket
    // edge); use 41 → 40 (lossy), so the flag visibly changes the score.
    val longDoc = (0L, ("spark " + "pad " * 40).trim) // dl = 41
    val c = Seq(longDoc, (1L, "spark quick"), (2L, "other words here"))
      .toDF("doc_id", "text")
    val exact = Search.searchCorpus(c, Seq(1 -> "spark")).orderBy("doc_id").collect()
    val quant = Search.searchCorpus(c, Seq(1 -> "spark"), quantizeNorms = true)
      .orderBy("doc_id").collect()
    assert(Bm25.quantizeDl(41) == 40)
    // N=3, avgdl exact (41+2+3)/3; df(spark)=2
    val avgdl = (41 + 2 + 3) / 3.0
    val want0 = Bm25.score(1, Bm25.quantizeDl(41), 2, 3, avgdl)
    assert(math.abs(quant.find(_.getLong(2) == 0L).get.getDouble(3) -
      math.rint(want0 * 1e4) / 1e4) < 1e-9)
    // quantized dl ≤ exact dl ⇒ score must not decrease
    assert(quant.find(_.getLong(2) == 0L).get.getDouble(3) >=
      exact.find(_.getLong(2) == 0L).get.getDouble(3))
    // short docs (< 16 tokens) are exactly representable → scores unchanged
    assert(quant.find(_.getLong(2) == 1L).get.getDouble(3) ==
      exact.find(_.getLong(2) == 1L).get.getDouble(3))
  }

  test("SmallFloat-style dl quantization flag: monotone, idempotent, exact below 16") {
    // identity on the exactly-representable range
    for (i <- 0 until 16) assert(Bm25.quantizeDl(i) == i)
    // bucket floor: decode(encode(x)) <= x, with at most 4 significant bits lost
    // monotone: encode order-preserving; idempotent: quantize(quantize(x)) == quantize(x)
    var prevQ = -1
    var prevE = -1
    for (i <- 0 until 100000) {
      val e = Bm25.intToInt4(i)
      val q = Bm25.quantizeDl(i)
      assert(q <= i, s"floor violated at $i -> $q")
      assert(i - q <= (i >> 3), s"lost more than 4 significant bits at $i -> $q")
      assert(e >= prevE, s"encode not monotone at $i")
      assert(q >= prevQ, s"quantize not monotone at $i")
      assert(Bm25.quantizeDl(q) == q, s"not idempotent at $i")
      prevQ = q; prevE = e
    }
  }
}
