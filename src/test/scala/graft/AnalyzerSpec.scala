package graft

import graft.analysis.Analyzer
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

class AnalyzerSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic sampler (no scalatestplus bridge in the offline cache):
    * draw n values from a Gen with sequential seeds. */
  def samples[T](gen: Gen[T], n: Int = 200): Seq[T] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(i.toLong)))

  val golden: Seq[(String, Seq[String])] = Seq(
    ("Hello, World!", Seq("hello", "world")),
    ("  spark--SQL  42x ", Seq("spark", "sql", "42x")),
    ("", Seq.empty),
    ("!!!...???", Seq.empty),
    ("a", Seq("a")),
    ("Key-Value & FILTER!!", Seq("key", "value", "filter")),
    ("ümlaut café 北京 ok", Seq("mlaut", "caf", "ok")),
    ("a  a\tb\nc", Seq("a", "a", "b", "c")),
    ("MiXeD9cAsE0", Seq("mixed9case0")))

  test("Scala tokenizer golden cases") {
    golden.foreach { case (in, want) =>
      assert(Analyzer.tokenize(in) == want, s"input: '$in'")
    }
  }

  test("Column tokenizer matches Scala twin on golden cases") {
    val got = golden.map(_._1).toDF("text")
      .select(Analyzer.tokens($"text").as("toks"))
      .collect().map(_.getSeq[String](0).toSeq)
    golden.map(_._2).zip(got).foreach { case (want, g) => assert(g == want) }
  }

  test("property: Column tokenizer ≡ Scala tokenizer on random strings") {
    val gen = Gen.listOf(Gen.oneOf(
      Gen.alphaNumStr, Gen.oneOf(" ", ",", "--", "!", "\t", "é", "Ж", "9"),
      Gen.asciiPrintableStr)).map(_.mkString)
    val inputs = samples(gen, 300)
    val fromCol = inputs.toDF("text")
      .select(Analyzer.tokens($"text")).collect().map(_.getSeq[String](0).toSeq)
    inputs.zip(fromCol).foreach { case (s, got) =>
      assert(got == Analyzer.tokenize(s), s"input: '$s'")
    }
  }

  test("docLen equals token count") {
    val got = golden.map(_._1).toDF("text")
      .select(Analyzer.docLen($"text")).collect().map(_.getInt(0))
    assert(got.toSeq == golden.map(_._2.size))
  }

  test("tokenizer is deterministic and concat-stable") {
    samples(Gen.zip(Gen.alphaNumStr, Gen.alphaNumStr), 300).foreach {
      case (a, b) =>
        assert(Analyzer.tokenize(s"$a $b") ==
          Analyzer.tokenize(a) ++ Analyzer.tokenize(b))
    }
  }

  test("analysisChain: per-stage streams match the stage twins") {
    val corpus = Seq((0L, "Tablés and Rows"), (1L, "join filters"))
      .toDF("doc_id", "text")
    val got = Analyzer.analysisChain(corpus).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getString(3)))
      .toSeq
    def want(id: Long, text: String) = {
      val raw = Analyzer.tokenize(text)
      val folded = Analyzer.tokenize(Analyzer.foldAsciiString(text))
      val stemmed = Analyzer.tokenize(
        Analyzer.stemString(Analyzer.foldAsciiString(text)))
      raw.zipWithIndex.map { case (t, i) => (id, "1_raw", i, t) } ++
        folded.zipWithIndex.map { case (t, i) => (id, "2_folded", i, t) } ++
        stemmed.zipWithIndex.map { case (t, i) => (id, "3_stemmed", i, t) }
    }
    val expected = (want(0L, "Tablés and Rows") ++ want(1L, "join filters"))
      .sortBy(r => (r._1, r._2, r._3))
    assert(got == expected)
    // the accent splits the raw token; folding heals it; stemming strips s
    assert(got.filter(r => r._1 == 0L && r._2 == "1_raw").map(_._4) ==
      Seq("tabl", "s", "and", "rows"))
    assert(got.filter(r => r._1 == 0L && r._2 == "2_folded").map(_._4) ==
      Seq("tables", "and", "rows"))
    assert(got.filter(r => r._1 == 0L && r._2 == "3_stemmed").map(_._4) ==
      Seq("table", "and", "row"))
  }
}
