package graft

import graft.analysis.Analyzer
import graft.ops.TextOps

/** ExactSubstr span-dedup geometry (TextOps.substringSpans): handcrafted
  * merge/split/self-repeat cases plus a brute-force equivalence sweep on
  * randomized corpora (the Scala reference recomputes duplicated-window
  * coverage and island merging directly from the token arrays). */
class SubstringSpanSpec extends SparkSpec {
  import spark.implicits._

  private def run(docs: Seq[(Long, String)], k: Int): Seq[(Long, Int, Int, Int, Int)] =
    TextOps.substringSpans(docs.toDF("doc_id", "text"), k)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)))
      .toSeq

  /** Scala reference: mark every start whose k-window text occurs ≥ 2
    * times corpus-wide, then merge starts with gap ≤ k per doc. */
  private def brute(docs: Seq[(Long, String)], k: Int): Seq[(Long, Int, Int, Int, Int)] = {
    val grams = docs.flatMap { case (id, text) =>
      val t = Analyzer.tokenize(text)
      (0 to t.length - k).map(p => (id, p, t.slice(p, p + k).mkString(" ")))
    }
    val counts = grams.groupBy(_._3).view.mapValues(_.size).toMap
    docs.flatMap { case (id, _) =>
      val marked = grams.filter(g => g._1 == id && counts(g._3) >= 2)
        .map(_._2).sorted
      if (marked.isEmpty) Nil
      else {
        val islands = marked.tail.foldLeft(Vector(Vector(marked.head))) {
          (acc, p) =>
            if (p - acc.last.last <= k) acc.init :+ (acc.last :+ p)
            else acc :+ Vector(p)
        }
        islands.map(is =>
          (id, is.head, is.last + k - 1, is.last - is.head + k, is.size))
      }
    }.sortBy(r => (r._1, r._2))
  }

  test("shared 10-token span (k=4) reports one maximal span per doc; unrelated doc absent") {
    val shared = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    val docs = Seq(
      1L -> s"$shared unique-one tail-one words-one",
      2L -> s"prefix-two starts-two $shared",
      3L -> "nothing here repeats at all across the corpus today friend")
    val got = run(docs, 4)
    assert(got == Seq(
      (1L, 0, 9, 10, 7),   // windows 0..6 over the shared prefix
      (2L, 4, 13, 10, 7))) // shifted by the 4-token prefix ("prefix-two
                           // starts-two" analyzes to 4 tokens — the
                           // tokenizer splits on hyphens)
    assert(got == brute(docs, 4))
  }

  test("self-repeat within one doc dedupes; gap > k splits islands") {
    // "red blue green" repeats at positions 0 and 8 of the SAME doc,
    // separated by 5 unique tokens: two islands (gap 8 > k = 3).
    val docs = Seq(
      7L -> "red blue green one two three four five red blue green")
    val got = run(docs, 3)
    assert(got == Seq((7L, 0, 2, 3, 1), (7L, 8, 10, 3, 1)))
    assert(got == brute(docs, 3))
  }

  test("adjacent duplicated windows (gap == k) merge into one span") {
    // Doc 1 carries "a b c" then "x y z" back-to-back; docs 2 and 3 each
    // duplicate one triple — the two marked starts in doc 1 sit exactly
    // k apart and must merge into a single 6-token span.
    val docs = Seq(
      1L -> "aa bb cc xx yy zz",
      2L -> "aa bb cc other tokens here",
      3L -> "different words xx yy zz")
    val got = run(docs, 3)
    assert(got.filter(_._1 == 1L) == Seq((1L, 0, 5, 6, 2)))
    assert(got == brute(docs, 3))
  }

  test("brute-force equivalence on randomized corpora") {
    val rnd = new scala.util.Random(42)
    val vocab = Vector("ant", "bee", "cat", "dog", "emu", "fox", "gnu", "hen")
    for (trial <- 0 until 5) {
      val docs = (0L until 12L).map { id =>
        val n = 6 + rnd.nextInt(20)
        id -> Vector.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      }
      val k = 2 + trial % 3
      assert(run(docs, k) == brute(docs, k), s"trial=$trial k=$k")
    }
  }
}
