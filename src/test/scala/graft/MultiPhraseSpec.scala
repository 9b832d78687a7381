package graft

import graft.index.BuildIndexJob
import graft.search.{Bm25, IndexSearch, MultiPhrase}
import org.apache.spark.sql.functions._

/** Lucene MultiPhraseQuery over positional postings: per-slot alternative
  * unions, the singleton-slot ≡ PhraseQuery equivalence, OOV-alternative
  * drop vs dead-slot elimination, summed-alternative idf, and ordered
  * slop over unions. */
class MultiPhraseSpec extends SparkSpec {
  import spark.implicits._

  def tmp(): String = java.nio.file.Files.createTempDirectory("graftmp").toString
  def ts(i: Int) = new java.sql.Timestamp(1704067200000L + i * 1000L)

  /** doc 0: "a b", doc 1: "x b", doc 2: "a c b" (gapped), doc 3: "b a",
    * doc 4: filler. */
  lazy val idx: IndexSearch.OpenIndex = {
    val turns = Seq(
      ("c0", 0, "user", "a b q", null.asInstanceOf[String], ts(0)),
      ("c1", 0, "user", "x b q", null.asInstanceOf[String], ts(1)),
      ("c2", 0, "user", "a c b", null.asInstanceOf[String], ts(2)),
      ("c3", 0, "user", "b a q", null.asInstanceOf[String], ts(3)),
      ("c4", 0, "user", "q q q", null.asInstanceOf[String], ts(4)))
      .toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
    val root = tmp()
    BuildIndexJob.run(spark, turns, root, "mp",
      BuildIndexJob.Config(numShards = 4, blockSize = 2, storePositions = true))
    IndexSearch.open(spark, root)
  }

  def docsOf(res: org.apache.spark.sql.DataFrame, qid: Int): Seq[Long] =
    res.where(col("query_id") === qid).orderBy("rank")
      .select("doc_id").collect().map(_.getLong(0)).toSeq

  test("slot union: (a|x) b matches both union branches, ordered only") {
    val res = MultiPhrase.search(idx,
      Seq(1 -> Seq(Seq("a", "x"), Seq("b"))))
    // doc 0 via a·b, doc 1 via x·b; doc 2 gapped, doc 3 reversed — out
    assert(docsOf(res, 1).toSet == Set(0L, 1L))
  }

  test("singleton slots reproduce searchPhrase rows exactly") {
    val mp = MultiPhrase.search(idx,
      Seq(1 -> Seq(Seq("a"), Seq("b")), 2 -> Seq(Seq("b"), Seq("a"))))
      .orderBy("query_id", "rank").collect().toSeq
    val ph = IndexSearch.searchPhrase(idx, Seq(1 -> "a b", 2 -> "b a"))
      .orderBy("query_id", "rank").collect().toSeq
    assert(mp == ph && mp.nonEmpty)
  }

  test("OOV alternative drops from its slot; a fully-OOV slot kills the query") {
    val kept = MultiPhrase.search(idx,
      Seq(1 -> Seq(Seq("a", "zzzmissing"), Seq("b"))))
    assert(docsOf(kept, 1) == Seq(0L), "survives on the in-dict alternative")
    val dead = MultiPhrase.search(idx,
      Seq(1 -> Seq(Seq("zzzmissing"), Seq("b"))))
    assert(dead.count() == 0, "dead slot matches nothing")
  }

  test("idf sums EVERY in-dict alternative (hand-computed score)") {
    val res = MultiPhrase.search(idx,
      Seq(1 -> Seq(Seq("a", "x"), Seq("b"))))
      .where(col("query_id") === 1 && col("doc_id") === 0L)
      .select("score").collect()
    val n = idx.stats.nDocs
    // df: a=3 (docs 0,2,3), x=1 (doc 1), b=4 (docs 0,1,2,3)
    val idf = Bm25.idfValue(3, n) + Bm25.idfValue(1, n) + Bm25.idfValue(4, n)
    val pf = 1.0 // one chain in doc 0 (a@0 · b@1)
    val expect = idf * pf /
      (pf + Bm25.K1 * (1.0 - Bm25.B + Bm25.B * 3.0 / idx.stats.avgdl))
    assert(math.abs(res(0).getDouble(0) - expect) < 1e-4)
  }

  test("ordered slop bridges gaps over unions, never reversals") {
    val strict = MultiPhrase.search(idx, Seq(1 -> Seq(Seq("a", "x"), Seq("b"))))
    val sloppy = MultiPhrase.search(idx,
      Seq(1 -> Seq(Seq("a", "x"), Seq("b"))), slop = 1)
    assert(docsOf(strict, 1).toSet == Set(0L, 1L))
    // slop=1 admits doc 2's a·c·b; doc 3's b·a stays out (order pinned)
    assert(docsOf(sloppy, 1).toSet == Set(0L, 1L, 2L))
  }

  test("single-slot union ranks by union tf (≡ merged-postings virtual term)") {
    val res = MultiPhrase.search(idx, Seq(1 -> Seq(Seq("a", "x"))))
    // matches every doc containing a or x: 0, 1, 2, 3
    assert(docsOf(res, 1).toSet == Set(0L, 1L, 2L, 3L))
  }

  test("phrase-prefix: stem expands against the dictionary as the last slot") {
    // vocab here: a, b, c, q, x — stem '' is impossible, stem 'q' exact
    val res = MultiPhrase.searchPhrasePrefix(idx, Seq(1 -> "a b", 2 -> "b a"))
    // stem 'b' expands to {b} alone, so ≡ the exact phrases
    val ph = IndexSearch.searchPhrase(idx, Seq(1 -> "a b", 2 -> "b a"))
    assert(res.orderBy("query_id", "rank").collect().toSeq ==
      ph.orderBy("query_id", "rank").collect().toSeq)
    assert(res.count() > 0)
  }

  test("phrase-prefix: dead stem matches nothing; bare stem is a union") {
    assert(MultiPhrase.searchPhrasePrefix(idx, Seq(1 -> "a zz")).count() == 0)
    val bare = MultiPhrase.searchPhrasePrefix(idx, Seq(1 -> "q"))
    // stem 'q' → {q}: docs 0, 1, 3, 4 contain q
    assert(docsOf(bare, 1).toSet == Set(0L, 1L, 3L, 4L))
  }

  test("phrase-prefix: maxExpansions guard fails loudly") {
    // every single-letter term extends '' ... use a stem matching several:
    // build none here — the 5-term vocab has no shared prefix, so assert
    // the guard by bounding expansions below 1
    intercept[IllegalArgumentException] {
      MultiPhrase.searchPhrasePrefix(idx, Seq(1 -> "a b"), maxExpansions = 0)
    }
  }
}
