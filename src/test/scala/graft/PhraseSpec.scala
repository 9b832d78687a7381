package graft

import graft.index.BuildIndexJob
import graft.search.{BlockMaxWand, IndexSearch}
import org.apache.spark.sql.functions._

/** Exact phrase search over positional postings: adjacency semantics,
  * duplicate-term phrases, OOV self-elimination, and the single-term
  * degenerate case (≡ the plain term query). */
class PhraseSpec extends SparkSpec {
  import spark.implicits._

  def tmp(): String = java.nio.file.Files.createTempDirectory("graftphrase").toString

  /** Tiny hand-auditable corpus as one-turn transcripts. */
  lazy val idx: IndexSearch.OpenIndex = {
    val turns = Seq(
      // doc 0: "a b" twice, never "b a" (b is followed by c or ends)
      ("c0", 0, "user", "a b c a b", null.asInstanceOf[String], ts(0)),
      // doc 1: "b a" twice, never "a b" (a is followed by x or ends)
      ("c1", 0, "user", "b a x b a", null.asInstanceOf[String], ts(1)),
      // doc 2: "a a" (duplicate-term adjacency) and a lone c
      ("c2", 0, "user", "a a c", null.asInstanceOf[String], ts(2)),
      // doc 3: no a/b at all
      ("c3", 0, "user", "c c c d", null.asInstanceOf[String], ts(3)))
      .toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
    val root = tmp()
    BuildIndexJob.run(spark, turns, root, "phrase",
      BuildIndexJob.Config(numShards = 4, blockSize = 2, storePositions = true))
    IndexSearch.open(spark, root)
  }

  def ts(i: Int) = new java.sql.Timestamp(1704067200000L + i * 1000L)

  def docsOf(res: org.apache.spark.sql.DataFrame, qid: Int): Seq[Long] =
    res.where(col("query_id") === qid).orderBy("rank")
      .select("doc_id").collect().map(_.getLong(0)).toSeq

  test("adjacency: 'a b' matches docs with consecutive a,b only") {
    val res = IndexSearch.searchPhrase(idx, Seq(1 -> "a b", 2 -> "b a", 3 -> "a a"))
    assert(docsOf(res, 1) == Seq(0L), "only doc 0 has adjacent 'a b'")
    assert(docsOf(res, 2) == Seq(1L), "only doc 1 has adjacent 'b a'")
    assert(docsOf(res, 3) == Seq(2L), "duplicate-term phrase 'a a'")
  }

  test("OOV term in the phrase matches nothing") {
    val res = IndexSearch.searchPhrase(idx, Seq(1 -> "a zzzmissing"))
    assert(res.count() == 0)
  }

  test("single-term phrase ranks exactly like the plain term query") {
    val phrase = IndexSearch.searchPhrase(idx, Seq(1 -> "c"))
      .orderBy("rank").collect().toSeq
    val term = IndexSearch.search(idx, Seq(1 -> "c"))
      .orderBy("rank").collect().toSeq
    assert(phrase == term)
    assert(phrase.nonEmpty)
  }

  test("slop: ordered window matches gapped terms, never reversed ones") {
    // doc 0: a..b gap 1 ("a x b"); doc 1: b then a (reversed); doc 2: a..b gap 3
    val turns = Seq(
      ("c0", 0, "user", "a x b", null.asInstanceOf[String], ts(0)),
      ("c1", 0, "user", "b c c a", null.asInstanceOf[String], ts(1)),
      ("c2", 0, "user", "a x x x b", null.asInstanceOf[String], ts(2)))
      .toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
    val root = tmp()
    BuildIndexJob.run(spark, turns, root, "slop",
      BuildIndexJob.Config(numShards = 4, blockSize = 2, storePositions = true))
    val i = IndexSearch.open(spark, root)
    assert(docsOf(IndexSearch.searchPhrase(i, Seq(1 -> "a b"), slop = 0), 1)
      == Seq.empty, "slop 0: no adjacent 'a b' anywhere")
    assert(docsOf(IndexSearch.searchPhrase(i, Seq(1 -> "a b"), slop = 1), 1)
      == Seq(0L), "slop 1 reaches across one gap only")
    assert(docsOf(IndexSearch.searchPhrase(i, Seq(1 -> "a b"), slop = 3), 1)
      == Seq(0L, 2L), "slop 3 reaches the wider gap")
    // in-order-only (the pinned divergence from Lucene's transpositions):
    // doc 1's reversed "b ... a" never matches "a b" at any slop
    assert(!docsOf(IndexSearch.searchPhrase(i, Seq(1 -> "a b"), slop = 9), 1)
      .contains(1L))
  }

  test("property: searchPhrase ≡ brute force on random corpora (slop 0 and 2)") {
    val rnd = new scala.util.Random(11)
    val vocab = Vector("a", "b", "c", "d", "e")
    for (trial <- 0 until 3) {
      val docs: Seq[Seq[String]] = (0 until 20).map { _ =>
        Seq.fill(8 + rnd.nextInt(13))(vocab(rnd.nextInt(vocab.size)))
      }
      val turns = docs.zipWithIndex.map { case (toks, i) =>
        (f"c$i%03d", 0, "user", toks.mkString(" "),
          null.asInstanceOf[String], ts(i))
      }.toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
      val root = tmp()
      BuildIndexJob.run(spark, turns, root, s"prop$trial",
        BuildIndexJob.Config(numShards = 4, blockSize = 4, storePositions = true))
      val idx = IndexSearch.open(spark, root)
      // collection stats the engine uses
      val n = docs.size.toLong
      val avgdl = docs.map(_.size).sum.toDouble / n
      def df(t: String) = docs.count(_.contains(t)).toLong
      def brutePf(toks: Seq[String], phrase: Seq[String], slop: Int): Int = {
        val pos = toks.zipWithIndex
        def chain(slot: Int, prev: Int, p1: Int): Boolean =
          if (slot == phrase.size) true
          else pos.exists { case (t, p) =>
            t == phrase(slot) && p > prev && p <= p1 + slot + slop &&
              chain(slot + 1, p, p1)
          }
        pos.count { case (t, p) => t == phrase.head && chain(1, p, p) }
      }
      val phrases = Seq(
        Seq(vocab(rnd.nextInt(5))),
        Seq(vocab(rnd.nextInt(5)), vocab(rnd.nextInt(5))),
        Seq(vocab(rnd.nextInt(5)), vocab(rnd.nextInt(5)), vocab(rnd.nextInt(5))),
        Seq("a", "a"))
      for (slop <- Seq(0, 2); (phrase, qi) <- phrases.zipWithIndex) {
        val idfSum = phrase.map(t =>
          math.log(1.0 + (n - df(t) + 0.5) / (df(t) + 0.5))).sum
        val want = docs.zipWithIndex
          .map { case (toks, d) => (d.toLong, brutePf(toks, phrase, slop), toks.size) }
          .filter(_._2 > 0)
          .map { case (d, pf, dl) =>
            (d, idfSum * pf / (pf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)))
          }
          .sortBy { case (d, s) => (-BlockMaxWand.round(s, 7), d) }
          .take(10)
          .map { case (d, s) => (d, BlockMaxWand.round(s, 4)) }
        val got = IndexSearch
          .searchPhrase(idx, Seq(1 -> phrase.mkString(" ")), k = 10, slop = slop)
          .orderBy("rank").collect()
          .map(r => (r.getLong(2), r.getDouble(3))).toSeq
        assert(got == want,
          s"trial $trial phrase=$phrase slop=$slop: got $got want $want")
      }
    }
  }

  test("phrase frequency saturates scoring: 2 occurrences outrank 1 at equal dl") {
    // doc 0 has pf('a b')=2; craft a sibling with pf=1 and identical dl
    val turns = Seq(
      ("c0", 0, "user", "a b c a b a x b", null.asInstanceOf[String], ts(0)),
      ("c1", 0, "user", "a b c c c c c c", null.asInstanceOf[String], ts(1)))
      .toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
    val root = tmp()
    BuildIndexJob.run(spark, turns, root, "pf",
      BuildIndexJob.Config(numShards = 4, blockSize = 2, storePositions = true))
    val res = IndexSearch.searchPhrase(IndexSearch.open(spark, root), Seq(1 -> "a b"))
      .orderBy("rank").collect()
    assert(res.map(_.getLong(2)).toSeq == Seq(0L, 1L))
    assert(res(0).getDouble(3) > res(1).getDouble(3))
  }
}
