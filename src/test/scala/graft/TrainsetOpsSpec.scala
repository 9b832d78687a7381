package graft

import graft.index.BuildIndexJob
import graft.ops.TextOps
import graft.search.IndexSearch
import org.apache.spark.sql.functions.col

/** Trainset-extraction ops: SFT pair extraction (adjacency + context
  * render gates) and DPR hard-negative mining (labeling, exclusion,
  * deterministic hash ordering) — hand-computed expectations. */
class TrainsetOpsSpec extends SparkSpec {
  import spark.implicits._

  def ts(i: Int) = new java.sql.Timestamp(1704067200000L + i * 1000L)

  test("sftPairs: adjacent user→assistant only; gaps, tool followups, " +
    "trailing users excluded; context renders prior turns in order") {
    val turns = Seq(
      ("c0", 0, "user", "hi there"), ("c0", 1, "assistant", "hello"),
      ("c0", 2, "user", "run tool"), ("c0", 3, "tool", "ok"),
      ("c1", 0, "user", "solo"), ("c1", 2, "assistant", "orphan"),
      ("c2", 0, "assistant", "lead"), ("c2", 1, "user", "q2"),
      ("c2", 2, "assistant", "a2"))
      .toDF("conv_id", "turn_idx", "role", "text")
    val got = TextOps.sftPairs(turns).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2),
        r.getString(3), r.getString(4))).toSeq
    assert(got == Seq(
      ("c0", 0, "hi there", "user: hi there", "hello"),
      ("c2", 1, "q2", "assistant: lead\nuser: q2", "a2")))
  }

  lazy val idx: IndexSearch.OpenIndex = {
    val turns = Seq(
      ("c0", 0, "user", "apple ant bee", null.asInstanceOf[String], ts(0)),
      ("c0", 1, "assistant", "ant bee cat", "toolA", ts(1)),
      ("c1", 0, "user", "bee cat dog", null.asInstanceOf[String], ts(2)),
      ("c1", 1, "assistant", "cat dog emu", "toolB", ts(3)),
      ("c2", 0, "user", "emu fox goat", null.asInstanceOf[String], ts(4)))
      .toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
    val root = java.nio.file.Files.createTempDirectory("grafttrs").toString
    BuildIndexJob.run(spark, turns, root, "trs", BuildIndexJob.Config(numShards = 4))
    IndexSearch.open(spark, root)
  }

  test("hardNegatives: pos = top-1, hard_neg = rest of top-k, rand_neg " +
    "excludes heads, md5-ordered, NULL-scored; deterministic") {
    // "apple" matches only doc 0 → 1 pos, 0 hard_neg, pool = docs 1..4
    def run() = IndexSearch.hardNegatives(idx, Seq(1 -> "apple"),
      k = 10, nRand = 5, permille = 1000).collect()
      .map(r => (r.getString(1), r.getInt(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4))))
    val got = run()
    val pos = got.filter(_._1 == "pos")
    assert(pos.map(t => (t._3, t._2)).toSeq == Seq((0L, 1)))
    assert(pos.forall(_._4.nonEmpty), "pos carries its BM25 score")
    assert(!got.exists(_._1 == "hard_neg"), "single-match query: no hard negs")
    val rand = got.filter(_._1 == "rand_neg")
    assert(rand.map(_._3).toSet == Set(1L, 2L, 3L, 4L),
      "pool = corpus minus heads (nRand over-ask truncates to pool size)")
    assert(rand.forall(_._4.isEmpty), "rand_neg scores are NULL")
    assert(rand.map(_._2).sorted.toSeq == Seq(1, 2, 3, 4))
    // deterministic hash ordering: rerun is identical
    assert(run().toSeq == got.toSeq)

    // multi-match query: ranks 2.. become hard negatives
    val multi = IndexSearch.hardNegatives(idx, Seq(1 -> "cat dog"),
      k = 10, nRand = 2, permille = 1000).collect()
      .map(r => (r.getString(1), r.getInt(2), r.getLong(3)))
    val heads = IndexSearch.search(idx, Seq(1 -> "cat dog")).collect()
      .map(r => (r.getInt(1), r.getLong(2)))
    assert(multi.filter(_._1 == "pos").map(_._3).toSeq ==
      heads.filter(_._1 == 1).map(_._2).toSeq)
    assert(multi.filter(_._1 == "hard_neg").map(_._3).toSet ==
      heads.filter(_._1 > 1).map(_._2).toSet)
    val headSet = heads.map(_._2).toSet
    assert(multi.filter(_._1 == "rand_neg").forall(t => !headSet(t._3)))
    assert(multi.count(_._1 == "rand_neg") == 2, "nRand honored when pool suffices")
  }

  test("fimExamples: prefix+target+suffix reconstruct the token stream; " +
    "cut bounds hold; deterministic; cuts vary across docs") {
    val docs = (0L until 30L)
      .map(i => (i, (0 to (i % 7).toInt).map(j => s"w${(i + j) % 5}").mkString(" ")))
      .toDF("doc_id", "text")
    def run() = TextOps.fimExamples(docs).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
        r.getString(4), r.getString(5)))
    val got = run()
    assert(got.length == 30)
    got.foreach { case (id, n, a, b, input, target) =>
      assert(0 <= a && a <= b && b <= n, s"doc $id cut bounds: $a/$b/$n")
      val m = "(?s)<PRE> (.*) <SUF> (.*) <MID>".r
      val (pre, suf) = input match { case m(p, s) => (p, s) }
      def toks(s: String) = s.split(" ").filter(_.nonEmpty).toSeq
      val expected = docs.where(col("doc_id") === id)
        .select(graft.analysis.Analyzer.tokens(col("text"))).collect()(0)
        .getSeq[String](0)
      assert(toks(pre) ++ toks(target) ++ toks(suf) == expected,
        s"doc $id does not reconstruct")
      assert(toks(pre).size == a && toks(target).size == b - a,
        s"doc $id cut geometry vs rendered spans")
    }
    assert(got.map(t => (t._3, t._4)).distinct.size > 5,
      "vacuous: cuts barely vary across docs")
    assert(run().toSeq == got.toSeq, "fimExamples must be deterministic")
  }

  test("trainShards: partition of the corpus, contiguous ranks, exact " +
    "token offsets, deterministic, seed-sensitive") {
    val corpus = (0 until 300)
      .map(i => (i.toLong, ("tok " * (1 + i % 7)).trim))
      .toDF("doc_id", "text")
    val n = 8
    def run(seed: Long) = TextOps.trainShards(corpus, n, seed).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getLong(4)))
    val got = run(1L)
    // a PARTITION: every doc exactly once
    assert(got.map(_._1).sorted.toSeq == (0L until 300L))
    // every shard populated, ranks contiguous from 1, offsets = running sums
    val byShard = got.groupBy(_._2)
    assert(byShard.keySet == (0 until n).toSet, "all shards populated")
    byShard.foreach { case (s, rows) =>
      val sorted = rows.sortBy(_._3)
      assert(sorted.map(_._3).toSeq == (1 to rows.length), s"shard $s ranks")
      var acc = 0L
      sorted.foreach { r =>
        assert(r._5 == acc, s"shard $s doc ${r._1} offset")
        acc += r._4
      }
    }
    // the shuffle actually shuffles: within-shard order is not doc_id order
    assert(byShard.values.exists { rows =>
      val s = rows.sortBy(_._3).map(_._1).toSeq; s != s.sorted
    }, "pseudorandom key must not preserve doc_id order")
    assert(run(1L).toSeq == got.toSeq, "deterministic under a fixed seed")
    assert(run(7L).map(t => (t._1, t._2)).toSeq != got.map(t => (t._1, t._2)).toSeq,
      "seed must change the assignment")
  }

  test("lrQuality: deterministic GD trajectory, labels learned on a " +
    "separable corpus, zero-token docs score 0.5") {
    // two disjoint vocabularies → linearly separable in hashed space whp
    val docs = (0 until 40).map { i =>
      val en = i % 2 == 0
      val words = if (en) Seq("the", "merge", "batch") else Seq("el", "de", "que")
      (i.toLong, (words ++ words).mkString(" "), if (en) "en" else "es")
    } :+ (40L, "", "en") // zero-token doc
    val corpus = docs.toDF("doc_id", "text", "lang")
    def run() = TextOps.lrQuality(corpus, "en", 8, 5, 2.0)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2),
        r.getInt(3))).toSeq
    val got = run()
    assert(got == run(), "training must be run-to-run deterministic")
    assert(got.forall(r => r._3 >= 0.0 && r._3 <= 1.0))
    assert(got.forall(r => r._4 == (if (r._3 >= 0.5) 1 else 0)))
    // the model actually learned: every labeled doc predicted correctly
    val labeled = got.filter(_._1 < 40)
    assert(labeled.forall(r => r._4 == r._2),
      s"separable corpus misclassified: ${labeled.filterNot(r => r._4 == r._2)}")
    assert(got.last == ((40L, 1, 0.5, 1)), "featureless doc stays at sigmoid(0)")
  }
}
