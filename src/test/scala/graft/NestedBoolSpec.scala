package graft

import graft.index.BuildIndexJob
import graft.search.{Bm25, IndexSearch, NestedBool}
import graft.search.NestedBool.{Group, Leaf}

/** Nested boolean grammar ([[NestedBool]]): parser pinning and engine ≡ an
  * independent brute-force recursive evaluator over the tokenized corpus. */
class NestedBoolSpec extends SparkSpec {
  import spark.implicits._

  def tmp(): String = java.nio.file.Files.createTempDirectory("graftnb").toString
  def ts(i: Int) = new java.sql.Timestamp(1704067200000L + i * 1000L)

  val docs: Seq[Seq[String]] = Seq(
    "apple ant bee", "ant bee cat", "bee cat dog", "cat dog emu",
    "ant ant bee ant", "dog emu fox", "apple fox", "bee bee fox")
    .map(_.split(" ").toSeq)

  lazy val idx: IndexSearch.OpenIndex = {
    val turns = docs.zipWithIndex.map { case (ws, i) =>
      (f"c$i%02d", 0, "user", ws.mkString(" "), null.asInstanceOf[String], ts(i))
    }.toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
    val root = tmp()
    BuildIndexJob.run(spark, turns, root, "nb", BuildIndexJob.Config(numShards = 4))
    IndexSearch.open(spark, root)
  }

  test("parser pinning: precedence, adjacency-OR, NOT placement, guards") {
    assert(NestedBool.parse("(a OR b) AND c") ==
      Group(and = true, Seq(Group(and = false, Seq(Leaf("a"), Leaf("b")), Nil), Leaf("c")), Nil))
    // AND binds tighter than OR; adjacency is OR
    assert(NestedBool.parse("a AND b c") ==
      Group(and = false, Seq(Group(and = true, Seq(Leaf("a"), Leaf("b")), Nil), Leaf("c")), Nil))
    assert(NestedBool.parse("a AND NOT b") ==
      Group(and = true, Seq(Leaf("a")), Seq(Leaf("b"))))
    // a pure-negative chain hangs its negatives on the enclosing OR
    assert(NestedBool.parse("a -b") ==
      Group(and = false, Seq(Leaf("a")), Seq(Leaf("b"))))
    assert(NestedBool.parse("NOT a") ==
      Group(and = false, Nil, Seq(Leaf("a"))))
    // NOT over a group
    assert(NestedBool.parse("a AND NOT (b OR c)") ==
      Group(and = true, Seq(Leaf("a")),
        Seq(Group(and = false, Seq(Leaf("b"), Leaf("c")), Nil))))
    intercept[IllegalArgumentException](NestedBool.parse("(a OR b"))
    intercept[IllegalArgumentException](NestedBool.parse("a OR b)"))
    intercept[RuntimeException](NestedBool.parse("a AND"))
  }

  /** Independent recursive evaluator: Option[score] per (node, doc). */
  def brute(n: NestedBool.Node, d: Int): Option[Double] = {
    val nDocs = docs.size.toLong
    val avgdl = docs.map(_.size).sum.toDouble / nDocs
    n match {
      case Leaf(t) =>
        val df = docs.count(_.contains(t)).toLong
        val tf = docs(d).count(_ == t)
        if (tf == 0) None
        else Some(Bm25.score(tf, docs(d).size, df, nDocs, avgdl))
      case Group(_, pos, _) if pos.isEmpty => None
      case Group(and, pos, neg) =>
        val evs = pos.map(brute(_, d))
        val ok = (if (and) evs.forall(_.isDefined) else evs.exists(_.isDefined)) &&
          !neg.exists(brute(_, d).isDefined)
        if (!ok) None else Some(evs.flatten.sum)
    }
  }

  test("engine ≡ brute recursive evaluation on composed shapes") {
    val qs = Seq(
      1 -> "(ant OR dog) AND bee",
      2 -> "ant AND NOT cat",
      3 -> "(ant dog) fox",
      4 -> "(ant AND zzznope) OR fox",
      5 -> "NOT ant",
      6 -> "(ant OR bee) AND (fox OR dog) -emu",
      7 -> "ant AND NOT (cat OR fox)",
      8 -> "bee bee") // repeated clause scores twice
    val got = NestedBool.searchNested(idx, qs)
      .orderBy("query_id", "rank").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    val want = qs.flatMap { case (qid, q) =>
      val root = NestedBool.parse(q)
      docs.indices.flatMap(d => brute(root, d).map(s => (d.toLong, s)))
        .sortBy { case (d, s) =>
          (-BigDecimal(s).setScale(7, BigDecimal.RoundingMode.HALF_UP), d) }
        .take(10).zipWithIndex
        .map { case ((d, s), i) => (qid, i + 1, d,
          BigDecimal(s).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) }
    }
    assert(got == want, s"got=$got\nwant=$want")
    assert(got.nonEmpty)
    // sanity on specific pins: pure negative empty; dead AND rescued by OR
    assert(!got.exists(_._1 == 5))
    assert(got.exists(_._1 == 4))
    // repeated clause doubles the single-clause score
    val single = NestedBool.searchNested(idx, Seq(1 -> "bee"))
      .orderBy("rank").collect().map(r => (r.getLong(2), r.getDouble(3)))
    val doubled = got.filter(_._1 == 8).map(r => (r._3, r._4))
    assert(single.map(_._1).toSeq == doubled.map(_._1).toSeq)
  }
}
