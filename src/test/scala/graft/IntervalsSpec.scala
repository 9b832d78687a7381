package graft

import graft.index.BuildIndexJob
import graft.search.{IndexSearch, Intervals}
import org.apache.spark.sql.functions._

/** Lucene unordered intervals (maxgaps): order-free matching, exact
  * minimal-window widths vs brute force, OOV elimination, and the
  * repeated-term guard. */
class IntervalsSpec extends SparkSpec {
  import spark.implicits._

  def tmp(): String = java.nio.file.Files.createTempDirectory("graftiv").toString
  def ts(i: Int) = new java.sql.Timestamp(1704067200000L + i * 1000L)

  lazy val idx: IndexSearch.OpenIndex = {
    val turns = Seq(
      ("c0", 0, "user", "a b q q", null.asInstanceOf[String], ts(0)),
      ("c1", 0, "user", "b a q q", null.asInstanceOf[String], ts(1)),
      ("c2", 0, "user", "a c c b", null.asInstanceOf[String], ts(2)),
      ("c3", 0, "user", "a q q q b", null.asInstanceOf[String], ts(3)),
      ("c4", 0, "user", "q a q b q", null.asInstanceOf[String], ts(4)))
      .toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
    val root = tmp()
    BuildIndexJob.run(spark, turns, root, "iv",
      BuildIndexJob.Config(numShards = 4, blockSize = 2, storePositions = true))
    IndexSearch.open(spark, root)
  }

  def docsOf(res: org.apache.spark.sql.DataFrame, qid: Int): Set[Long] =
    res.where(col("query_id") === qid)
      .select("doc_id").collect().map(_.getLong(0)).toSet

  test("unordered matching is order-free and gap-bounded") {
    val g0 = Intervals.searchUnordered(idx, Seq(1 -> "a b"), maxgaps = 0)
    assert(docsOf(g0, 1) == Set(0L, 1L), "adjacent in either order")
    val g1 = Intervals.searchUnordered(idx, Seq(1 -> "a b"), maxgaps = 1)
    assert(docsOf(g1, 1) == Set(0L, 1L, 4L), "one gap admits doc 4 (a q b)")
    val g2 = Intervals.searchUnordered(idx, Seq(1 -> "a b"), maxgaps = 2)
    assert(docsOf(g2, 1) == Set(0L, 1L, 2L, 4L), "two gaps admit a c c b")
    val g3 = Intervals.searchUnordered(idx, Seq(1 -> "a b"), maxgaps = 3)
    assert(docsOf(g3, 1) == Set(0L, 1L, 2L, 3L, 4L))
  }

  test("score equals the conjunctive BM25 of the terms on the match set") {
    val iv = Intervals.searchUnordered(idx, Seq(1 -> "a b"), maxgaps = 0)
      .collect().map(r => (r.getLong(2), r.getDouble(3))).toMap
    val conj = IndexSearch.search(idx, Seq(1 -> "a b"), conjunctive = true)
      .collect().map(r => (r.getLong(2), r.getDouble(3))).toMap
    iv.foreach { case (d, s) => assert(math.abs(s - conj(d)) < 1e-9, s"doc $d") }
    assert(iv.nonEmpty)
  }

  test("OOV term eliminates the query; single term degenerates to the term match set") {
    assert(Intervals.searchUnordered(idx, Seq(1 -> "a zzz"), maxgaps = 5).count() == 0)
    val one = Intervals.searchUnordered(idx, Seq(1 -> "c"), maxgaps = 0)
    assert(docsOf(one, 1) == Set(2L))
  }

  test("repeated term after analysis fails loudly") {
    intercept[IllegalArgumentException] {
      Intervals.searchUnordered(idx, Seq(1 -> "a a b"), maxgaps = 1)
    }
  }

  test("ordered intervals: query order enforced, same windows") {
    // unordered admits doc 1 ("b a"); ordered must not
    val o0 = Intervals.searchOrdered(idx, Seq(1 -> "a b"), maxgaps = 0)
    assert(docsOf(o0, 1) == Set(0L), "only a-before-b adjacency")
    val o2 = Intervals.searchOrdered(idx, Seq(1 -> "a b"), maxgaps = 2)
    assert(docsOf(o2, 1) == Set(0L, 2L, 4L), "gaps ok, reversal never")
    val rev = Intervals.searchOrdered(idx, Seq(1 -> "b a"), maxgaps = 0)
    assert(docsOf(rev, 1) == Set(1L), "reversed query matches doc 1 only")
    // ordered ⊆ unordered on identical windows
    (0 to 3).foreach { g =>
      val ou = docsOf(Intervals.searchUnordered(idx, Seq(1 -> "a b"), g), 1)
      val oo = docsOf(Intervals.searchOrdered(idx, Seq(1 -> "a b"), g), 1)
      assert(oo.subsetOf(ou), s"maxgaps=$g")
    }
  }

  test("minWidth sweep ≡ brute-force minimum over random position lists") {
    val rnd = new scala.util.Random(13)
    (1 to 200).foreach { _ =>
      val m = 1 + rnd.nextInt(4)
      val lists = Array.fill(m)(
        Array.fill(1 + rnd.nextInt(6))(rnd.nextInt(30).toLong).distinct.sorted)
      val got = Intervals.minWidth(lists, m)
      val brute = {
        def combos(i: Int): Seq[Seq[Long]] =
          if (i == m) Seq(Seq.empty)
          else for (p <- lists(i).toSeq; rest <- combos(i + 1)) yield p +: rest
        combos(0).map(c => c.max - c.min + 1).min
      }
      assert(got == brute, s"lists=${lists.map(_.mkString("[", ",", "]")).mkString}")
    }
  }
}
