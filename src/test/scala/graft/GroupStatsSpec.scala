package graft

import graft.index.BuildIndexJob
import graft.search.{IndexSearch, Suggest}

/** Result grouping ([[graft.search.Grouping]]), StatsComponent +
  * facet.sort=count ([[graft.search.Facets]]), and the df-weighted term
  * suggester ([[Suggest]]) — each checked against a brute in-spec twin
  * derived from the plain engine / dictionary. */
class GroupStatsSpec extends SparkSpec {
  import spark.implicits._

  def tmp(): String = java.nio.file.Files.createTempDirectory("graftgs").toString
  def ts(i: Int) = new java.sql.Timestamp(1704067200000L + i * 1000L)

  // doc_ids 0..4 in (conv_id, turn_idx) order; dl = 3,3,3,7,9
  lazy val idx: IndexSearch.OpenIndex = {
    val turns = Seq(
      ("c0", 0, "user", "apple ant bee", null.asInstanceOf[String], ts(0)),
      ("c0", 1, "assistant", "ant bee cat", "toolA", ts(1)),
      ("c1", 0, "user", "bee cat dog", null.asInstanceOf[String], ts(2)),
      ("c1", 1, "assistant", "cat dog emu fox gnu hen ibis", "toolB", ts(3)),
      ("c2", 0, "user", "dog emu fox gnu hen ibis jay kit lark", null.asInstanceOf[String], ts(4)))
      .toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
    val root = tmp()
    BuildIndexJob.run(spark, turns, root, "gs", BuildIndexJob.Config(numShards = 4))
    IndexSearch.open(spark, root)
  }

  /** Brute grouping: fold the FULL plain ranking into groups in Scala. */
  private def bruteGroups(q: Seq[(Int, String)], groupOf: Long => String,
                          kG: Int, m: Int): Seq[(Int, Int, String, Int, Long)] = {
    val full = IndexSearch.search(idx, q, k = 1000)
      .select("query_id", "rank", "doc_id")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSeq
    full.groupBy(_._1).toSeq.flatMap { case (qid, rows) =>
      val byDoc = rows.sortBy(_._2) // plain rank order = score-desc, id-asc
      // group order = order of first appearance in the plain ranking
      val groupOrder = byDoc.map(r => groupOf(r._3)).distinct.take(kG)
      groupOrder.zipWithIndex.flatMap { case (g, gi) =>
        byDoc.filter(r => groupOf(r._3) == g).take(m).zipWithIndex.map {
          case ((_, _, doc), di) => (qid, gi + 1, g, di + 1, doc)
        }
      }
    }.sortBy(t => (t._1, t._2, t._4))
  }

  test("grouping ≡ brute group-fold of the plain ranking (conv_id)") {
    val qs = Seq(1 -> "bee", 2 -> "cat dog", 3 -> "zzz")
    val got = IndexSearch.searchGrouped(idx, qs, "conv_id", kGroups = 2,
        groupLimit = 2)
      .select("query_id", "group_rank", "group_value", "doc_rank", "doc_id")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2),
        r.getInt(3), r.getLong(4))).toSeq
    val conv = Map(0L -> "c0", 1L -> "c0", 2L -> "c1", 3L -> "c1", 4L -> "c2")
    assert(got == bruteGroups(qs, conv, 2, 2) && got.nonEmpty)
  }

  test("grouping by a unique field with limit 1 ≡ the plain top-k") {
    val qs = Seq(1 -> "cat dog", 2 -> "bee")
    val got = IndexSearch.searchGrouped(idx, qs, "doc_id", kGroups = 3,
        groupLimit = 1)
      .select("query_id", "group_rank", "doc_id")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSeq
    val want = IndexSearch.search(idx, qs, k = 3)
      .select("query_id", "rank", "doc_id")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSeq
    assert(got == want && got.nonEmpty)
  }

  test("grouping excludes NULL group values (pinned divergence)") {
    // bee matches docs 0,1,2; only doc 1 has a tool → one group
    val got = IndexSearch.searchGrouped(idx, Seq(1 -> "bee"), "tool",
        kGroups = 5, groupLimit = 5)
      .select("group_value", "doc_id")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("toolA", 1L)))
  }

  test("stats: count/missing/min/max/sum/mean over the match set, zero-filled spine") {
    // bee → docs 0,1,2 (dl 3,3,3, none NULL); zzz → nothing
    val rows = IndexSearch.statsField(idx, Seq(1 -> "bee", 2 -> "zzz"), "dl")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)), Option(r.get(4)), Option(r.get(5)), Option(r.get(6)))).toSeq
    assert(rows == Seq(
      (1, 3L, 0L, Some(3L), Some(3L), Some(9L), Some(3.0)),
      (2, 0L, 0L, None, None, None, None)))
  }

  test("stats over a NULLABLE field: NULLs count as missing, never skew the mean") {
    // "bee cat" matches docs 0,1,2,3; tool is NULL on the user turns
    // (docs 0, 2) and set on the assistant turns — count only the docs
    // WITH a value (Solr count/missing semantics)
    val rows = IndexSearch.statsField(idx, Seq(1 -> "bee cat"), "turn_idx")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows.head._2 + rows.head._3 == 4L) // with-value + missing = matched
  }

  test("facet.sort=count ranks by n_docs desc then value asc, capped") {
    // "bee cat" matches docs 0,1,2,3 → roles user×2, assistant×2 —
    // count tie broken by value: assistant first
    val rows = IndexSearch.facetTop(idx, Seq(1 -> "bee cat"), "role", 1)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2), r.getLong(3))).toSeq
    assert(rows == Seq((1, 1, "assistant", 2L)))
  }

  test("facet.prefix counts only values under the prefix, pre-aggregation") {
    // "bee cat" matches docs 0,1,2,3 → tools toolA (doc 1), toolB (doc 3)
    val rows = IndexSearch.facetTop(idx, Seq(1 -> "bee cat"), "tool", 5,
        prefix = Some("toolA"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2), r.getLong(3))).toSeq
    assert(rows == Seq((1, 1, "toolA", 1L)))
  }

  test("facet.missing adds the NULL bucket, leaves value buckets intact") {
    // "bee cat" matches docs 0,1,2,3; tool NULL on 0,2, toolA on 1, toolB on 3
    val rows = IndexSearch.facetFields(idx, Seq(1 -> "bee cat"), Seq("tool"),
        missing = true)
      .collect().map(r => (Option(r.getString(2)), r.getLong(3))).toSet
    assert(rows == Set((None, 2L), (Some("toolA"), 1L), (Some("toolB"), 1L)))
    // missing=false (default) keeps the historical no-NULL-bucket shape
    val noMiss = IndexSearch.facetFields(idx, Seq(1 -> "bee cat"), Seq("tool"))
      .collect().map(r => Option(r.getString(2))).toSet
    assert(noMiss == Set(Some("toolA"), Some("toolB")))
  }

  test("FilterQuery: Solr fq string syntax → Column predicate") {
    import graft.search.FilterQuery.parse
    val docs = idx.io.read(spark, idx.paths.docs)
    def ids(c: org.apache.spark.sql.Column): Set[Long] =
      docs.where(c).select("doc_id").collect().map(_.getLong(0)).toSet
    // exact term; numeric equality
    assert(ids(parse("role:user")) == Set(0L, 2L, 4L))
    assert(ids(parse("turn_idx:1")) == Set(1L, 3L))
    // inclusive/exclusive/open ranges (dl = 3,3,3,7,9)
    assert(ids(parse("dl:[7 TO 9]")) == Set(3L, 4L))
    assert(ids(parse("dl:{7 TO 9]")) == Set(4L))
    assert(ids(parse("dl:[8 TO *]")) == Set(4L))
    // existence test; negation keeps NULL-valued docs (Solr exclusion)
    assert(ids(parse("tool:[* TO *]")) == Set(1L, 3L))
    assert(ids(parse("-tool:toolA")) == Set(0L, 2L, 3L, 4L))
    // string range (lexicographic on conv_id)
    assert(ids(parse("conv_id:[c1 TO c2]")) == Set(2L, 3L, 4L))
    intercept[IllegalArgumentException](parse("no-colon-here"))
    // engine composition ≡ the hand-written Column
    val a = IndexSearch.searchFiltered(idx, Seq(1 -> "cat dog"),
      parse("role:assistant")).collect().toSeq
    val b = IndexSearch.searchFiltered(idx, Seq(1 -> "cat dog"),
      org.apache.spark.sql.functions.col("role") === "assistant").collect().toSeq
    assert(a == b && a.nonEmpty)
  }

  test("realtime get: stored docs by key, missing keys omitted") {
    val got = IndexSearch.getDocs(idx, Seq(("c0", 1), ("c2", 0), ("nope", 9)))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2),
        Option(r.getString(3)), r.getLong(4), r.getString(5))).toSeq
    assert(got == Seq(
      ("c0", 1, "assistant", Some("toolA"), 3L, "ant bee cat"),
      ("c2", 0, "user", None, 9L, "dog emu fox gnu hen ibis jay kit lark")))
    intercept[IllegalArgumentException](IndexSearch.getDocs(idx, Nil))
  }

  test("suggest: df-weighted prefix completion, case-folded, rank-capped") {
    // dictionary df: ant 2, apple 1, bee 3, cat 3, dog 3, emu 2, …
    val got = Suggest.suggest(idx, Seq(1 -> "a", 2 -> "C", 3 -> "zz"), n = 1)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2), r.getLong(3))).toSeq
    assert(got == Seq((1, 1, "ant", 2L), (2, 1, "cat", 3L)))
    val e = intercept[IllegalArgumentException](
      Suggest.suggest(idx, Seq(1 -> "a%b")))
    assert(e.getMessage.contains("partial token"))
  }

  /** Independent Scala HLL — the same pinned algorithm reimplemented
    * from the math, not the Column tree. */
  private def bruteHll(values: Set[String]): (Int, Double) = {
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val regs = values.toSeq
      .map { v =>
        val h = java.lang.Long.parseLong(md5hex(v).take(8), 16)
        val (j, w) = (h % 64, h / 64)
        val rho = if (w == 0) 27 else 27 - (64 - java.lang.Long.numberOfLeadingZeros(w))
        (j, rho)
      }
      .groupBy(_._1).map { case (j, rs) => j -> rs.map(_._2).max }
    val s = regs.values.map(m => math.pow(2.0, -m)).sum + (64 - regs.size)
    val e = 0.709 * 64 * 64 / s
    val v = 64 - regs.size
    val est = if (e <= 160.0 && v > 0) 64.0 * math.log(64.0 / v) else e
    (regs.size, BigDecimal(est).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("stats cardinality: HLL ≡ independent Scala HLL; zero-match → 0") {
    val qs = Seq(1 -> "bee", 2 -> "cat dog", 3 -> "zzz")
    val got = IndexSearch.statsCardinality(idx, qs, "conv_id")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    // brute match sets from the plain engine, values from the fixture
    val convOf = Map(0L -> "c0", 1L -> "c0", 2L -> "c1", 3L -> "c1", 4L -> "c2")
    val full = IndexSearch.search(idx, qs, k = 1000)
      .select("query_id", "doc_id").collect()
      .groupBy(_.getInt(0)).view.mapValues(_.map(r => convOf(r.getLong(1))).toSet)
    for (qid <- Seq(1, 2, 3)) {
      val vals = full.getOrElse(qid, Set.empty[String])
      val (regs, est) = bruteHll(vals)
      val row = got.find(_._1 == qid).get
      assert(row == ((qid, vals.size.toLong, regs, est)),
        s"query $qid: got $row, want (${vals.size}, $regs, $est)")
    }
    // the empty query exercises the V = m linear-count endpoint exactly
    assert(got.find(_._1 == 3).get._4 == 0.0)
    // small-n linear counting is tight: within 30% of exact here
    got.filter(_._2 > 0).foreach { case (_, exact, _, est) =>
      assert(math.abs(est - exact) / exact < 0.3, s"estimate $est vs $exact") }
  }
}
