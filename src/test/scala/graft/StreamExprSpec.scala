package graft

import graft.index.BuildIndexJob
import graft.search.{IndexSearch, StreamExpr}
import graft.search.StreamExpr._

/** Solr streaming expressions ([[graft.search.StreamExpr]]): parser
  * pinning, loud guards, and hand-audited semantics of each decorator
  * over a tiny persisted index. */
class StreamExprSpec extends SparkSpec {
  import spark.implicits._

  def tmp(): String = java.nio.file.Files.createTempDirectory("graftse").toString
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
    BuildIndexJob.run(spark, turns, root, "se", BuildIndexJob.Config(numShards = 4))
    IndexSearch.open(spark, root)
  }

  test("parser: AST shapes and loud failures") {
    val n = parse("""rollup(search(t, q="bee", fl="doc_id,role,dl", sort="doc_id asc"), over="role", count(*), sum(dl))""")
    assert(n == RollupNode(
      SearchNode("bee", Seq("doc_id", "role", "dl"), Seq(("doc_id", true))),
      Seq("role"), Seq(MCount, MSum("dl"))))
    assert(n.schema == Seq("role", "n_tuples", "sum_dl"))
    val j = parse("""top(innerJoin(search(t, q="bee", fl="doc_id,conv_id,dl", sort="conv_id asc"), select(search(t, q="dog", fl="doc_id,conv_id", sort="conv_id asc"), doc_id as rdoc, conv_id), on="conv_id"), n=3, sort="dl desc")""")
    assert(j.schema == Seq("conv_id", "doc_id", "dl", "rdoc"))
    // guards: unknown function, unknown fl field, sort outside fl,
    // colliding join columns, metric field outside schema
    intercept[IllegalArgumentException](parse("""shuffle(search(t, q="a", fl="doc_id", sort="doc_id asc"))"""))
    intercept[IllegalArgumentException](parse("""search(t, q="bee", fl="doc_id,text", sort="doc_id asc")"""))
    intercept[IllegalArgumentException](parse("""search(t, q="bee", fl="doc_id", sort="dl asc")"""))
    intercept[IllegalArgumentException](parse("""innerJoin(search(t, q="a", fl="doc_id,conv_id", sort="doc_id asc"), search(t, q="b", fl="doc_id,conv_id", sort="doc_id asc"), on="conv_id")"""))
    intercept[IllegalArgumentException](parse("""rollup(search(t, q="a", fl="doc_id", sort="doc_id asc"), over="doc_id", sum(dl))"""))
    intercept[IllegalArgumentException](parse("""search(t, q="!!", fl="doc_id", sort="doc_id asc")"""))
  }

  test("search source: full match set with fl fields") {
    val rows = StreamExpr.run(idx,
      """search(t, q="bee", fl="doc_id,role,dl", sort="doc_id asc")""")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSeq
    assert(rows == Seq((0L, "user", 3), (1L, "assistant", 3), (2L, "user", 3)))
  }

  test("rollup: hand-audited grouped metrics") {
    val rows = StreamExpr.run(idx,
      """rollup(search(t, q="bee dog", fl="doc_id,role,dl", sort="doc_id asc"), over="role", count(*), sum(dl), min(dl), max(dl), avg(dl))""")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getInt(3), r.getInt(4), r.getDouble(5))).sortBy(_._1).toSeq
    // bee|dog matches all 5 docs: assistant dl {3,7}, user dl {3,3,9}
    assert(rows == Seq(
      ("assistant", 2L, 10L, 3, 7, 5.0),
      ("user", 3L, 15L, 3, 9, 5.0)))
  }

  test("innerJoin + top: composition, disjoint columns, pinned tie-break") {
    val rows = StreamExpr.run(idx,
      """top(innerJoin(search(t, q="apple", fl="doc_id,conv_id,dl", sort="conv_id asc"), select(search(t, q="cat", fl="doc_id,conv_id", sort="conv_id asc"), doc_id as rdoc, conv_id), on="conv_id"), n=2, sort="rdoc desc")""")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getLong(3))).toSeq
    // apple → doc 0 (c0); cat → docs 1,2,3 (c0,c1,c1) → join on conv_id
    // keeps only (doc 0 × doc 1); n=2 larger than the stream
    assert(rows == Seq(("c0", 0L, 3, 1L)))
    // top selects deterministically under ties: dl asc over the bee
    // stream (three dl=3 rows) tie-breaks by the remaining columns asc
    val t2 = StreamExpr.run(idx,
      """top(search(t, q="bee", fl="doc_id,dl", sort="dl asc"), n=2, sort="dl asc")""")
      .collect().map(_.getLong(0)).toSeq
    assert(t2 == Seq(0L, 1L))
  }

  test("unique + leftOuterJoin + sort: pinned least-row, NULL fill") {
    // bee matches docs 0,1,2 (convs c0,c0,c1): unique over conv_id keeps
    // the least (doc_id, dl) row per conv → docs 0 and 2
    val u = StreamExpr.run(idx,
      """unique(search(t, q="bee", fl="doc_id,conv_id,dl", sort="conv_id asc"), over="conv_id")""")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sortBy(_._1)
    assert(u == Seq((0L, "c0"), (2L, "c1")))
    // leftOuterJoin against the lark stream (doc 4, c2 only): both bee
    // convs miss → NULL rdoc survives the left join
    val lj = StreamExpr.run(idx,
      """sort(leftOuterJoin(unique(search(t, q="bee", fl="doc_id,conv_id,dl", sort="conv_id asc"), over="conv_id"), select(search(t, q="lark", fl="doc_id,conv_id", sort="conv_id asc"), doc_id as rdoc, conv_id), on="conv_id"), by="conv_id asc")""")
      .collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSeq
    assert(lj == Seq(("c0", 0L, -1L), ("c1", 2L, -1L)))
    // hashJoin parses as the inner-join plan
    assert(parse("""hashJoin(search(t, q="a", fl="doc_id,conv_id", sort="doc_id asc"), select(search(t, q="b", fl="doc_id,conv_id", sort="doc_id asc"), doc_id as r, conv_id), on="conv_id")""")
      .isInstanceOf[JoinNode])
    // unique over the full schema fails loudly
    intercept[IllegalArgumentException](parse(
      """unique(search(t, q="a", fl="doc_id", sort="doc_id asc"), over="doc_id")"""))
  }

  test("fetch: re-joins stored fields; guards on key loss and collisions") {
    val rows = StreamExpr.run(idx,
      """fetch(t, select(search(t, q="bee", fl="doc_id,dl", sort="doc_id asc"), doc_id), fl="role,conv_id", on="doc_id")""")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq.sortBy(_._1)
    assert(rows == Seq((0L, "user", "c0"), (1L, "assistant", "c0"), (2L, "user", "c1")))
    // stream without the key, and fetching an already-present field, fail
    intercept[IllegalArgumentException](parse(
      """fetch(t, select(search(t, q="bee", fl="doc_id,dl", sort="doc_id asc"), dl), fl="role", on="doc_id")"""))
    intercept[IllegalArgumentException](parse(
      """fetch(t, search(t, q="bee", fl="doc_id,dl", sort="doc_id asc"), fl="dl", on="doc_id")"""))
  }

  test("oracle render: one AST, both engines (smoke)") {
    val sqlStr = graft.Oracle.streamExpr(
      """rollup(search(t, q="bee", fl="doc_id,role,dl", sort="doc_id asc"), over="role", count(*), sum(dl))""")
    assert(sqlStr.contains("GROUP BY role") && sqlStr.contains("term IN ('bee')")
      && sqlStr.contains("docsattrs"))
  }

  test("having: boolean evaluator filters; nested and/or/not; guards") {
    // conv counts for "bee": c0 docs {0,1}, c1 doc {2} → gt(n_tuples,1)
    // keeps only c0
    val got = StreamExpr.run(idx,
      """having(rollup(search(t, q="bee", fl="doc_id,conv_id", sort="doc_id asc"), over="conv_id", count(*)), gt(n_tuples, 1))""")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("c0", 2L)))
    // or + not compose
    val got2 = StreamExpr.run(idx,
      """having(rollup(search(t, q="bee", fl="doc_id,conv_id", sort="doc_id asc"), over="conv_id", count(*)), or(not(gt(n_tuples, 1)), eq(n_tuples, 2)))""")
      .collect().map(_.getString(0)).toSet
    assert(got2 == Set("c0", "c1"))
    intercept[IllegalArgumentException](parse(
      """having(search(t, q="bee", fl="doc_id", sort="doc_id asc"), gt(nope, 1))"""))
    intercept[IllegalArgumentException](parse(
      """having(search(t, q="bee", fl="doc_id", sort="doc_id asc"), between(doc_id, 1))"""))
  }

  test("reduce: per-key top-n under group sort with pinned tie-break") {
    // "cat" hits docs 1 (c0, dl=3), 2 (c1, dl=3), 3 (c1, dl=7):
    // by=conv_id, sort=dl desc, n=1 → c0 keeps doc 1, c1 keeps doc 3
    val got = StreamExpr.run(idx,
      """reduce(search(t, q="cat", fl="doc_id,conv_id,dl", sort="doc_id asc"), by="conv_id", group(sort="dl desc", n=1))""")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
    assert(got == Seq((1L, "c0"), (3L, "c1")))
    // n=2 keeps both c1 docs
    val got2 = StreamExpr.run(idx,
      """reduce(search(t, q="cat", fl="doc_id,conv_id,dl", sort="doc_id asc"), by="conv_id", group(sort="dl desc", n=2))""")
      .collect().map(_.getLong(0)).toSet
    assert(got2 == Set(1L, 2L, 3L))
    intercept[IllegalArgumentException](parse(
      """reduce(search(t, q="cat", fl="doc_id", sort="doc_id asc"), by="doc_id", group(sort="doc_id asc", n=1))"""))
  }

  test("merge: UNION ALL of same-schema streams, duplicates kept; schema guard") {
    // bee → docs 0,1,2; cat → docs 1,2,3: the union keeps both copies of
    // the overlap (UNION ALL row-set contract)
    val got = StreamExpr.run(idx,
      """merge(search(t, q="bee", fl="doc_id,dl", sort="doc_id asc"), search(t, q="cat", fl="doc_id,dl", sort="doc_id asc"), on="doc_id asc")""")
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(0L, 1L, 1L, 2L, 2L, 3L))
    intercept[IllegalArgumentException](parse(
      """merge(search(t, q="bee", fl="doc_id,dl", sort="doc_id asc"), search(t, q="cat", fl="doc_id,role", sort="doc_id asc"), on="doc_id asc")"""))
    intercept[IllegalArgumentException](parse(
      """merge(search(t, q="bee", fl="doc_id", sort="doc_id asc"), search(t, q="cat", fl="doc_id", sort="doc_id asc"), on="dl asc")"""))
  }

  test("intersect / complement: semi and anti join on the stream key") {
    // bee → docs 0,1,2; dog → docs 2,3,4
    val semi = StreamExpr.run(idx,
      """intersect(search(t, q="bee", fl="doc_id,dl", sort="doc_id asc"), search(t, q="dog", fl="doc_id", sort="doc_id asc"), on="doc_id")""")
      .collect().map(_.getLong(0)).toSet
    assert(semi == Set(2L))
    val anti = StreamExpr.run(idx,
      """complement(search(t, q="bee", fl="doc_id,dl", sort="doc_id asc"), search(t, q="dog", fl="doc_id", sort="doc_id asc"), on="doc_id")""")
      .collect().map(_.getLong(0)).toSet
    assert(anti == Set(0L, 1L))
    // conv-keyed: bee's convs are c0,c1; dog's are c1,c2 → semi keeps the
    // c1 doc (2), anti the c0 docs (0, 1); right multiplicity (two dog
    // docs in c1) must NOT duplicate the left tuple
    val semiConv = StreamExpr.run(idx,
      """intersect(search(t, q="bee", fl="doc_id,conv_id", sort="doc_id asc"), search(t, q="dog", fl="doc_id,conv_id", sort="doc_id asc"), on="conv_id")""")
      .collect().map(_.getLong(0)).toSeq
    assert(semiConv == Seq(2L))
    intercept[IllegalArgumentException](parse(
      """intersect(search(t, q="bee", fl="doc_id", sort="doc_id asc"), search(t, q="dog", fl="doc_id", sort="doc_id asc"), on="conv_id")"""))
  }

  test("facet: desugars to search→rollup→top; stats: one global tuple") {
    // cat → docs 1 (assistant, 3), 2 (user, 3), 3 (assistant, 7)
    val f = parse(
      """facet(t, q="cat", buckets="role", bucketSorts="n_tuples desc", bucketSizeLimit=2, count(*), sum(dl))""")
    assert(f == TopNode(
      RollupNode(SearchNode("cat", Seq("role", "dl"), Seq(("role", true))),
        Seq("role"), Seq(MCount, MSum("dl"))),
      2, Seq(("n_tuples", false))))
    val fr = StreamExpr.run(idx,
      """facet(t, q="cat", buckets="role", bucketSorts="n_tuples desc", bucketSizeLimit=2, count(*), sum(dl))""")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(fr == Seq(("assistant", 2L, 10L), ("user", 1L, 3L)))
    val st = StreamExpr.run(idx,
      """stats(t, q="cat", count(*), sum(dl), min(dl), max(dl), avg(dl))""")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getInt(3), r.getDouble(4))).toSeq
    assert(st == Seq((3L, 13L, 3, 7, 13.0 / 3)))
    intercept[IllegalArgumentException](parse(
      """facet(t, q="cat", buckets="role", bucketSorts="n_tuples desc", count(*))"""))
    intercept[IllegalArgumentException](parse(
      """stats(t, q="cat", sum(nope))"""))
  }
}
