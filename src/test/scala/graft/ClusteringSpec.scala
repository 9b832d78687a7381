package graft

import graft.index.BuildIndexJob
import graft.search.{Clustering, IndexSearch}

/** Solr ClusteringComponent analog ([[graft.search.Clustering]]):
  * hand-audited label assignment (min df, then min term), cluster
  * formation, and the __other__ fold on a 4-doc corpus. */
class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  def tmp(): String = java.nio.file.Files.createTempDirectory("graftcl").toString
  def ts(i: Int) = new java.sql.Timestamp(1704067200000L + i * 1000L)

  // df: rarepair 2, alpha 4, beta 3, gamma 3, soloterm 1 →
  // labels: doc0 rarepair, doc1 rarepair, doc2 beta (min-df tie {beta,
  // gamma} broken by term), doc3 soloterm
  lazy val idx: IndexSearch.OpenIndex = {
    val turns = Seq(
      ("c0", 0, "user", "rarepair alpha beta", null.asInstanceOf[String], ts(0)),
      ("c1", 0, "user", "rarepair alpha gamma", null.asInstanceOf[String], ts(1)),
      ("c2", 0, "user", "alpha beta gamma", null.asInstanceOf[String], ts(2)),
      ("c3", 0, "user", "alpha beta gamma soloterm", null.asInstanceOf[String], ts(3)))
      .toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
    val root = tmp()
    BuildIndexJob.run(spark, turns, root, "cl", BuildIndexJob.Config(numShards = 2))
    IndexSearch.open(spark, root)
  }

  private def run(qs: Seq[(Int, String)]): Seq[(Int, String, Int, String)] =
    Clustering.clusters(idx, qs)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getInt(2), r.getString(3)))
      .toSeq

  test("shared rarest term clusters; singletons fold into __other__") {
    // "alpha" matches all 4 docs: docs 0,1 share label rarepair (a real
    // cluster); docs 2,3 are label singletons → one __other__ bucket.
    // Equal sizes order by label asc ('_' < 'r').
    assert(run(Seq(1 -> "alpha")) == Seq(
      (1, "__other__", 2, "2,3"),
      (1, "rarepair", 2, "0,1")))
  }

  test("all-singleton result set is one __other__ bucket; empty match set is empty") {
    // "beta" matches docs 0, 2, 3 with labels rarepair/beta/soloterm —
    // all singletons
    assert(run(Seq(1 -> "beta")) == Seq((1, "__other__", 3, "0,2,3")))
    assert(run(Seq(1 -> "zzznothing")).isEmpty)
  }

  test("guards: minClusterSize below 2 fails loudly") {
    intercept[IllegalArgumentException](
      Clustering.clusters(idx, Seq(1 -> "alpha"), minClusterSize = 1))
    intercept[IllegalArgumentException](
      Clustering.clusters(idx, Seq(1 -> "alpha"), k = 0))
  }
}
