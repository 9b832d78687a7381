package graft

import graft.index.{BuildIndexJob, IndexMerge}
import graft.search.IndexSearch
import graft.sources.Transcripts
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class MergeSpec extends SparkSpec {
  import spark.implicits._

  def tmp(): String = java.nio.file.Files.createTempDirectory("graftmrg").toString
  val cfg = BuildIndexJob.Config(numShards = 4, blockSize = 8, saltTarget = 64)
  val queries = Seq(1 -> "w1 w3", 2 -> "w2", 3 -> "zzzraretwo", 4 -> "w5 w9 w40")

  def results(root: String) =
    IndexSearch.search(IndexSearch.open(spark, root), queries)
      .orderBy("query_id", "rank").collect().toSeq

  def index(df: DataFrame, id: String): String = {
    val r = tmp(); BuildIndexJob.run(spark, df, r, id, cfg); r
  }

  val noTombstones: DataFrame =
    Seq.empty[(String, Int)].toDF("conv_id", "turn_idx")

  test("merge(batch1, batch2) ≡ full rebuild over batch1 ∪ batch2") {
    val all = Transcripts.synthetic(spark, 120)
    val batch1 = all.where($"conv_id" < "conv00000080")
    val batch2 = all.where($"conv_id" >= "conv00000080")
    val oldRoot = index(batch1, "m1")
    val mergedRoot = tmp()
    IndexMerge.run(spark, oldRoot, batch2, noTombstones, mergedRoot, "m2", cfg)
    val fullRoot = index(all, "m3")
    assert(results(mergedRoot) == results(fullRoot))
    // artifacts equal as sets, not just search output
    for (a <- Seq("docs", "tfdl", "dictionary")) {
      val m = spark.read.parquet(s"$mergedRoot/$a")
      val f = spark.read.parquet(s"$fullRoot/$a")
      assert(m.exceptAll(f).count() == 0 && f.exceptAll(m).count() == 0, a)
    }
  }

  test("upsert: new batch replaces rows with the same key") {
    val base = Transcripts.synthetic(spark, 50)
    val oldRoot = index(base, "u1")
    // overwrite (conv 1, turn 1) — the turn holding zzzraretwo
    val upsert = Seq(("conv00000001", 1, "user", "totally replaced text", null: String,
      new java.sql.Timestamp(0L))).toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
    val newRoot = tmp()
    IndexMerge.run(spark, oldRoot, upsert, noTombstones, newRoot, "u2", cfg)
    val idx = IndexSearch.open(spark, newRoot)
    assert(IndexSearch.search(idx, Seq(1 -> "zzzraretwo")).count() == 0)
    assert(IndexSearch.search(idx, Seq(1 -> "replaced")).count() == 1)
    // equivalent full rebuild agrees
    val rebuilt = index(base.where(!($"conv_id" === "conv00000001" && $"turn_idx" === 1))
      .unionByName(upsert), "u3")
    assert(results(newRoot) == results(rebuilt))
  }

  test("tombstones delete documents from docs and postings") {
    val base = Transcripts.synthetic(spark, 50)
    val oldRoot = index(base, "d1")
    val dead = Seq(("conv00000001", 1)).toDF("conv_id", "turn_idx")
    val newRoot = tmp()
    IndexMerge.run(spark, oldRoot,
      spark.emptyDataFrame.selectExpr().limit(0).crossJoin(base.limit(0)), // empty batch, same schema
      dead, newRoot, "d2", cfg)
    val idx = IndexSearch.open(spark, newRoot)
    assert(IndexSearch.search(idx, Seq(1 -> "zzzraretwo")).count() == 0)
    val full = index(base.where(!($"conv_id" === "conv00000001" && $"turn_idx" === 1)), "d3")
    assert(results(newRoot) == results(full))
  }
}
