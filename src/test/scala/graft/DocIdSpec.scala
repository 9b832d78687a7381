package graft

import graft.index.IndexBuild
import graft.sources.Transcripts
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class DocIdSpec extends SparkSpec {
  import spark.implicits._

  def globalIds(df: org.apache.spark.sql.DataFrame) =
    df.withColumn("doc_id",
      row_number().over(Window.orderBy("conv_id", "turn_idx")).cast("long") - 1)

  test("two-phase doc-id assignment ≡ global row_number") {
    val t = Transcripts.synthetic(spark, 100)
    val got = IndexBuild.assignDocIds(IndexBuild.ingest(t), 7)
      .select("doc_id", "conv_id", "turn_idx")
      .orderBy("doc_id").collect().toSeq
    val want = globalIds(IndexBuild.ingest(t))
      .select("doc_id", "conv_id", "turn_idx")
      .orderBy("doc_id").collect().toSeq
    assert(got == want)
  }

  test("doc ids invariant under input shuffling/partitioning") {
    val t = Transcripts.synthetic(spark, 60)
    val base = IndexBuild.assignDocIds(IndexBuild.ingest(t), 5)
      .select("doc_id", "conv_id", "turn_idx", "text")
      .orderBy("doc_id").collect().toSeq
    // same rows, adversarial order + different partitioning + other parts
    val shuffled = t.orderBy(rand(123)).repartition(13)
    val again = IndexBuild.assignDocIds(IndexBuild.ingest(shuffled), 3)
      .select("doc_id", "conv_id", "turn_idx", "text")
      .orderBy("doc_id").collect().toSeq
    assert(again == base)
  }

  test("per-turn text equality invariant: regeneration is bit-identical") {
    val a = Transcripts.synthetic(spark, 50).orderBy("conv_id", "turn_idx")
      .collect().toSeq
    val b = Transcripts.synthetic(spark, 50).repartition(11)
      .orderBy("conv_id", "turn_idx").collect().toSeq
    assert(a == b)
  }

  test("synthetic corpus shape: multi-turn, roles, pinned rare terms") {
    val t = Transcripts.synthetic(spark, 50).cache()
    val perConv = t.groupBy("conv_id").count().collect().map(_.getLong(1))
    assert(perConv.forall(n => n >= 2 && n <= 15))
    val roles = t.select("role").distinct().collect().map(_.getString(0)).toSet
    assert(roles.subsetOf(Set("user", "assistant", "tool")))
    assert(t.where($"role" === "tool" && $"tool".isNull).count() == 0)
    assert(t.where($"role" =!= "tool" && $"tool".isNotNull).count() == 0)
    assert(t.where($"text".contains("zzzrareone")).count() == 1)
    assert(t.where($"text".contains("zzzraretwo")).count() == 1)
    assert(t.where($"text".contains("zzzrarethree")).count() == 1)
    t.unpersist()
  }

  test("ingest drops empty/null text and duplicate keys") {
    val rows = Seq(
      ("c1", 0, "user", "hello world", null: String),
      ("c1", 0, "user", "dup key", null: String),
      ("c1", 1, "assistant", "", null: String),
      ("c2", 0, "user", null: String, null: String))
      .toDF("conv_id", "turn_idx", "role", "text", "tool")
    val got = IndexBuild.ingest(rows)
    assert(got.count() == 1)
    assert(got.head().getAs[String]("text").nonEmpty)
  }
}
