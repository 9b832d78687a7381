package graft

import graft.ops.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"
  lazy val media = Multimodal.mediaTable(spark, dir).cache()

  test("media table: binary payload with kind metadata") {
    val schema = media.schema
    assert(schema("payload").dataType.typeName == "binary")
    val kinds = media.select("kind").distinct().collect().map(_.getString(0)).toSet
    assert(kinds == Set("image", "audio"))
  }

  test("partition-batched decode: schema, determinism, full coverage") {
    val f = Multimodal.decode(media)
    assert(f.columns.toSeq == Seq("media_id", "kind", "n_bytes", "sig",
      "width", "height", "sample_rate", "duration_ms"))
    assert(f.count() == media.count())
    // deterministic under different partitioning (batch boundaries move)
    val a = f.collect().toSeq
    val b = Multimodal.decode(media.repartition(7)).collect().toSeq
    assert(a == b)
    // kind-specific metadata populated
    assert(f.where(col("kind") === "image" && col("width") <= 0).count() == 0)
    assert(f.where(col("kind") === "audio" && col("sample_rate") =!= 16000).count() == 0)
  }

  test("resize truncates payloads; frame sampling covers the payload") {
    val r = Multimodal.resize(media, 100)
    assert(r.where(col("n_bytes") > 100).count() == 0)
    val frames = Multimodal.sampleFrames(media, 256, 2)
    assert(frames.where(col("frame_bytes") > 256).count() == 0)
    // stride 2 keeps only even frame indices
    assert(frames.where(pmod(col("frame_idx"), lit(2)) =!= 0).count() == 0)
    assert(frames.count() > 0)
  }
}
