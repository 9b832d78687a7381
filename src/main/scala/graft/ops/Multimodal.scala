package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads as opaque `binary` columns
  * with typed metadata, processed partition-batched (the Scala analog of
  * `mapInPandas` — iterator-in/iterator-out per partition, so a real
  * decoder could amortize model/codec init per batch, never per row).
  *
  * The container ships no image/audio codecs, so the DECODE step is a
  * [[MediaDecoder]] interface with a clearly-marked deterministic fake;
  * everything Spark-side — schema, binary handling, batch shape,
  * partitioning, metadata propagation — is real and tested. The fake
  * derives every output from md5/length of the payload, which makes the
  * whole pipeline DuckDB-oracle-checkable.
  */
object Multimodal {

  /** Decoded per-item features. For images: width/height; for audio:
    * sample_rate/duration_ms; `sig` fingerprints the payload. */
  final case class MediaFeatures(media_id: Long, kind: String,
                                 n_bytes: Int, sig: String,
                                 width: Int, height: Int,
                                 sample_rate: Int, duration_ms: Long)

  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])

  /** The codec boundary. A production implementation wraps an image/audio
    * library; the sandbox has none, so [[DeterministicFakeDecoder]] stands
    * in (STUB — marked; swap via [[decode]]'s parameter). */
  trait MediaDecoder extends Serializable {
    /** Called once per partition batch — init amortization point. */
    def decodeBatch(rows: Iterator[MediaRow]): Iterator[MediaFeatures]
  }

  /** STUB decoder: all "decoded" values are pure functions of the payload
    * bytes (md5 + length), bit-reproducible in the SQL oracle. */
  object DeterministicFakeDecoder extends MediaDecoder {
    override def decodeBatch(rows: Iterator[MediaRow]): Iterator[MediaFeatures] = {
      // per-partition "codec init" happens here, once
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        md.reset()
        val sig = md.digest(r.payload).map("%02x".format(_)).mkString
        val h = java.lang.Long.parseLong(sig.substring(0, 8), 16)
        val isImage = r.kind == "image"
        MediaFeatures(r.media_id, r.kind, r.payload.length, sig,
          width = if (isImage) (64 + (h % 192)).toInt else 0,
          height = if (isImage) (64 + ((h / 192) % 192)).toInt else 0,
          sample_rate = if (!isImage) 16000 else 0,
          duration_ms = if (!isImage) r.payload.length.toLong * 1000 / 16 else 0L)
      }
    }
  }

  /** Deterministic media table derived from the documents fixture: the
    * payload is the utf-8 text bytes (a stand-in blob the oracle can
    * reproduce with encode()), kind alternates by id. */
  def mediaTable(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").as("media_id"),
        when(col("doc_id") % 2 === 0, "image").otherwise("audio").as("kind"),
        encode(col("text"), "UTF-8").as("payload"))

  /** Partition-batched decode (mapPartitions over a typed Dataset — the
    * iterator shape is the contract a vectorized/py-batched impl needs). */
  def decode(media: DataFrame,
             decoder: MediaDecoder = DeterministicFakeDecoder): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "kind", "payload").as[MediaRow]
      .mapPartitions(rows => decoder.decodeBatch(rows))
      .toDF()
      .orderBy("media_id")
  }

  /** "Resize" stub: deterministic payload transform that keeps the binary
    * column shape (slice to ≤ newBytes) + records the target dims. */
  def resize(media: DataFrame, maxBytes: Int): DataFrame =
    media.select(col("media_id"), col("kind"),
        expr(s"substring(payload, 1, $maxBytes)").as("payload"))
      .withColumn("n_bytes", length(col("payload")).cast("int"))
      .orderBy("media_id")

  /** Frame-sampling stub: split the payload into fixed-size "frames" and
    * keep every `stride`-th — the array-of-binary column shape a video
    * pipeline produces. Output exploded: (media_id, frame_idx, frame). */
  def sampleFrames(media: DataFrame, frameBytes: Int, stride: Int): DataFrame =
    media
      // empty payloads emit no frames (and Spark's sequence(0, -1) would
      // otherwise infer step -1 and yield [0, -1] — a bogus frame row)
      .where(length(col("payload")) > 0)
      .withColumn("_n", ceil(length(col("payload")) / lit(frameBytes.toDouble)).cast("int"))
      .select(col("media_id"),
        posexplode(transform(sequence(lit(0), col("_n") - 1),
          i => col("payload").substr(i * frameBytes + 1, lit(frameBytes))))
          .as(Seq("frame_idx", "frame")))
      .where(pmod(col("frame_idx"), lit(stride)) === 0)
      .select(col("media_id"), col("frame_idx"),
        length(col("frame")).cast("int").as("frame_bytes"),
        md5(col("frame")).as("frame_sig"))
      .orderBy("media_id", "frame_idx")

}
