package graft.streaming

import graft.index.{BuildIndexJob, IndexMerge}
import graft.sources.Fs
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Structured-Streaming ingest (SURVEY.md §2.10 extension): a stream of
  * transcript batches folds into the index incrementally. Each micro-batch
  * runs [[IndexMerge]] into a NEW generation directory and atomically
  * publishes it via a CURRENT pointer file — readers always see a complete
  * snapshot (the parquet-side emulation of Iceberg snapshot commit).
  * Structured Streaming's own checkpoint makes batch delivery
  * exactly-once across restarts; the engine's stage markers make a single
  * merge resumable within a batch.
  */
object StreamingIngest {

  /** Transcript input schema for the file stream. */
  val transcriptSchema: StructType = StructType.fromDDL(
    "conv_id STRING, turn_idx INT, role STRING, text STRING, tool STRING, ts TIMESTAMP")

  def currentGeneration(spark: SparkSession, root: String): Option[String] = {
    val p = s"$root/CURRENT"
    if (Fs.exists(spark, p)) Some(s"$root/${Fs.readString(spark, p).trim}")
    else None
  }

  /** Fold one batch into the index (also usable outside streaming).
    * Idempotent under micro-batch REPLAY: if this batch's generation is
    * already the published CURRENT (crash landed between publish and the
    * streaming checkpoint commit), the replay is a no-op — merging a
    * generation into itself would read and overwrite the same files. A
    * half-written generation that never published is wiped by
    * [[IndexMerge.run]] and rebuilt. */
  def ingestBatch(spark: SparkSession, root: String, batch: DataFrame,
                  batchId: Long, cfg: BuildIndexJob.Config): Unit = {
    if (batch.isEmpty) return
    val gen = s"gen-$batchId"
    val genPath = s"$root/$gen"
    currentGeneration(spark, root) match {
      case Some(cur) if cur == genPath => // replayed, already applied
      case None =>
        BuildIndexJob.run(spark, batch, genPath, s"stream-$batchId", cfg)
        Fs.publishString(spark, s"$root/CURRENT", gen)
      case Some(old) =>
        import spark.implicits._
        val noTombstones = Seq.empty[(String, Int)].toDF("conv_id", "turn_idx")
        IndexMerge.run(spark, old, batch, noTombstones, genPath,
          s"stream-$batchId", cfg)
        Fs.publishString(spark, s"$root/CURRENT", gen)
    }
  }

  /** Start the file-source ingest stream: every parquet file landing in
    * `inputDir` becomes (part of) a micro-batch. */
  def start(spark: SparkSession, inputDir: String, indexRoot: String,
            checkpointDir: String,
            cfg: BuildIndexJob.Config = BuildIndexJob.Config(),
            maxFilesPerTrigger: Int = 1): StreamingQuery = {
    spark.readStream
      .schema(transcriptSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(inputDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatch(batch.sparkSession, indexRoot, batch, batchId, cfg)
      }
      .start()
  }

  /** Streaming diagnostics: per-minute turn counts by role with a
    * watermark (late rows beyond 2 minutes are dropped and accounted by
    * the lineage of the NEXT batch, not silently lost at merge — they
    * simply arrive in a later generation). */
  def turnRates(stream: DataFrame): DataFrame =
    stream
      .withWatermark("ts", "2 minutes")
      .groupBy(window(col("ts"), "1 minute"), col("role"))
      .agg(count(lit(1)).as("turns"))
      .select(col("window.start").as("minute"), col("role"), col("turns"))
}
