package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table persistence boundary. The production target is an Iceberg
  * catalog (BASELINE.json north_rule); the sandbox ships no Iceberg jar
  * (SURVEY.md §0), so the default implementation emulates the logical
  * capabilities on partitioned Parquet: atomic-enough snapshot via a JSON
  * manifest written after the data, partition-column layout (→ partition
  * pruning), and schema recording. Swapping in real Iceberg is a new
  * TableIO with `spark.read/write.format("iceberg")` + catalog config —
  * no engine code changes.
  */
trait TableIO {
  def write(df: DataFrame, path: String, partitionBy: Seq[String] = Nil,
            snapshotId: String = ""): Unit
  def read(spark: SparkSession, path: String): DataFrame
}

object ParquetTableIO extends TableIO {

  override def write(df: DataFrame, path: String,
                     partitionBy: Seq[String] = Nil,
                     snapshotId: String = ""): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(path)
    writeManifest(path, df, partitionBy, snapshotId)
  }

  override def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  private def writeManifest(path: String, df: DataFrame,
                            partitionBy: Seq[String],
                            snapshotId: String): Unit = {
    // Hadoop FS (not java.nio): the table root may be hdfs://, s3a://, ...
    val spark = df.sparkSession
    val root = new HPath(path)
    val fs: FileSystem =
      root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    var files = 0
    var totalBytes = 0L
    val it = fs.listFiles(root, true)
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) {
        files += 1
        totalBytes += f.getLen
      }
    }
    def q(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val json =
      s"""{
         |  "snapshot_id": ${q(snapshotId)},
         |  "created_ms": ${System.currentTimeMillis()},
         |  "format": "parquet",
         |  "partition_by": [${partitionBy.map(q).mkString(", ")}],
         |  "schema": ${q(df.schema.json)},
         |  "data_files": $files,
         |  "total_bytes": $totalBytes
         |}""".stripMargin
    Fs.writeString(spark, s"$path/_manifest.json", json)
  }
}
