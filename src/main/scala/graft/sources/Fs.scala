package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Small-file operations (stage markers, manifests, generation pointers)
  * through the Hadoop FileSystem API, so an index root on hdfs:// or
  * s3a:// behaves exactly like file:// — java.nio would silently treat
  * such URIs as driver-local relative paths (SURVEY.md §8 review note). */
object Fs {

  private def fs(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def exists(spark: SparkSession, path: String): Boolean =
    fs(spark, path).exists(new Path(path))

  def writeString(spark: SparkSession, path: String, content: String): Unit = {
    val f = fs(spark, path)
    val out = f.create(new Path(path), true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
  }

  def readString(spark: SparkSession, path: String): String = {
    val f = fs(spark, path)
    val in = f.open(new Path(path))
    try new String(in.readAllBytes(), "UTF-8") finally in.close()
  }

  def delete(spark: SparkSession, path: String): Unit =
    fs(spark, path).delete(new Path(path), true)

  /** Atomic publish: write tmp, rename OVER the target in one operation
    * (FileContext rename with OVERWRITE — atomic on local and HDFS). The
    * naive delete-then-rename leaves a window where a crash strands the
    * pointer missing entirely, which readers would misread as "never
    * initialized"; OVERWRITE closes that window. Filesystems without
    * FileContext support fall back to delete+rename, and readers must
    * treat a missing pointer as a possible crash (see
    * [[graft.streaming.StreamingIngest.ingestBatch]]). */
  def publishString(spark: SparkSession, path: String, content: String): Unit = {
    val f = fs(spark, path)
    val tmp = new Path(path + ".tmp")
    val out = f.create(tmp, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
    try {
      val fc = org.apache.hadoop.fs.FileContext.getFileContext(
        f.getUri, spark.sparkContext.hadoopConfiguration)
      fc.rename(tmp, new Path(path), org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    } catch {
      case _: UnsupportedOperationException | _: java.io.FileNotFoundException =>
        f.delete(new Path(path), false)
        if (!f.rename(tmp, new Path(path)))
          throw new java.io.IOException(s"publish rename failed for $path")
    }
  }
}
