package graft

import graft.analysis.Analyzer
import graft.sources.Transcripts
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic for the N→4N scaling number (BASELINE.md): times the build's
  * PRIMITIVE operations — columnar scan, tokenize+aggregate (pure CPU),
  * key shuffle, parquet write — at two local parallelism levels, each in
  * its own JVM-session, over the SAME materialized input. Separates "the
  * job doesn't parallelize" from "the box's shared memory bus / page
  * cache / disk saturates": primitives that scale well but compose into a
  * stage that doesn't indicate a per-stage fixed cost; primitives that
  * themselves plateau indicate the box.
  *
  * Usage: runMain graft.StageProbe [nCores] [convs]   (defaults 8, 100000)
  * Prints one JSON line: per-primitive seconds at N and 4N + ratios.
  */
object StageProbe {

  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 8
    val convs = if (args.length > 1) args(1).toLong else 100000L

    // materialize the corpus ONCE so both levels read identical bytes
    val inputDir = {
      val dir = TempDirs.create("graft_probe_in")
      val s = SparkSession.builder().master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false").getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      Transcripts.synthetic(s, convs).write.mode("overwrite").parquet(dir)
      s.stop()
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
      dir
    }

    def measure(cores: Int): Map[String, Double] = {
      val spark = SparkSession.builder()
        .master(s"local[$cores]")
        .appName(s"probe-$cores")
        .config("spark.sql.shuffle.partitions", cores.toString)
        .config("spark.sql.files.maxPartitionBytes", "16m")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      try {
        val t = spark.read.parquet(inputDir)
        def time(body: => Unit): Double = {
          val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
        }
        def best2(body: => Unit): Double = { val a = time(body); math.min(a, time(body)) }
        val out = scala.collection.mutable.LinkedHashMap.empty[String, Double]
        // warmup (codegen, page cache)
        t.agg(count(lit(1))).head()
        out("scan_text") = best2 {
          t.agg(sum(length(col("text")))).head()
        }
        out("tokenize_cpu") = best2 {
          t.agg(sum(size(Analyzer.tokens(col("text"))))).head()
        }
        out("tf_agg") = best2 {
          t.select(explode(Analyzer.tokens(col("text"))).as("term"))
            .groupBy("term").agg(count(lit(1))).agg(count(lit(1))).head()
        }
        out("key_shuffle_full_rows") = best2 {
          t.repartition(col("conv_id"), col("turn_idx"))
            .agg(sum(length(col("text")))).head()
        }
        val w = s"$inputDir-w-$cores" // sibling of the corpus dir; cleaned with it
        out("parquet_write_full") = best2 {
          t.write.mode("overwrite").parquet(s"$w/full")
        }
        out("shuffle_write_full") = best2 {
          t.repartition(col("conv_id"), col("turn_idx"))
            .write.mode("overwrite").parquet(s"$w/shuf")
        }
        out.toMap
      } finally {
        spark.stop()
        SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
      }
    }

    def rmrf(p: String): Unit = {
      val f = new java.io.File(p)
      if (f.isDirectory) f.listFiles().foreach(c => rmrf(c.getPath))
      f.delete()
    }

    try {
      val a = measure(n)
      val b = measure(4 * n)
      val keys = Seq("scan_text", "tokenize_cpu", "tf_agg",
        "key_shuffle_full_rows", "parquet_write_full", "shuffle_write_full")
      val fields = keys.map { k =>
        val eff = (a(k) / b(k)) / 4.0
        f""""$k":{"N_sec":${a(k)}%.3f,"4N_sec":${b(k)}%.3f,"eff":$eff%.3f}"""
      }
      println(s"""{"metric":"stage_probe","n_cores":$n,"convs":$convs,${fields.mkString(",")}}""")
    } finally {
      rmrf(inputDir)
      rmrf(s"$inputDir-w-$n")
      rmrf(s"$inputDir-w-${4 * n}")
    }
  }
}
