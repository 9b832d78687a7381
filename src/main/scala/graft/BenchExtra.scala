package graft

import graft.index.{BuildIndexJob, SegmentedIndex}
import graft.search.IndexSearch
import graft.sources.Transcripts
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Optimization-round measurement harness (guide §1). NOT part of the
  * driver contract — [[Bench]] is frozen; this main exists so individual
  * operators can be timed in isolation (noop-sink style), with task-level
  * attribution (#jobs, #tasks, summed task wall) to separate fixed
  * per-job overhead from real compute. Probe names come from args;
  * default runs the build + tiered probes.
  *
  * Usage: sbt "runMain graft.BenchExtra build tiered segq"
  */
object BenchExtra {

  final class Acc extends SparkListener {
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    val taskMs = new java.util.concurrent.atomic.AtomicLong
    private val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val jobLog = new java.util.concurrent.ConcurrentLinkedQueue[(Double, String)]()
    override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
      jobs.incrementAndGet()
      val site = js.stageInfos.lastOption.map(_.name.takeWhile(_ != '\n').take(60))
        .getOrElse("?")
      starts.put(js.jobId, (System.nanoTime(), site))
    }
    override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
      val s = starts.remove(je.jobId)
      if (s != null) jobLog.add(((System.nanoTime() - s._1) / 1e9, s._2))
    }
    override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
      tasks.incrementAndGet()
      if (te.taskInfo != null) taskMs.addAndGet(te.taskInfo.duration)
    }
    def snap: (Int, Int, Long) = (jobs.get, tasks.get, taskMs.get)
    def drainJobs(): Seq[(Double, String)] = {
      val b = Seq.newBuilder[(Double, String)]
      var e = jobLog.poll()
      while (e != null) { b += e; e = jobLog.poll() }
      b.result()
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.io.compression.codec",
        sys.env.getOrElse("SPARK_GRAFT_IO_CODEC", "lz4"))
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1048576")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val acc = new Acc
    spark.sparkContext.addSparkListener(acc)

    val traceJobs = sys.env.get("SPARK_GRAFT_BX_TRACE").contains("1")
    def timed[T](name: String)(body: => T): T = {
      acc.drainJobs()
      val (j0, t0, m0) = acc.snap
      val n0 = System.nanoTime()
      val r = body
      val wall = (System.nanoTime() - n0) / 1e9
      val (j1, t1, m1) = acc.snap
      println(f"[probe] $name%-28s wall=${wall}%7.2fs jobs=${j1 - j0}%4d " +
        f"tasks=${t1 - t0}%5d taskSum=${(m1 - m0) / 1e3}%8.2fs")
      if (traceJobs) {
        Thread.sleep(50)
        acc.drainJobs().groupBy(_._2)
          .map { case (site, xs) => (xs.map(_._1).sum, xs.size, site) }
          .toSeq.sortBy(-_._1).take(12)
          .foreach { case (sum, n, site) =>
            println(f"    [jobs] ${sum}%7.2fs x$n%-3d $site") }
      }
      r
    }

    val probes: Set[String] = if (args.isEmpty) Set("build", "tiered") else args.toSet
    import spark.implicits._
    val cfg8 = BuildIndexJob.Config(numShards = 8)
    val noDeletes = Seq.empty[(String, Int)].toDF("conv_id", "turn_idx")

    if (probes("build")) {
      val corpus = Transcripts.synthetic(spark, Bench.convsFor(sfDir))
      timed("synthetic_count")(corpus.count())
      val root = TempDirs.create("graft_bx_build")
      timed("index_build_full") {
        BuildIndexJob.run(spark, corpus, root, "bx-build", BuildIndexJob.Config())
      }
      val idx = IndexSearch.open(spark, root)
      timed("wand_warm")(IndexSearch.searchWand(idx, Bench.workload).count())
      (1 to 5).foreach { i =>
        timed(s"wand_rep_$i")(IndexSearch.searchWand(idx, Bench.workload).count())
      }
    }

    if (probes("tiered")) {
      val root = TempDirs.create("graft_bx_tier")
      val d = spark.read.parquet(s"$sfDir/documents.parquet")
      val n = d.count()
      (0 until 6).foreach { i =>
        val lo = i * n / 6
        val hi = if (i == 5) n + 1 else (i + 1) * n / 6
        timed(s"tiered_append_$i") {
          SegmentedIndex.append(spark, root,
            Transcripts.fromDocumentsDf(
              d.where(col("doc_id") >= lo && col("doc_id") < hi)),
            noDeletes, s"seg$i", cfg8)
        }
      }
      val upserts = Transcripts.fromDocumentsDf(
        d.where(col("doc_id") % 50 === 0 && col("doc_id") % 97 =!= 0)
          .withColumn("text", concat(col("text"), lit(" upserted"))))
      val delKeys = Transcripts.fromDocumentsDf(d.where(col("doc_id") % 97 === 0))
        .select("conv_id", "turn_idx")
      timed("tiered_append_6_upsert") {
        SegmentedIndex.append(spark, root, upserts, delKeys, "seg6", cfg8)
      }
      timed("tiered_compact") {
        SegmentedIndex.tieredCompact(spark, root,
          segsPerTier = 3, maxMergeAtOnce = 3, cfg = cfg8)
      }
      timed("tiered_wand_query") {
        SegmentedIndex.searchWand(spark, root, SparkEntry.DisjQueries, 10, cfg = cfg8).count()
      }
    }

    // any arg starting with q_ runs that declared query exactly as Bench
    // does (fn(spark, sfDir).count()), after the same prepare lines
    val qNames = args.filter(_.startsWith("q_"))
    // plan-dump mode: write each query's explain("formatted") to
    // $SPARK_GRAFT_BX_PLANDIR/<q>_$SPARK_GRAFT_BX_PLANTAG.txt instead of
    // executing it (fixture builds inside the gate lambdas still run)
    val planDir = sys.env.get("SPARK_GRAFT_BX_PLANDIR")
    if (planDir.isDefined && qNames.nonEmpty) {
      val tag = sys.env.getOrElse("SPARK_GRAFT_BX_PLANTAG", "now")
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(planDir.get))
      SparkEntry.prepareIndex(spark, sfDir)
      SparkEntry.prepareCorpus(spark, sfDir)
      if (qNames.exists(q => q.contains("segmented") || q.contains("streaming")))
        SparkEntry.prepareStream(spark, sfDir)
      val reg = SparkEntry.queries.toMap
      qNames.foreach { q =>
        reg.get(q).foreach { fn =>
          val df = fn(spark, sfDir)
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(s"${planDir.get}/${q}_$tag.txt"), plan)
          println(s"[plan] $q -> ${planDir.get}/${q}_$tag.txt")
        }
        spark.catalog.clearCache()
      }
      spark.stop()
      return
    }
    if (qNames.nonEmpty) {
      timed("prepare_index")(SparkEntry.prepareIndex(spark, sfDir))
      timed("prepare_corpus")(SparkEntry.prepareCorpus(spark, sfDir))
      if (qNames.exists(_.contains("segmented")) || qNames.exists(_.contains("streaming")))
        timed("prepare_stream")(SparkEntry.prepareStream(spark, sfDir))
      val reg = SparkEntry.queries.toMap
      qNames.foreach { q =>
        reg.get(q) match {
          case Some(fn) => timed(q)(fn(spark, sfDir).count())
          case None => println(s"[probe] $q UNKNOWN")
        }
        spark.catalog.clearCache()
      }
    }

    if (probes("minhash")) {
      import graft.ops.Dedup
      val d = spark.read.parquet(s"$sfDir/documents.parquet")
        .select("doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism)
      val sh = Dedup.shingles(d, 3).cache()
      timed("mh_shingles_count")(sh.count())
      val fps = sh.groupBy("doc_id").agg(
        md5(array_join(array_sort(collect_list(col("term"))), "")).as("_fp"))
      timed("mh_fps")(fps.write.format("noop").mode("overwrite").save())
      val sigs = Dedup.minhashSignatures(sh)
      timed("mh_signatures")(sigs.write.format("noop").mode("overwrite").save())
      val b = Dedup.bands(sigs)
      timed("mh_bands")(b.write.format("noop").mode("overwrite").save())
      val cand = b.as("x").join(b.as("y"),
          col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
        .distinct()
      timed("mh_band_selfjoin")(cand.write.format("noop").mode("overwrite").save())
      timed("mh_full")(Dedup.minhashPairs(d, 0.7).count())
      sh.unpersist()
    }

    if (probes("segq")) {
      // one already-built segmented fixture query, repeated: fixed cost
      val root = TempDirs.create("graft_bx_seg")
      val d = spark.read.parquet(s"$sfDir/documents.parquet")
      val n = d.count()
      Seq((0L, n / 2), (n / 2, n + 1)).zipWithIndex.foreach { case ((lo, hi), i) =>
        timed(s"segq_append_$i") {
          SegmentedIndex.append(spark, root,
            Transcripts.fromDocumentsDf(
              d.where(col("doc_id") >= lo && col("doc_id") < hi)),
            noDeletes, s"seg$i", cfg8)
        }
      }
      (1 to 3).foreach { r =>
        timed(s"segq_search_$r") {
          SegmentedIndex.search(spark, root, SparkEntry.DisjQueries, 10, cfg = cfg8).count()
        }
      }
      (1 to 3).foreach { r =>
        timed(s"segq_wand_$r") {
          SegmentedIndex.searchWand(spark, root, SparkEntry.DisjQueries, 10, cfg = cfg8).count()
        }
      }
    }

    spark.stop()
  }
}
