package graft

import graft.index.BuildIndexJob
import graft.search.IndexSearch
import graft.sources.Transcripts
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** N → 4N scaling evidence (BASELINE.md): the same index-build job and the
  * same WAND query workload run at two local parallelism levels (local[N]
  * with shuffle.partitions = N, then local[4N]) over the SAME input —
  * the sandbox stand-in for N vs 4N executors (no real cluster available;
  * see SURVEY.md §0). Prints one JSON line with throughput at both sizes
  * and the scaling efficiency (thr@4N / thrN) / 4.
  *
  * Two box-vs-job separations baked into the measurement:
  *
  *  - Storage: shuffle dirs and index artifacts live on tmpfs (/dev/shm)
  *    when available. A 4N-executor cluster brings 4N disks; this box has
  *    ONE (~550 MB/s) — leaving artifacts on it measures the disk, not
  *    the job. RAM-backed storage is the faithful single-box analog of
  *    storage that scales with compute. Override with
  *    SPARK_GRAFT_BENCH_TMP.
  *  - CPU ceiling: the same session pair also times a pure-CPU,
  *    shuffle-free Spark job (range → xxhash64 → sum). Its N→4N
  *    efficiency is the box's attainable ceiling for ANY job at these
  *    thread counts (this VM's per-core throughput drops as more vCPUs
  *    run — hypervisor-level, measured also with plain multiprocessing).
  *    `build_eff_vs_ceiling` = build efficiency / ceiling isolates what
  *    the JOB loses beyond what the box takes.
  *
  * Usage: runMain graft.ScalingBench [nCores] [convs]  (defaults 8, 6000)
  */
object ScalingBench {

  def tmpBase: String = sys.env.getOrElse("SPARK_GRAFT_BENCH_TMP",
    if (new java.io.File("/dev/shm").isDirectory) "/dev/shm/graft_bench"
    else System.getProperty("java.io.tmpdir"))

  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 8
    val convs = if (args.length > 1) args(1).toLong else 6000L
    val base = s"$tmpBase/run_${System.nanoTime()}"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(base))

    def rmrf(p: String): Unit = {
      val f = new java.io.File(p)
      if (f.isDirectory) f.listFiles().foreach(c => rmrf(c.getPath))
      f.delete()
    }

    def measure(cores: Int): (Long, Double, Double, Double) = {
      val spark = SparkSession.builder()
        .master(s"local[$cores]")
        .appName(s"scaling-$cores")
        .config("spark.sql.shuffle.partitions", cores.toString)
        .config("spark.local.dir", s"$base/localdir-$cores")
        // shuffle/spill/broadcast codec, A/B'd at 8→32 on 1.7M turns
        // (2026-08-16, tmpfs shuffle): zstd's smaller shuffle did NOT pay —
        // lz4 raw eff 0.606 / eff-vs-ceiling 1.05 vs zstd 0.552 / 0.825;
        // zstd's compression CPU costs more than the byte savings return
        // when shuffle already lives in RAM. lz4 stays default; the env
        // knob remains for disk-shuffle deployments where bytes are dear.
        .config("spark.io.compression.codec",
          sys.env.getOrElse("SPARK_GRAFT_IO_CODEC", "lz4"))
        .config("spark.sql.files.maxPartitionBytes", "16m")
        .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1048576")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      try {
        val corpus = Transcripts.synthetic(spark, convs)
        val nTurns = corpus.count()
        // pure-CPU ceiling probe: no shuffle, no IO, codegen'd hash+sum
        def cpuProbe(): Double = {
          val t0 = System.nanoTime()
          spark.range(0, 1500000000L, 1, cores)
            .select(bit_xor(xxhash64(col("id")))).head()
          (System.nanoTime() - t0) / 1e9
        }
        cpuProbe() // warm codegen
        val cpuSec = math.min(cpuProbe(), cpuProbe())
        // JVM/codegen warmup so the N measurement isn't penalized by JIT
        val warm = s"$base/warm-$cores"
        BuildIndexJob.run(spark, Transcripts.synthetic(spark, 100), warm,
          s"warm-$cores", BuildIndexJob.Config())
        rmrf(warm)
        // best of 2 timed reps: single-shot build times swing ±30% with
        // page-cache/GC state; best-of within one JVM is far more stable
        var buildSec = Double.MaxValue
        var root = ""
        for (rep <- 1 to 2) {
          val r = s"$base/scale-$cores-$rep"
          val t0 = System.nanoTime()
          BuildIndexJob.run(spark, corpus, r, s"scale-$cores-$rep",
            BuildIndexJob.Config())
          val sec = (System.nanoTime() - t0) / 1e9
          if (sec < buildSec) { buildSec = sec; root = r }
        }
        val idx = IndexSearch.open(spark, root)
        IndexSearch.searchWand(idx, Bench.workload).count() // warmup
        val reps = 3
        val q0 = System.nanoTime()
        var i = 0
        while (i < reps) { IndexSearch.searchWand(idx, Bench.workload).count(); i += 1 }
        val qSec = (System.nanoTime() - q0) / 1e9
        for (rep <- 1 to 2) rmrf(s"$base/scale-$cores-$rep")
        (nTurns, nTurns / buildSec, Bench.workload.size * reps / qSec,
          1500000000L / cpuSec)
      } finally {
        spark.stop()
        SparkSession.clearActiveSession()
        SparkSession.clearDefaultSession()
      }
    }

    try {
      val (turns, thrN, qpsN, cpuN) = measure(n)
      val (_, thr4N, qps4N, cpu4N) = measure(4 * n)
      val eff = (thr4N / thrN) / 4.0
      val qEff = (qps4N / qpsN) / 4.0
      val cpuEff = (cpu4N / cpuN) / 4.0
      val line =
        s"""{"metric":"scaling_efficiency","value":$eff,"unit":"ratio",""" +
          s""""n_cores":$n,"turns":$turns,""" +
          s""""build_turns_per_sec_N":$thrN,"build_turns_per_sec_4N":$thr4N,""" +
          s""""wand_qps_N":$qpsN,"wand_qps_4N":$qps4N,""" +
          s""""query_scaling_efficiency":$qEff,""" +
          s""""cpu_ceiling_efficiency":$cpuEff,""" +
          s""""build_eff_vs_ceiling":${eff / cpuEff}}"""
      println(line)
      val outFile = sys.env.getOrElse("SPARK_GRAFT_SCALING_OUT", "SCALING.out.json")
      java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), line + "\n")
    } finally rmrf(base)
  }
}
