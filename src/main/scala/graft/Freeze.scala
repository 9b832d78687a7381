package graft

import graft.index.BuildIndexJob
import graft.search.IndexSearch
import graft.sources.{QuerySet, Transcripts}
import org.apache.spark.sql.SparkSession

/** Writes the frozen fixture artifacts (FIXTURES.md §C/§E) into
  * `fixtures/`:
  *
  *  - queries_seed42.parquet — the 50-query §C reference set
  *    ([[QuerySet.reference]]); GoldenSpec asserts artifact ≡ generator.
  *  - golden/topk_seed42.parquet — (query_id, rank, doc_id, score) top-10
  *    for that set over the §B seed-42 synthetic corpus (200
  *    conversations, the GoldenSpec corpus), computed through the full
  *    persisted-index path. GoldenSpec regression-diffs engine output
  *    against this file on every run.
  *
  * Run once per INTENTIONAL behavior change (analyzer, scoring, ranking,
  * doc-id semantics) and commit the refreshed artifacts — an unintentional
  * diff is a behavioral break caught by GoldenSpec.
  *
  * Usage: runMain graft.Freeze [outDir]   (default "fixtures")
  */
object Freeze {

  def main(args: Array[String]): Unit = {
    val outDir = if (args.nonEmpty) args(0) else "fixtures"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    QuerySet.reference.toDF("query_id", "text")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$outDir/queries_seed42.parquet")

    val root = TempDirs.create("graft_freeze")
    BuildIndexJob.run(spark, Transcripts.synthetic(spark, 200), root, "freeze",
      BuildIndexJob.Config(numShards = 8, blockSize = 32))
    IndexSearch.search(IndexSearch.open(spark, root), QuerySet.reference, k = 10)
      .orderBy("query_id", "rank")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$outDir/golden/topk_seed42.parquet")

    System.err.println(s"[freeze] wrote $outDir/queries_seed42.parquet and " +
      s"$outDir/golden/topk_seed42.parquet")
    spark.stop()
  }
}
