package graft.index

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** INDEX-TIME SORTING + EARLY-TERMINATING sorted retrieval — the Lucene
  * `IndexWriterConfig.setIndexSort` / `TopFieldCollector` early-termination
  * pair (Lucene 6+; Solr `<indexSort>`): when segments are WRITTEN in sort
  * order, a query whose sort matches the index sort stops collecting after
  * k docs instead of scoring the whole segment. The canonical use on a
  * transcript corpus is time-ordered retrieval ("latest/earliest N
  * matching turns") without a corpus-wide sort at query time.
  *
  * Spark-native re-expression: the write path range-partitions the corpus
  * on the sort key (`repartitionByRange` — the global range partition IS
  * the cross-segment sort; ascending partition ids own ascending key
  * ranges by RangePartitioner's contract) and sorts within each partition
  * (the within-segment doc order), persisting one directory per range
  * bucket plus a driver-readable manifest of (bucket, rows, ts bounds).
  * The read path walks buckets IN RANGE ORDER and stops as soon as the
  * collected rows guarantee the k-th result — an unfiltered query reads
  * manifest counts only (ZERO data scanned beyond the winning prefix);
  * a filtered query counts matches bucket-by-bucket and still reads only
  * the prefix that satisfies k. Every read is partition-pruned on the
  * bucket directory column. At 10^12 turns the win is the same as
  * Lucene's: a "first k by time" query touches O(k/density) rows, not the
  * corpus.
  *
  * Determinism: the sort key is pinned to (ts, conv_id, turn_idx) — unique
  * per row, so results are independent of the sampled range boundaries
  * (which only decide HOW MANY buckets the prefix walk touches, never what
  * it returns). ts is compared as a timestamp and REPORTED as epoch
  * seconds (the no-engine-ever-hashes-a-timestamp invariant).
  */
object SortedDocs {

  /** The pinned index sort. */
  private def sortKeys: Seq[Column] =
    Seq(col("ts").asc, col("conv_id").asc, col("turn_idx").asc)

  /** Write `transcripts` as a ts-sorted bucket family under `root`:
    * `root/docs/bucket=i/` in range order plus `root/manifest`. */
  def write(spark: SparkSession, transcripts: DataFrame, root: String,
            numBuckets: Int): Unit = {
    require(numBuckets > 0, s"numBuckets must be positive (got $numBuckets)")
    transcripts
      .repartitionByRange(numBuckets, col("ts"), col("conv_id"), col("turn_idx"))
      .sortWithinPartitions(sortKeys: _*)
      .withColumn("bucket", spark_partition_id())
      .write.mode("overwrite").partitionBy("bucket").parquet(s"$root/docs")
    spark.read.parquet(s"$root/docs")
      .groupBy("bucket")
      .agg(count(lit(1)).as("rows"),
        min(col("ts").cast("long")).as("min_ts_sec"),
        max(col("ts").cast("long")).as("max_ts_sec"))
      .coalesce(1).write.mode("overwrite").parquet(s"$root/manifest")
  }

  /** The early-termination walk: the shortest PREFIX of range-ordered
    * buckets whose (filtered) row count reaches k. Unfiltered: manifest
    * counts only — no data read. Filtered: one pruned count per prefix
    * bucket (the collector pass), still never past the winning prefix. */
  def selectBuckets(spark: SparkSession, root: String, k: Int,
                    predicate: Option[Column] = None): Seq[Int] = {
    require(k > 0, s"k must be positive (got $k)")
    val order = spark.read.parquet(s"$root/manifest")
      .orderBy(col("min_ts_sec").asc, col("bucket").asc)
      .select("bucket", "rows").collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSeq
    predicate match {
      case None =>
        val picked = scala.collection.mutable.ArrayBuffer[Int]()
        var have = 0L
        val it = order.iterator
        while (have < k && it.hasNext) {
          val (b, rows) = it.next()
          picked += b
          have += rows
        }
        picked.toSeq
      case Some(p) =>
        // batched collector pass (round-5 advice): one PRUNED aggregation
        // per doubling batch of prefix buckets instead of one sequential
        // count job per bucket — a sparse predicate costs O(log buckets)
        // driver round trips, and the scanned prefix stays within 2× the
        // winning one. The first batch is the unfiltered walk's prefix
        // length (match counts can only shrink under a filter, so the
        // winning prefix is at least that long). Result identical to the
        // per-bucket walk: the local accumulation below replays it.
        val docs = spark.read.parquet(s"$root/docs")
        val cnts = scala.collection.mutable.HashMap.empty[Int, Long]
        def fetch(bs: Seq[Int]): Unit = if (bs.nonEmpty) {
          docs.where(col("bucket").isin(bs.map(Integer.valueOf): _*)).where(p)
            .groupBy("bucket").agg(count(lit(1)).as("n")).collect()
            .foreach(r => cnts(r.getInt(0)) = r.getLong(1))
          bs.foreach(b => cnts.getOrElseUpdate(b, 0L))
        }
        val buckets = order.map(_._1)
        val cum = order.map(_._2).scanLeft(0L)(_ + _).tail
        val unfilteredPrefix = cum.indexWhere(_ >= k) match {
          case -1 => buckets.size
          case i  => i + 1
        }
        val picked = scala.collection.mutable.ArrayBuffer[Int]()
        var have = 0L
        var lo = 0
        var batch = math.max(1, math.min(unfilteredPrefix, buckets.size))
        while (have < k && lo < buckets.size) {
          val bs = buckets.slice(lo, lo + batch)
          fetch(bs)
          val it = bs.iterator
          while (have < k && it.hasNext) {
            val b = it.next()
            picked += b
            have += cnts(b)
          }
          lo += bs.size
          batch *= 2
        }
        picked.toSeq
    }
  }

  /** Sorted top-k over the bucket family: read ONLY the selected prefix
    * (partition-pruned), TakeOrderedAndProject to k, rank the k rows.
    * Output: (rank, conv_id, turn_idx, role, ts_sec). */
  def topK(spark: SparkSession, root: String, k: Int,
           predicate: Option[Column] = None): DataFrame = {
    val picked = selectBuckets(spark, root, k, predicate)
    val base = spark.read.parquet(s"$root/docs")
      .where(col("bucket").isin(picked.map(Integer.valueOf): _*))
    val filtered = predicate.fold(base)(base.where)
    val top = filtered.orderBy(sortKeys: _*).limit(k)
    val w = Window.orderBy(sortKeys: _*) // ≤ k rows — never corpus-sized
    top.withColumn("rank", row_number().over(w))
      .select(col("rank").cast("int").as("rank"), col("conv_id"),
        col("turn_idx"), col("role"), col("ts").cast("long").as("ts_sec"))
      .orderBy("rank")
  }
}
