package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The frozen 50-query reference set (FIXTURES.md §C) and its S2 source.
  *
  * The set is a pure function (no Random, no clock) so the parquet
  * artifact at fixtures/queries_seed42.parquet, the oracle SQL literals,
  * and this generator can only agree or visibly diverge — GoldenSpec
  * asserts artifact ≡ generator. Coverage per §C: single rare / hot / mid
  * terms (incl. the three pinned zzz* rare terms), 2–4-term ORs,
  * AND-shaped multi-terms, absent terms (empty result), duplicate-term
  * queries (each distinct term contributes once — pinned semantics), and
  * mixed-case/punctuated inputs (analyzer canonicalization).
  */
object QuerySet {

  /** 50 queries, ids 1..50. */
  val reference: Seq[(Int, String)] = {
    def w(i: Int) = s"w$i"
    val hot = (1 to 8).map(i => w(i))                         // 8 single hot
    val mid = (0 until 8).map(i => w(101 + 37 * i))           // 8 single mid
    val rare = (0 until 5).map(i => w(3001 + 97 * i)) ++      // 8 single rare
      Seq("zzzrareone", "zzzraretwo", "zzzrarethree")
    val or2 = (0 until 8).map(i => s"${w(i % 4 + 1)} ${w(211 + 31 * i)}")
    val or3 = (0 until 6).map(i => s"${w(i + 1)} ${w(503 + 13 * i)} ${w(1709 + 41 * i)}")
    val or4 = (0 until 4).map(i =>
      s"${w(i + 2)} ${w(307 + 11 * i)} ${w(1013 + 23 * i)} ${w(2203 + 53 * i)}")
    val special = Seq(
      "zzzmissingterm",              // absent → empty result
      "qqqabsent w1",                // absent + hot mix
      "w1 w1 w2",                    // duplicate term
      "w3 w3 w3",                    // all duplicates
      "W4, W9!!",                    // case + punctuation
      "Key-Value & FILTER",          // punctuation-only separators
      "  w5   w6  ",                 // whitespace noise
      "w1 w2 w3 w4 w5")              // wide OR
    val all = hot ++ mid ++ rare ++ or2 ++ or3 ++ or4 ++ special
    require(all.size == 50, s"reference set must be 50 queries, got ${all.size}")
    all.zipWithIndex.map { case (q, i) => (i + 1, q) }
  }

  /** S2 query-set source: (query_id:int, text:string) from parquet. */
  def load(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path).select("query_id", "text")

  /** The frozen artifact if present (repo checkout), else the generator —
    * queries never break on a missing fixture; GoldenSpec pins equality. */
  def loadOrGenerate(spark: SparkSession, path: String): Seq[(Int, String)] =
    if (Fs.exists(spark, path))
      load(spark, path).collect().map(r => (r.getInt(0), r.getString(1)))
        .sortBy(_._1).toSeq
    else reference
}
