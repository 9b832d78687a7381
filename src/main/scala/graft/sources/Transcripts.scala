package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sources for the engine's input table — multi-turn transcripts with
  * columns (conv_id:string, turn_idx:int, role:string, text:string,
  * tool:string, ts:timestamp) per BASELINE.json input_hint.
  *
  * Two deterministic sources, no external data:
  *  - [[fromDocuments]]: derives a transcripts table from the driver's
  *    read-only `documents.parquet` by a pure, SQL-expressible mapping, so
  *    the DuckDB oracle can re-derive the identical table (FIXTURES.md §B).
  *  - [[synthetic]]: a seed-free, hash-driven generator (every value is a
  *    pure function of (conv, turn)) used for scale tests and benchmarks —
  *    regeneration is bit-identical regardless of partitioning, which is
  *    exactly the per-turn text-equality invariant the contract pins.
  */
object Transcripts {

  final val Epoch2024 = 1704067200L // 2024-01-01T00:00:00Z

  /** Deterministic transcripts view over documents.parquet: each
    * conversation = 4 consecutive doc_ids; one turn per document. The
    * DuckDB twin is [[sqlFromDocuments]]. */
  def fromDocuments(spark: SparkSession, sfDir: String): DataFrame =
    fromDocumentsDf(spark.read.parquet(s"$sfDir/documents.parquet"))

  /** Same mapping over an arbitrary (doc_id, text) relation — lets callers
    * derive transcript BATCHES from doc-id slices (merge/streaming gates). */
  def fromDocumentsDf(d: DataFrame): DataFrame = {
    d.select(
      concat(lit("conv"), lpad(expr("CAST(doc_id DIV 4 AS STRING)"), 6, "0")).as("conv_id"),
      (col("doc_id") % 4).cast("int").as("turn_idx"),
      when(col("doc_id") % 4 === 3, lit("tool"))
        .when(col("doc_id") % 2 === 0, lit("user"))
        .otherwise(lit("assistant")).as("role"),
      col("text"),
      when(col("doc_id") % 4 === 3,
        concat(lit("tool"), (col("doc_id") % 8).cast("string"))).as("tool"),
      timestamp_seconds(lit(Epoch2024) + col("doc_id") * 30).as("ts"))
  }

  /** DuckDB twin of [[fromDocuments]] (ts omitted — never oracle-checked,
    * timestamp hashing is engine-dependent). Splice as a CTE body. */
  def sqlFromDocuments: String = sqlFromDocumentsOver("documents")

  /** [[sqlFromDocuments]] over an arbitrary (doc_id, text) relation —
    * fixture gates that mutate the documents corpus (upserts, deletes,
    * snapshot cuts) splice their modified relation here so the
    * documents→transcripts mapping stays one shared seam. */
  def sqlFromDocumentsOver(src: String): String =
    s"""SELECT 'conv' || lpad(CAST(doc_id // 4 AS VARCHAR), 6, '0') AS conv_id,
       |       CAST(doc_id % 4 AS INT) AS turn_idx,
       |       CASE WHEN doc_id % 4 = 3 THEN 'tool'
       |            WHEN doc_id % 2 = 0 THEN 'user'
       |            ELSE 'assistant' END AS role,
       |       text,
       |       CASE WHEN doc_id % 4 = 3 THEN 'tool' || CAST(doc_id % 8 AS VARCHAR) END AS tool
       |FROM $src""".stripMargin

  /** Synthetic transcript corpus (FIXTURES.md §B): `numConvs`
    * conversations, 2–15 turns each, bag-of-words text over a `vocabSize`
    * vocabulary with a Zipf-like (s≈1) rank distribution so hot-term skew
    * is real (exercises salting, SURVEY.md §4.3). Pure Column expressions
    * over `spark.range` — no Random, no wall-clock: every value is a
    * function of (c, t, i) via xxhash64, hence bit-identical under any
    * partitioning/ordering of the generation itself.
    *
    * Three pinned rare terms land in known turns for exact-hit tests:
    * "zzzrareone" in (conv 0, turn 0), "zzzraretwo" in (conv 1, turn 1),
    * "zzzrarethree" in (conv 2, turn 0).
    */
  def synthetic(spark: SparkSession, numConvs: Long,
                vocabSize: Int = 5000): DataFrame = {
    val convs = spark.range(0, numConvs).toDF("c")
    // turns per conversation: 2 + (hash(c) mod 14)
    val withTurns = convs
      .withColumn("n_turns", (pmod(xxhash64(col("c"), lit("len")), lit(14)) + 2).cast("int"))
      .select(col("c"), explode(sequence(lit(0), col("n_turns") - 1)).as("t"))
    // tokens per turn: 5 + (hash mod 116)  →  5..120
    val nTok = (pmod(xxhash64(col("c"), col("t"), lit("ntok")), lit(116)) + 5).cast("int")
    // Zipf-ish rank via inverse-CDF of 1/x on (1, V]: rank = floor(V^u)
    // where u = uniform hash in [0,1). P(rank ≤ k) ≈ ln k / ln V.
    val lnV = math.log(vocabSize.toDouble)
    def u(i: org.apache.spark.sql.Column) =
      (pmod(xxhash64(col("c"), col("t"), i, lit("tok")), lit(1000000)).cast("double") + 0.5) / 1000000.0
    val word = transform(sequence(lit(0), nTok - 1),
      i => concat(lit("w"), least(exp(u(i) * lnV).cast("long"), lit(vocabSize.toLong))))
    val rare = when(col("c") === 0 && col("t") === 0, lit(" zzzrareone"))
      .when(col("c") === 1 && col("t") === 1, lit(" zzzraretwo"))
      .when(col("c") === 2 && col("t") === 0, lit(" zzzrarethree"))
      .otherwise(lit(""))
    withTurns.select(
      concat(lit("conv"), lpad(col("c").cast("string"), 8, "0")).as("conv_id"),
      col("t").cast("int").as("turn_idx"),
      when(pmod(xxhash64(col("c"), col("t"), lit("role")), lit(100)) < 15, lit("tool"))
        .when(col("t") % 2 === 0, lit("user"))
        .otherwise(lit("assistant")).as("role"),
      concat(concat_ws(" ", word), rare).as("text"),
      when(pmod(xxhash64(col("c"), col("t"), lit("role")), lit(100)) < 15,
        concat(lit("tool"), pmod(xxhash64(col("c"), col("t"), lit("tool")), lit(8)).cast("string"))).as("tool"),
      timestamp_seconds(lit(Epoch2024) + col("c") * 3600 + col("t") * 30).as("ts"))
  }
}
