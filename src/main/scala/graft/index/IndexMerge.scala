package graft.index

import graft.analysis.Analyzer
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental index maintenance (SURVEY.md §2.7 U1/U2 — the analog of a
  * Lucene/Solr segment merge): fold a new transcript batch (upserts) and a
  * tombstone set (deletes) into an existing index, producing a new index
  * root whose contents are EXACTLY what a full rebuild over the merged
  * corpus would produce (the MergeSpec property).
  *
  * What is reused from the old index: the tokenization work — old docs'
  * (term, doc_id, tf, dl) rows are remapped to their new doc ids with one
  * join instead of re-running the analyzer over the whole old corpus (at
  * scale, analysis dominates: it touches every byte of text). What is NOT
  * reused: doc ids and the term shuffle — ids are a dense global
  * (conv_id, turn_idx) ranking, so inserting keys in the middle shifts
  * them (Lucene avoids this with segment-local id spaces at the cost of a
  * per-segment query fan-out; we pin the simpler global-id semantics the
  * oracle can express).
  *
  * Upsert semantics: a new-batch row with an existing (conv_id, turn_idx)
  * key replaces the old row. Delete semantics: tombstoned keys vanish from
  * docs and postings (left_anti — U2).
  */
object IndexMerge {

  /** Solr ATOMIC UPDATE (the `{"set": …}` modifier): read the STORED
    * document for each key (Solr requires stored/docValues fields for
    * exactly this reason — atomic update is read-modify-reindex, not an
    * in-place patch), apply the field sets, and upsert the modified docs
    * through [[run]] — a merge whose batch is the updated docs only, so
    * the cost is O(index) for the id remap but O(updates) for re-analysis
    * (the expensive part at scale). Pinned subset: `set` on the stored
    * `role`/`tool`/`text` attributes to a non-NULL value; a key absent
    * from the index is ignored (Solr would create a fresh doc — a plain
    * upsert, already covered by [[run]] directly). One update map per key.
    */
  def atomicSet(spark: SparkSession, oldRoot: String,
                updates: Seq[((String, Int), Map[String, String])],
                newRoot: String, buildId: String,
                cfg: BuildIndexJob.Config = BuildIndexJob.Config()): BuildIndexJob.IndexPaths = {
    require(updates.nonEmpty, "atomic update needs at least one key")
    require(updates.map(_._1).distinct.size == updates.size,
      "one update map per key (merge duplicate sets before calling)")
    val settable = Set("role", "tool", "text")
    require(updates.forall(_._2.keySet.subsetOf(settable)),
      s"atomic set is pinned to the stored fields $settable")
    import spark.implicits._
    val stored = cfg.io.read(spark, s"$oldRoot/docs")
    val pred = updates.map { case ((c, t), _) =>
      col("conv_id") === c && col("turn_idx") === t }.reduce(_ || _)
    val wide = updates.map { case ((c, t), m) =>
      (c, t, m.get("role").orNull, m.get("tool").orNull, m.get("text").orNull)
    }.toDF("conv_id", "turn_idx", "_nr", "_nt", "_nx")
    val batch = stored.where(pred)
      .select("conv_id", "turn_idx", "role", "text", "tool", "ts")
      .join(broadcast(wide), Seq("conv_id", "turn_idx"))
      .select(col("conv_id"), col("turn_idx"),
        coalesce(col("_nr"), col("role")).as("role"),
        coalesce(col("_nx"), col("text")).as("text"),
        coalesce(col("_nt"), col("tool")).as("tool"),
        col("ts"))
    val noDeletes = Seq.empty[(String, Int)].toDF("conv_id", "turn_idx")
    run(spark, oldRoot, batch, noDeletes, newRoot, buildId, cfg)
  }

  /** Rebuild a unified index root from ALREADY-ANALYZED parts without
    * re-tokenizing any text — the Lucene-merge property ([[run]]'s
    * old-side remap generalized to N parts, for segment merges and
    * compaction): each part supplies its LIVE doc rows (full stored
    * columns + the part-local `doc_id` + a caller `_part_ord`) and its
    * tfdl artifact; fresh dense global ids are assigned from the merged
    * key set, the docs artifact is written from the STORED rows (dl is
    * stored — never recomputed), and the scoring relation is the union
    * of the parts' tfdl rows remapped (part_ord, old id) → new id. At
    * scale analysis touches every byte of text, so a merge that
    * re-analyzes is a rebuild; this path touches text bytes exactly once
    * (the docs copy) and never re-runs the analyzer. Dead rows drop out
    * naturally: the remap join is inner on the live id map.
    *
    * Preconditions (the segment invariants): part docs are live-filtered
    * and key-unique across parts, and already passed ingest. */
  def rebuildFromParts(spark: SparkSession,
                       parts: Seq[(DataFrame, DataFrame)],
                       newRoot: String, buildId: String,
                       cfg: BuildIndexJob.Config = BuildIndexJob.Config())
      : BuildIndexJob.IndexPaths = {
    require(parts.nonEmpty, "rebuildFromParts needs at least one part")
    val partHasPos = parts.map(_._2.columns.contains("positions")).distinct
    require(partHasPos.size == 1,
      "rebuildFromParts: parts disagree on positional postings")
    // a positional part set can feed a non-positional target (the column
    // is simply pruned — same as a re-tokenizing rebuild without
    // positions); the reverse cannot (positions can't be invented)
    require(partHasPos.head || !cfg.storePositions,
      "rebuildFromParts: config wants positional postings but the parts " +
        "carry none")
    if (graft.sources.Fs.exists(spark, newRoot))
      graft.sources.Fs.delete(spark, newRoot)
    val p = BuildIndexJob.IndexPaths(newRoot)
    val key = Seq("conv_id", "turn_idx")
    val cols = Seq("conv_id", "turn_idx", "role", "text", "tool", "ts", "dl")
    val merged = parts.zipWithIndex.map { case ((docs, _), i) =>
      docs.select((cols.map(col) :+ col("doc_id").as("_old_id")): _*)
        .withColumn("_part_ord", lit(i))
    }.reduce(_ unionByName _)
    // fresh dense global ids over the merged key set; dl is already
    // stored, so the docs artifact is a pure column re-shape of the
    // merged rows (stats observed on the write, as everywhere)
    val withIds = IndexBuild.assignDocIds(merged, stagingDir = s"${p.staging}/docids")
    val docs = withIds
      .select("doc_id", "conv_id", "turn_idx", "role", "tool", "ts", "dl", "text")
    val obs = org.apache.spark.sql.Observation()
    cfg.io.write(docs.observe(obs,
        count(when(col("dl") > 0, 1)).as("n"),
        sum(when(col("dl") > 0, col("dl").cast("long"))).as("t")),
      p.docs, snapshotId = buildId)
    val nDocs = Option(obs.get.getOrElse("n", null)).fold(0L)(_.asInstanceOf[Long])
    val total = Option(obs.get.getOrElse("t", null)).fold(0L)(_.asInstanceOf[Long])
    import spark.implicits._
    cfg.io.write(Seq((nDocs, total,
        if (nDocs == 0) 0.0 else total.toDouble / nDocs, buildId))
      .toDF("n_docs", "total_tokens", "avgdl", "build_id"), p.stats,
      snapshotId = buildId)
    graft.sources.Fs.delete(spark, s"${p.staging}/docids")
    // id map from the PERSISTED docs (the staging files are gone) joined
    // back to the parts' key→old-id rows — keys only, no text
    val docsP = cfg.io.read(spark, p.docs)
    val mergedKeys = parts.zipWithIndex.map { case ((docsDf, _), i) =>
      docsDf.select(col("conv_id"), col("turn_idx"), col("doc_id").as("_old_id"))
        .withColumn("_part_ord", lit(i))
    }.reduce(_ unionByName _)
    val idmap = docsP.select(col("doc_id").as("_new_id"), col("conv_id"), col("turn_idx"))
      .join(mergedKeys, key)
      .select(col("_part_ord").as("_im_part"), col("_old_id").as("_im_old"),
        col("_new_id"))
    val tfCols = Seq("term", "doc_id", "tf", "dl") ++
      (if (cfg.storePositions) Seq("positions") else Nil)
    val tfdl = parts.zipWithIndex.map { case ((_, t), i) =>
      t.withColumn("_po", lit(i))
    }.reduce(_ unionByName _)
      .join(idmap, col("doc_id") === col("_im_old") &&
        col("_po") === col("_im_part"))
      .withColumn("doc_id", col("_new_id"))
      .select(tfCols.map(col): _*)
    cfg.io.write(tfdl, p.tfdl, snapshotId = buildId)
    BuildIndexJob.runFromTf(spark, p, buildId, cfg)
    p
  }

  def run(spark: SparkSession, oldRoot: String, newBatch: DataFrame,
          tombstones: DataFrame, newRoot: String, buildId: String,
          cfg: BuildIndexJob.Config = BuildIndexJob.Config()): BuildIndexJob.IndexPaths = {
    require(oldRoot != newRoot,
      "merge target must be a fresh generation, not the source index " +
        "(overwriting an input while lazily reading it corrupts the merge)")
    // All-or-nothing semantics: a half-written target from a crashed merge
    // is wiped, never resumed — its docs/tfdl are not marker-guarded, so a
    // partial resume could pair fresh doc_ids with stale postings. Resume
    // granularity is the GENERATION (the caller republished pointer /
    // streaming checkpoint replays the whole batch).
    if (graft.sources.Fs.exists(spark, newRoot))
      graft.sources.Fs.delete(spark, newRoot)
    val key = Seq("conv_id", "turn_idx")
    val oldDocs = cfg.io.read(spark, s"$oldRoot/docs")
    val ingestedNew = IndexBuild.ingest(newBatch)

    // survivors of the old corpus: not tombstoned, not overwritten
    val keepOld = oldDocs
      .join(tombstones.select(key.map(col): _*), key, "left_anti")
      .join(ingestedNew.select(key.map(col): _*), key, "left_anti")
    val newTurns = ingestedNew
      .join(tombstones.select(key.map(col): _*), key, "left_anti")

    val cols = Seq("conv_id", "turn_idx", "role", "text", "tool", "ts")
    val merged = keepOld.select(cols.map(col): _*)
      .unionByName(newTurns.select(cols.map(col): _*))

    val p = BuildIndexJob.IndexPaths(newRoot)
    // docs stage over the merged corpus (fresh dense ids); collection
    // stats ride the write as observed metrics (same as the batch job's
    // docs stage — saves the dict stage's full docs re-aggregation)
    val docs = IndexBuild.assignDocIds(merged, stagingDir = s"${p.staging}/docids")
      .withColumn("dl", Analyzer.docLen(col("text")))
      .select("doc_id", "conv_id", "turn_idx", "role", "tool", "ts", "dl", "text")
    val obs = org.apache.spark.sql.Observation()
    cfg.io.write(docs.observe(obs,
        count(when(col("dl") > 0, 1)).as("n"),
        sum(when(col("dl") > 0, col("dl").cast("long"))).as("t")),
      p.docs, snapshotId = buildId)
    val nDocs = Option(obs.get.getOrElse("n", null)).fold(0L)(_.asInstanceOf[Long])
    val total = Option(obs.get.getOrElse("t", null)).fold(0L)(_.asInstanceOf[Long])
    import spark.implicits._
    cfg.io.write(Seq((nDocs, total,
        if (nDocs == 0) 0.0 else total.toDouble / nDocs, buildId))
      .toDF("n_docs", "total_tokens", "avgdl", "build_id"), p.stats,
      snapshotId = buildId)
    graft.sources.Fs.delete(spark, s"${p.staging}/docids")
    // downstream steps must read the PERSISTED docs — the lazy `docs` plan
    // still references the just-deleted doc-id staging files
    val docsP = cfg.io.read(spark, p.docs)

    // tf stage: reuse old tokenization via id remap — SURVIVOR keys only
    // (an overwritten key must not drag its stale postings along; its text
    // is re-tokenized as part of the new batch). Positional indexes merge
    // positionally: the old positions column rides the remap untouched
    // (positions are within-doc, id-independent) and the fresh batch runs
    // the positional aggregate. A config/old-index mismatch fails loudly —
    // silently mixing positional and non-positional rows would corrupt
    // the per-block positions stream.
    val oldTfdl = cfg.io.read(spark, s"$oldRoot/tfdl")
    val oldHasPos = oldTfdl.columns.contains("positions")
    require(oldHasPos == cfg.storePositions,
      s"positional mismatch: old index storePositions=$oldHasPos but merge " +
        s"config storePositions=${cfg.storePositions}")
    val tfCols = Seq("term", "doc_id", "tf", "dl") ++
      (if (cfg.storePositions) Seq("positions") else Nil)
    val remap = oldTfdl
      .join(keepOld.select(col("doc_id").as("_old_id"), col("conv_id"), col("turn_idx"))
          .join(docsP.select(col("doc_id").as("_new_id"), col("conv_id"), col("turn_idx")), key)
          .select("_old_id", "_new_id"),
        col("doc_id") === col("_old_id"))
      .withColumn("doc_id", col("_new_id"))
      .select(tfCols.map(col): _*)
    val newKeys = newTurns.select(key.map(col): _*)
    val freshDocs = docsP.join(newKeys, key, "left_semi")
    val freshTf =
      if (!cfg.storePositions)
        freshDocs
          .select(col("doc_id"), col("dl"), explode(Analyzer.tokens(col("text"))).as("term"))
          .groupBy("term", "doc_id", "dl")
          .agg(count(lit(1)).cast("int").as("tf"))
          .select(tfCols.map(col): _*)
      else
        freshDocs
          .select(col("doc_id"), col("dl"),
            posexplode(Analyzer.tokens(col("text"))).as(Seq("_pos", "term")))
          .groupBy("term", "doc_id", "dl")
          .agg(count(lit(1)).cast("int").as("tf"),
            sort_array(collect_list(col("_pos").cast("long"))).as("positions"))
          .select(tfCols.map(col): _*)
    val tfdl = remap.unionByName(freshTf).select(tfCols.map(col): _*)
    cfg.io.write(tfdl, p.tfdl, snapshotId = buildId)

    // dict + stats + postings: identical to the batch job's stages
    BuildIndexJob.runFromTf(spark, p, buildId, cfg)
    p
  }
}
