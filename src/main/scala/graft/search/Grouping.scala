package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Solr result grouping (`group=true&group.field=f&group.limit=m&rows=k`)
  * — a.k.a. field collapsing: the top-k GROUPS of a query's match set,
  * each carrying its own top-m documents. The flagship transcript shape is
  * `group.field=conv_id`: "the best conversations for this query, with the
  * best turns of each".
  *
  * Pinned semantics:
  *  - Groups rank by their HEAD document — the group's best (score, doc)
  *    — exactly Solr's default `group.sort=score desc`: order by
  *    (round(head_score, 7) DESC, head doc_id ASC), the same FP-stable
  *    tie-break as [[Search.rank]].
  *  - Documents within a group rank by (round(score, 7) DESC, doc_id ASC),
  *    truncated to `groupLimit` (Solr `group.limit`, default 1).
  *  - Rows whose group field is NULL are EXCLUDED (documented divergence:
  *    Solr collects them into one null group; a NULL group key would ride
  *    on cross-engine NULL-ordering differences — Spark sorts NULLS FIRST
  *    on ASC, DuckDB NULLS LAST — so the null group is out of scope).
  *  - The group value surfaces as a string (it is a JSON key in a Solr
  *    grouped response).
  *
  * Scale shape: the within-group window partitions by (query, group) —
  * group-parallel; only the HEADS frame (≤ one row per matched group)
  * enters the per-query ranking window, the same request-bounded shape
  * [[Search.rank]] already pins. No driver state anywhere.
  */
object Grouping {

  /** Top-k groups × top-m docs over pre-scored (query_id, doc_id, _score)
    * rows and a (doc_id, `groupField`, …) attribute relation. Output:
    * (query_id, group_rank, group_value, doc_rank, doc_id, score). */
  def topGroups(scored: DataFrame, attrs: DataFrame, groupField: String,
                kGroups: Int, groupLimit: Int): DataFrame = {
    require(kGroups > 0 && groupLimit > 0,
      s"kGroups and groupLimit must be positive (got $kGroups, $groupLimit)")
    val wDoc = Window.partitionBy("query_id", "group_value")
      .orderBy(round(col("_score"), 7).desc, col("doc_id").asc)
    val docs = scored
      .join(attrs.select(col("doc_id"), col(groupField)), "doc_id")
      .where(col(groupField).isNotNull)
      .withColumn("group_value", col(groupField).cast("string"))
      .withColumn("doc_rank", row_number().over(wDoc).cast("int"))
      .where(col("doc_rank") <= groupLimit)
      .select("query_id", "group_value", "doc_rank", "doc_id", "_score")
    val wGrp = Window.partitionBy("query_id")
      .orderBy(round(col("_head_score"), 7).desc, col("_head_doc").asc)
    val topG = docs.where(col("doc_rank") === 1)
      .select(col("query_id"), col("group_value"),
        col("_score").as("_head_score"), col("doc_id").as("_head_doc"))
      .withColumn("group_rank", row_number().over(wGrp).cast("int"))
      .where(col("group_rank") <= kGroups)
      .select("query_id", "group_value", "group_rank")
    docs.join(topG, Seq("query_id", "group_value"))
      .select(col("query_id"), col("group_rank"), col("group_value"),
        col("doc_rank"), col("doc_id"), round(col("_score"), 4).as("score"))
      .orderBy("query_id", "group_rank", "doc_rank")
  }

  /** Solr grouping by QUERY (`group.query=…`, repeated): each named group
    * is its own query; the response pairs every main query with every
    * group it overlaps, listing the group's top `groupLimit` docs ranked
    * by the MAIN query's score (round-7 DESC, doc_id ASC — the pinned
    * key) plus the group's total hit count within the main match set
    * (Solr's per-group numFound). Group membership = the DISJUNCTIVE
    * match set of the group query's analyzed terms (Solr's default OR
    * parser; a group query is a filter here — its own scores never mix
    * into ranking, matching Solr, which ranks group.query hits by the
    * main query). A (main, group) pair with an empty intersection has no
    * rows — its numFound-0 entry is driver-known absence, same rule as
    * every spine-less ranking gate.
    *
    * `member` must be (_gid, doc_id) membership rows; `gnames` maps
    * _gid → group_name. Scale shape: scored × member is a doc_id-keyed
    * join of two match sets; windows partition by (query, group). */
  def topGroupQueries(scored: DataFrame, member: DataFrame,
                      gnames: DataFrame, groupLimit: Int): DataFrame = {
    require(groupLimit > 0, s"groupLimit must be positive (got $groupLimit)")
    val wg = Window.partitionBy("query_id", "_gid")
    val w = wg.orderBy(round(col("_score"), Bm25.RankScale).desc,
      col("doc_id").asc)
    scored.join(member, "doc_id")
      .withColumn("rank", row_number().over(w))
      .withColumn("_hits", count(lit(1)).over(wg))
      .where(col("rank") <= groupLimit)
      .join(broadcast(gnames), "_gid")
      .select(col("query_id"), col("group_name"),
        col("rank").cast("int").as("rank"), col("doc_id"),
        round(col("_score"), Bm25.OutScale).as("score"),
        col("_hits").cast("long").as("group_hits"))
      .orderBy("query_id", "group_name", "rank")
  }
}
