package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Solr CollapsingQParser + ExpandComponent
  * (`fq={!collapse field=f}&expand=true&expand.rows=m`): the main result
  * list keeps only the BEST document of each `field` group (ranked
  * normally among all collapsed heads), and the expand section returns,
  * per kept head, the next `expand.rows` group members in score order.
  * This differs from result grouping ([[Grouping.topGroups]]): grouping
  * returns a nested top-k-groups response, collapsing returns a FLAT
  * ranked list (one doc per group) — Solr users reach for collapse
  * precisely because it composes with every other component.
  *
  * Pinned semantics:
  *  - group head = max (round(score, 7), doc_id ASC tie-break) — Solr's
  *    default `max score` collapse selector with the engine-wide
  *    FP-stable tie-break;
  *  - heads rank per query by the standard [[Search.rank]] window,
  *    top-k;
  *  - docs with a NULL collapse field are EXCLUDED (Solr
  *    `nullPolicy=ignore`, the default; the divergence note on
  *    [[Grouping.topGroups]] re NULL ordering applies);
  *  - expand rows: per KEPT head's group, members ranked 1..m by the
  *    same (score, doc_id) key with the head itself excluded — Solr's
  *    expand section keyed by the collapse value; a group with no other
  *    members simply has no expand rows;
  *  - output is one flat frame: head rows carry exp_pos = 0, expand rows
  *    carry exp_pos = 1..m and the HEAD's rank (their section key).
  *
  * Scale shape: one attrs key-join, one (query, group) window for the
  * within-group order, then only the ≤ one-row-per-group HEADS frame
  * enters the per-query rank window — the [[Grouping]] shape. Expand
  * costs one more request-bounded semi-join (kept groups) over the same
  * windowed frame, not a second corpus pass. */
object Collapse {

  /** Collapse + expand over pre-scored (query_id, doc_id, _score) rows
    * and a (doc_id, `field`, …) attribute relation. Output:
    * (query_id, rank, group_value, exp_pos, doc_id, score). */
  def collapseExpand(scored: DataFrame, attrs: DataFrame, field: String,
                     k: Int, expandRows: Int): DataFrame = {
    require(k > 0, s"rows must be positive (got $k)")
    require(expandRows >= 0, s"expand.rows must be >= 0 (got $expandRows)")
    val wDoc = Window.partitionBy("query_id", "group_value")
      .orderBy(round(col("_score"), Bm25.RankScale).desc, col("doc_id").asc)
    val members = scored
      .join(attrs.select(col("doc_id"), col(field)), "doc_id")
      .where(col(field).isNotNull)
      .withColumn("group_value", col(field).cast("string"))
      .withColumn("_gpos", row_number().over(wDoc))
      .where(col("_gpos") <= expandRows + 1)
      .select("query_id", "group_value", "_gpos", "doc_id", "_score")
    val wHead = Window.partitionBy("query_id")
      .orderBy(round(col("_score"), Bm25.RankScale).desc, col("doc_id").asc)
    val heads = members.where(col("_gpos") === 1)
      .withColumn("rank", row_number().over(wHead).cast("int"))
      .where(col("rank") <= k)
    val expand = members.where(col("_gpos") > 1)
      .join(heads.select("query_id", "group_value", "rank"),
        Seq("query_id", "group_value"))
    heads.withColumn("exp_pos", lit(0))
      .select("query_id", "rank", "group_value", "exp_pos", "doc_id", "_score")
      .unionByName(expand
        .withColumn("exp_pos", (col("_gpos") - 1).cast("int"))
        .select("query_id", "rank", "group_value", "exp_pos", "doc_id", "_score"))
      .select(col("query_id"), col("rank"), col("group_value"),
        col("exp_pos"), col("doc_id"),
        round(col("_score"), Bm25.OutScale).as("score"))
      .orderBy("query_id", "rank", "exp_pos")
  }
}
