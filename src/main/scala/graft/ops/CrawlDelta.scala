package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Crawl-snapshot DELTA — recrawl management: a production crawl re-fetches
  * the web continuously, and the pipeline's first question about a new
  * snapshot is "what actually changed?" (unchanged pages skip re-extraction
  * entirely — at Common-Crawl scale most of the crawl is unchanged, so this
  * gate is the single biggest compute saver in steady state).
  *
  * Implementation: ONE full-outer equi-join on the key (canonical url /
  * doc_id) comparing md5 content fingerprints — 32-byte shuffle keys, never
  * the text. Status is a pure-Column CASE, so classification rides the join
  * projection inside codegen:
  *
  *   - `new`       key only in the new snapshot
  *   - `gone`      key only in the old snapshot
  *   - `modified`  both sides, fingerprints differ
  *   - `unchanged` both sides, fingerprints equal
  */
object CrawlDelta {

  /** Per-key delta rows: (key, status). Inputs need (keyCol, textCol). */
  def delta(oldSnap: DataFrame, newSnap: DataFrame,
      keyCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    // null text must still count as PRESENCE (a stored fetch with no body):
    // bare md5(null) is null and would misread the key as new/gone, so
    // nulls get a sentinel fingerprint (null body == null body → unchanged)
    def fp(c: org.apache.spark.sql.Column) =
      coalesce(md5(encode(c, "UTF-8")), lit("<null-body>"))
    val a = oldSnap.select(col(keyCol).as("key"), fp(col(textCol)).as("fp_old"))
    val b = newSnap.select(col(keyCol).as("key"), fp(col(textCol)).as("fp_new"))
    a.join(b, Seq("key"), "full_outer")
      .select(col("key"),
        when(col("fp_old").isNull, lit("new"))
          .when(col("fp_new").isNull, lit("gone"))
          .when(col("fp_old") === col("fp_new"), lit("unchanged"))
          .otherwise(lit("modified")).as("status"))
  }

  /** One row per status — the snapshot-health audit line. */
  def deltaStats(delta: DataFrame): DataFrame =
    delta.groupBy("status").agg(count(lit(1)).as("n"))
}
