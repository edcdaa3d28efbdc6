package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic pages-table synthesis (BASELINE.json input_hint: build over
  * a table of exactly that shape; no external data, no wall-clock).
  *
  * Pages are derived 1:1 from the driver-provided `documents` table with pure
  * SQL expressions, so a DuckDB oracle can reproduce both the construction
  * and the expected extraction output without parsing HTML. Host distribution
  * is deliberately skewed (half of all pages land on host-0) so the salted
  * repartition path is actually exercised.
  */
object Synth {

  /** Columns: url, warc_ts, html(binary), text, lang — plus host for skew
    * experiments. ~1/7 of pages get deliberately malformed HTML (unclosed
    * div+h3) to exercise the repair pass and the parse_ok metric.
    */
  def pages(spark: SparkSession, sfDir: String): DataFrame =
    pagesFromDocs(spark.read.parquet(s"$sfDir/documents.parquet"))

  /** Same construction over an arbitrary documents-shaped frame (doc_id,
    * text, lang, source) — lets callers synthesize crawls with injected
    * duplicates / mutations while keeping the oracle reproducible.
    */
  def pagesFromDocs(docs: DataFrame): DataFrame = {
    docs.select(
      concat(lit("https://host-"),
        when(col("doc_id") % 2 === 0, lit("0"))
          .otherwise((col("doc_id") % 50).cast("string")),
        lit(".example/"), col("source"), lit("/"), col("doc_id")).as("url"),
      // deterministic timestamp: spread over ~10 days so hour-of-epoch
      // bucketing produces a realistic multi-bucket layout
      expr("timestamp_seconds(1704067200 + (doc_id * 3607) % 864000)").as("warc_ts"),
      encode(htmlFor(), "UTF-8").as("html"),
      col("text"),
      col("lang"),
      col("doc_id"))
  }

  /** The canonical page body (string column, pre-encode). Valid unless
    * doc_id % 7 == 0, in which case the div+h3 are left unclosed.
    */
  private def htmlFor() = {
    val items = expr("repeat(concat('<li class=\"item\">', lang, '</li>'), cast(doc_id % 5 + 1 as int))")
    val body = concat(
      lit("<div id=\"main\" class=\"content\"><p>"), col("text"), lit("</p><ul>"),
      items,
      lit("</ul><a href=\"https://example.com/"), col("doc_id"), lit("\" lang=\""),
      col("lang"), lit("\">link</a></div>"))
    when(col("doc_id") % 7 === 0,
      concat(lit("<div><h3>"), col("text")))
      .otherwise(body)
  }
}
