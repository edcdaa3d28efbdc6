package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.pipeline.{ExtractJob, ParsedDoc}

/** Structured-Streaming form of the extraction pipeline: the reference has
  * no streaming (SURVEY.md §2.G documents batch-with-resume as the covering
  * design), but the kernel composes directly with readStream sources — the
  * same typed mapPartitions runs per micro-batch, plus watermarked windowed
  * metrics for continuous crawl-ingest monitoring.
  */
object ExtractStream {

  /** streaming pages(url, warc_ts, html, lang, …) → streaming ParsedDoc. */
  def run(pages: DataFrame): Dataset[ParsedDoc] =
    ExtractJob.run(pages) // map-only: identical plan shape works on streams

  /** Watermarked per-minute ingest metrics (docs, parse failures, bytes).
    * Late data beyond 10 minutes is dropped; state is bounded.
    */
  def windowedMetrics(parsed: Dataset[ParsedDoc]): DataFrame =
    parsed.toDF()
      .withWatermark("warc_ts", "10 minutes")
      .groupBy(window(col("warc_ts"), "1 minute"), col("lang"))
      .agg(
        count(lit(1)).as("docs"),
        sum(when(col("parse_ok"), 0L).otherwise(1L)).as("parse_errors"),
        sum("n_bytes").as("bytes_in"))
}
