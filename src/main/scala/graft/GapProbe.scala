package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-cost decomposition of the flagship extraction path: times the same
  * cached input through (1) row codec only, (2) +UTF-8 decode, (3) +parse,
  * (4) +structuredText, (5) the full ParsedDoc pipeline — isolating what
  * Spark's plumbing costs vs what the kernel costs. Round-2 measurement
  * (local[8], 100k × ~22 KB tag-dense pages): codec+decode run at ~5 GB/s,
  * parse at ~540 MB/s, full pipeline within ~4% of parse+extract alone —
  * the job is kernel-bound, not framework-bound (BENCH.md §4a).
  */
object GapProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val filler = concat(lit("<div class=\"sec\"><h2>section</h2><p>"),
      col("text"), lit("</p><ul><li>a</li><li>b</li></ul></div>"))
    val base = graft.pipeline.Synth.pages(spark, "/root/testdata/sf0.1")
      .withColumn("rep", explode(sequence(lit(0), lit(19))))
      .withColumn("url", concat(col("url"), lit("#"), col("rep")))
      .withColumn("html",
        encode(concat(decode(col("html"), "UTF-8"), repeat(filler, 60)), "UTF-8"))
      .repartition(8).cache()
    val n = base.count()
    val bytes = base.agg(sum(length(col("html")))).head.getLong(0)
    def time(label: String)(f: => Unit): Unit = {
      f // warm
      val t0 = System.nanoTime(); f; val s = (System.nanoTime()-t0)/1e9
      println(f"$label: $s%.2f s  ${n/s}%.0f docs/s  ${bytes/s/1e6}%.0f MB/s")
    }
    val ds = base.select(col("doc_id"), col("url"), col("warc_ts"), col("html"), col("lang"))
      .as[(Long, String, java.sql.Timestamp, Array[Byte], String)]
    time("rowcodec-only   ")(ds.mapPartitions(it => it.map(r => r._4.length)).agg(sum("value")).collect())
    time("+utf8-decode    ")(ds.mapPartitions(it => it.map(r => new String(r._4, java.nio.charset.StandardCharsets.UTF_8).length)).agg(sum("value")).collect())
    time("+parse          ")(ds.mapPartitions(it => it.map { r =>
      graft.kernel.HtmlParser.parse(new String(r._4, java.nio.charset.StandardCharsets.UTF_8)).childNodes.length
    }).agg(sum("value")).collect())
    time("+structuredText ")(ds.mapPartitions(it => it.map { r =>
      graft.kernel.HtmlParser.parse(new String(r._4, java.nio.charset.StandardCharsets.UTF_8)).structuredText.length
    }).agg(sum("value")).collect())
    time("full ParsedDoc  ")(graft.pipeline.ExtractJob.run(base).agg(sum("n_nodes")).collect())
    println(s"docs=$n bytes=$bytes")
    spark.stop()
  }
}
