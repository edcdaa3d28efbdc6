package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Optimization-round instrumentation for the q89/q92 streaming harnesses:
  * splits wall time into collect / start / batch1 / batch2 / drain so the
  * fixed micro-batch machinery cost is attributable (guide §1 — measure
  * before touching). Not part of the frozen bench.
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label%-12s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    (1 to 2).foreach { round =>
      println(s"=== q89 shape, round $round")
      val rows = t("collect") {
        spark.read.parquet(s"$sfDir/documents.parquet")
          .select(col("doc_id"), col("text")).as[(Long, String)].collect()
      }
      val old = rows.map { case (id, tx) => ("u/" + id, tx) }.toSeq
      val nw = rows.filter(_._1 % 10 != 0).map { case (id, tx) =>
          ("u/" + id, if (id % 3 == 0) tx + " updated" else tx) }.toSeq ++
        rows.filter(_._1 % 8 == 0).map { case (id, tx) =>
          ("u/" + (id + 1000000000L), tx) }.toSeq
      val input = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(String, String)]
      val qname = s"probe_q89_$round"
      val stream = t("start") {
        graft.streaming.ExtractStream.crawlDeltaStream(
          input.toDF().toDF("url", "text"))
          .writeStream.format("memory").queryName(qname)
          .outputMode("append").start()
      }
      try {
        t("batch1") { input.addData(old: _*); stream.processAllAvailable() }
        t("batch2") { input.addData(nw: _*); stream.processAllAvailable() }
      } finally t("stop") { stream.stop() }
      val n = t("sinkread") {
        spark.table(qname).count()
      }
      spark.catalog.dropTempView(qname)
      println(s"[probe] events=$n")
    }
    spark.stop()
  }
}
