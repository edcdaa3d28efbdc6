package graft

import org.apache.spark.sql.SparkSession

/** Driver-contract benchmark: one JSON line with per-query wall times plus
  * the flagship extraction throughput (docs/sec) on the same SF.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // steady-state warmup: one small kernel pass over the BENCH dir itself
    // (not a hardcoded fixture path) so the first measured query doesn't
    // absorb all JIT/classloading cost
    graft.pipeline.ExtractJob.run(
      graft.pipeline.Synth.pages(spark, sfDir).limit(100))
      .agg(org.apache.spark.sql.functions.sum("n_nodes")).collect()

    val failed = scala.collection.mutable.ArrayBuffer.empty[String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).count()
      catch {
        case e: Throwable =>
          failed += name
          System.err.println(s"[bench] $name FAILED: ${e.toString.take(200)}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }

    // flagship extraction throughput: full kernel pass over the pages table
    val pages = graft.pipeline.Synth.pages(spark, sfDir).cache()
    val nDocs = pages.count()
    // warmup (JIT + code paths)
    graft.pipeline.ExtractJob.run(pages).agg(org.apache.spark.sql.functions.sum("n_nodes")).collect()
    val t0 = System.nanoTime()
    graft.pipeline.ExtractJob.run(pages).agg(org.apache.spark.sql.functions.sum("n_nodes")).collect()
    val extractSec = (System.nanoTime() - t0) / 1e9
    val docsPerSec = nDocs / extractSec
    pages.unpersist()

    val qs = results.map { case (k, v) => "\"" + k + f"""":$v%.3f""" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum + extractSec
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir","extract_docs":$nDocs,"extract_sec":$extractSec%.3f,"extract_docs_per_sec":$docsPerSec%.1f,"cpus":"$cpus"}""")
    spark.stop()
  }
}
