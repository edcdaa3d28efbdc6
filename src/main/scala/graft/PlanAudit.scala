package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Prints the physical plans of the flagship pipeline pieces so plan
  * regressions (lost pushdown/pruning, unexpected shuffles) are visible.
  *   runMain graft.PlanAudit [sfDir]
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    println("==== extraction pipeline (expect: single scan, ReadSchema pruned to needed cols, no shuffle)")
    graft.pipeline.ExtractJob.run(graft.pipeline.Synth.pages(spark, sfDir)).explain("formatted")

    println("==== salted extraction (expect exactly ONE Exchange on (host, salt))")
    graft.pipeline.ExtractJob.run(graft.pipeline.Synth.pages(spark, sfDir),
      saltPartitions = 8).explain("formatted")

    println("==== doc scan with lang filter (expect PushedFilters at the parquet scan)")
    spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("lang") === "en").select("doc_id", "n_chars").explain("formatted")

    println("==== resume anti-join (expect BroadcastHashJoin LeftAnti)")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val committed = docs.filter(col("doc_id") % 10 < 3).select("doc_id")
    docs.join(committed, Seq("doc_id"), "left_anti").explain("formatted")

    println("==== star join (expect BroadcastHashJoin, no sort-merge)")
    docs.join(broadcast(spark.read.parquet(s"$sfDir/embeddings.parquet")),
      col("doc_id") === col("vec_id")).groupBy("label").count().explain("formatted")

    spark.stop()
  }
}
