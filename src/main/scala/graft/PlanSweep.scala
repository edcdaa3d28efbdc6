package graft
import org.apache.spark.sql.SparkSession

/** Whole-suite physical-plan audit: flags cartesian/nested-loop joins and
  * counts exchanges + non-codegen UDF operators per query. Run after any
  * query change:
  *   sbt -batch "runMain graft.PlanSweep [sfDir]"
  *
  * Known, deliberate exception: q17_embed_topk is the EXACT brute-force ANN
  * baseline — a crossJoin against a broadcast 8-row query side plans as
  * BroadcastNestedLoop by construction (linear in the corpus, the correct
  * shape for an exact-scan baseline; the scale path is q18/q28's LSH).
  */
object PlanSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", false).appName("plansweep").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val bad = Seq("CartesianProduct", "BroadcastNestedLoop")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
      val hits = bad.filter(plan.contains)
      val exchanges = "Exchange".r.findAllIn(plan).length
      val udfs = "BatchEvalPython|ScalaUDF".r.findAllIn(plan).length
      println(s"$name: exchanges=$exchanges udf=$udfs" +
        (if (hits.nonEmpty) s"  !!! ${hits.mkString(",")}" else ""))
    }
    spark.stop()
  }
}
