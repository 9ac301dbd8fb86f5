package graft
object ExplainMain {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8, "explain")
    val dir = "/root/testdata/sf0.01"
    for (name <- Seq("q1_agg", "q5_multijoin", "d_dedup_embedding", "s_ann_topk")) {
      println(s"===== $name =====")
      println(SparkEntry.queries(name)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode).take(3500))
    }
    spark.stop()
  }
}
