package graft

/** Dev utility: dump the formatted physical plan of any registered
  * query (defaults to a representative set). The automated guard-rails
  * live in PlanAuditSpec; this is for eyeballing a plan while tuning:
  * `sbt "Test/runMain graft.ExplainMain g_connected_components"`. */
object ExplainMain {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8, "explain")
    val dir = "/root/testdata/sf0.01"
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q1_agg", "q5_multijoin", "d_dedup_embedding", "s_ann_topk")
    for (name <- names) {
      println(s"===== $name =====")
      println(SparkEntry.queries(name)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode).take(3500))
    }
    spark.stop()
  }
}
