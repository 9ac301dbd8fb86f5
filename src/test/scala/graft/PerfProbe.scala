package graft
import org.apache.spark.sql.functions._
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32, "perf")
    val dir = "/root/testdata/sf0.1"
    def time(n: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(s"PROBE $n: ${(System.nanoTime()-t0)/1e9}%.2f".replace("%.2f","") + s" s rows=$r")
    }
    // variant A: current (localCheckpoint per iter)
    time("pagerank_current") { graft.operators.Analytics.pagerank(spark, dir).count() }
    // variant B: no checkpoint, pure lineage
    import graft.model.PropertyGraph
    time("pagerank_lineage") {
      val graph = PropertyGraph.load(spark, dir)
      val nodes = graph.nodes.select("label", "key")
      val n = nodes.count()
      val e = graph.edges.select(col("src_label"), col("src_key"),
        col("dst_label").as("label"), col("dst_key").as("key"))
      val od = e.groupBy("src_label", "src_key").agg(count(lit(1)).as("outdeg"))
      val eod = e.join(od, Seq("src_label", "src_key")).cache()
      val base = (15L * 10000000000L) / (100L * n)
      var r = nodes.withColumn("r", lit(10000000000L / n))
      for (_ <- 1 to 5) {
        val contrib = eod.join(r.select(col("label").as("src_label"),
            col("key").as("src_key"), col("r")), Seq("src_label", "src_key"))
          .select(col("label"), col("key"), expr("(85 * r) div (100 * outdeg)").as("c"))
          .groupBy("label", "key").agg(sum("c").as("s"))
        r = nodes.join(contrib, Seq("label", "key"), "left_outer")
          .select(col("label"), col("key"), (lit(base) + coalesce(col("s"), lit(0L))).as("r"))
      }
      r.count()
    }
    time("cc_current") { graft.operators.Analytics.connectedComponents(spark, dir).count() }
    spark.stop()
  }
}
