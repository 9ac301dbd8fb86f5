package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.model.PropertyGraph

/** The §6 scale claim, proven on the plan: with the graph persisted as
  * bucketed tables (nodes by key, edges by src_key, same bucket count),
  * the traversal join runs WITHOUT a shuffle — hash-partitioning on the
  * bucket column satisfies the join's clustering requirement. */
class BucketedGraphSpec extends AnyFunSuite {
  import TestSession._

  test("bucketed node/edge tables join with no Exchange") {
    val g = PropertyGraph.load(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("graft_bucketed").toString
    PropertyGraph.saveBucketed(g, "bg", dir, buckets = 8)
    try {
      val bg = PropertyGraph.loadBucketed(spark, "bg")
      // round-trip fidelity
      assert(bg.nodes.count() == g.nodes.count())
      assert(bg.edges.count() == g.edges.count())
      // force the shuffle path (a broadcast would hide the property)
      val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val joined = bg.edges.join(bg.nodes,
          col("src_label") === col("label") && col("src_key") === col("key"))
        joined.collect()
        val plan = joined.queryExecution.executedPlan.toString
        assert(!plan.contains("Exchange"),
          s"bucketed join still shuffles:\n$plan")
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
    } finally {
      spark.sql("DROP TABLE IF EXISTS bg_nodes")
      spark.sql("DROP TABLE IF EXISTS bg_edges")
    }
  }
}
