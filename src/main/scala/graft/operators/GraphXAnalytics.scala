package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.graphx.{Edge => GXEdge, Graph => GXGraph}
import graft.model.PropertyGraph

/** GraphX/Pregel execution path for iterative analytics (SURVEY.md §3:
  * "GraphX Pregel as an alternative execution path where profitable").
  *
  * When it IS profitable: deep-diameter propagation. The DataFrame loop
  * pays one shuffle + one materialization per round; Pregel keeps the
  * vertex state partition-resident across supersteps and only ships
  * messages, so a 50-round propagation on a high-diameter graph (road
  * networks, long chains) avoids 50 plan/materialization round-trips.
  * On the low-diameter TPC-H graph (converges in ~7 rounds) the
  * DataFrame path wins — which is why the ORACLE-CHECKED operator stays
  * the DataFrame one and this path is equivalence-tested against it
  * (Round2Spec: identical component assignment at the fixed point).
  *
  * Vertex ids reuse the same label-coded Longs as the DataFrame path
  * (`labelCode·10¹³ + key` — no zipWithIndex, no id-assignment shuffle),
  * so min-id components are directly comparable across both engines.
  */
object GraphXAnalytics {

  /** Connected components via GraphX's Pregel implementation, run to
    * convergence over the undirected edge set. */
  def connectedComponentsGraphX(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val graph = PropertyGraph.load(s, dir)
    val sid = Analytics.nodeIdCol(col("src_label"), col("src_key"))
    val did = Analytics.nodeIdCol(col("dst_label"), col("dst_key"))
    val nodes = graph.nodes.select(col("label"), col("key"),
      Analytics.nodeIdCol(col("label"), col("key")).as("id"))
    val vertices = nodes.select("id").rdd.map(r => (r.getLong(0), r.getLong(0)))
    // GraphX CC sends messages along BOTH directions of every edge —
    // the stored directed edge set is already the undirected graph here
    val gxEdges = graph.edges.select(sid.as("a"), did.as("b")).rdd
      .map(r => GXEdge(r.getLong(0), r.getLong(1), 1))
    val cc = org.apache.spark.graphx.lib.ConnectedComponents
      .run(GXGraph(vertices, gxEdges))
    val comp = cc.vertices.toDF("id", "comp")
    nodes.join(comp, Seq("id"))
      .select("label", "key", "comp").orderBy("label", "key")
  }
}
