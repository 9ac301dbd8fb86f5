package graft.model

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Immutable property-graph snapshot: two DataFrames.
  *
  * Re-expression of the reference data model (vbmudalige/akka-graph-db,
  * neo4j/Neo4jGraph.scala:37-96): Node {id, label, data}, directed Edge
  * {id, label, _1, _2, data}. At Spark scale identity is the *composite*
  * `(label, key)` — no global id assignment (no zipWithIndex, no driver
  * coordination), so the graph is just two parquet-backed tables and
  * every op shuffles on the composite key. With production tables
  * bucketed by key those shuffles co-locate.
  *
  * Mutations (reference addNode/updateNode/removeNode*, Neo4jGraph.scala
  * :156-490) become batch set operations producing a NEW snapshot —
  * union / anti-join / column-merge — the only transaction shape that
  * scales to 100 TB.
  */
final case class PropertyGraph(nodes: DataFrame, edges: DataFrame) {

  private def onNode(l: String, k: Long): Column =
    col("label") === l && col("key") === k

  /** Reference getNode (Neo4jGraph.scala:212-233): key-predicate scan;
    * both predicates reach the parquet reader via pushdown. */
  def getNode(label: String, key: Long): DataFrame =
    nodes.filter(onNode(label, key))

  /** Reference getNodes(label, data) (Neo4jGraph.scala:235-257). */
  def getNodes(label: String, pred: Column): DataFrame =
    nodes.filter(col("label") === label && pred)

  /** Reference getEdges(label, data) (Neo4jGraph.scala:295-332). */
  def getEdges(elabel: String, pred: Column): DataFrame =
    edges.filter(col("elabel") === elabel && pred)

  /** Reference getEgressEdges (Neo4jGraph.scala:334-368): out-edges of a
    * node, endpoint data attached. Single-node filter → tiny left side →
    * the node join broadcasts. */
  def egress(label: String, key: Long): DataFrame =
    edges.filter(col("src_label") === label && col("src_key") === key)
      .join(nodes.select(col("label").as("dst_label"),
        col("key").as("dst_key"), col("name").as("dst_name")),
        Seq("dst_label", "dst_key"))
      .select(col("elabel"), col("dst_label"), col("dst_key"),
        col("dst_name"), col("weight"))

  /** Reference getIngressEdges (Neo4jGraph.scala:370-404). */
  def ingress(label: String, key: Long): DataFrame =
    edges.filter(col("dst_label") === label && col("dst_key") === key)
      .join(nodes.select(col("label").as("src_label"),
        col("key").as("src_key"), col("name").as("src_name")),
        Seq("src_label", "src_key"))
      .select(col("elabel"), col("src_label"), col("src_key"),
        col("src_name"), col("weight"))

  /** Reference addNode as batch upsert (Neo4jGraph.scala:156-176):
    * new rows win on (label, key) via anti-join — deterministic, no
    * dropDuplicates lottery. */
  def upsertNodes(updates: DataFrame): PropertyGraph =
    copy(nodes = updates.unionByName(
      nodes.join(updates.select("label", "key"), Seq("label", "key"),
        "left_anti")))

  /** Reference removeNodes DETACH semantics (Neo4jGraph.scala:406-431):
    * drop matching nodes AND incident edges via anti-join cascade. */
  def removeNodes(label: String, pred: Column): PropertyGraph = {
    val doomed = getNodes(label, pred).select("label", "key")
    PropertyGraph(
      nodes.join(doomed, Seq("label", "key"), "left_anti"),
      edges
        .join(doomed.select(col("label").as("src_label"),
          col("key").as("src_key")), Seq("src_label", "src_key"), "left_anti")
        .join(doomed.select(col("label").as("dst_label"),
          col("key").as("dst_key")), Seq("dst_label", "dst_key"), "left_anti"))
  }

  /** Reference getEdge (Neo4jGraph.scala:259-293): edge point lookup
    * returning the edge plus both endpoints. Edge identity is the
    * logical composite (elabel, src, dst) — the predicate reaches the
    * parquet scan, endpoint joins broadcast the single-row side. */
  def getEdge(pred: Column): DataFrame =
    edges.filter(pred)
      .join(nodes.select(col("label").as("src_label"),
        col("key").as("src_key"), col("name").as("src_name")),
        Seq("src_label", "src_key"))
      .join(nodes.select(col("label").as("dst_label"),
        col("key").as("dst_key"), col("name").as("dst_name")),
        Seq("dst_label", "dst_key"))
      .select(col("elabel"), col("src_label"), col("src_key"),
        col("src_name"), col("dst_label"), col("dst_key"), col("dst_name"),
        col("weight"))

  /** Reference removeEdge (Neo4jGraph.scala:433-440): drop matching
    * edges, nodes untouched — a predicate anti-filter. */
  def removeEdges(pred: Column): PropertyGraph =
    copy(edges = edges.filter(!pred))

  /** Reference updateEdge property-merge (Neo4jGraph.scala:469-490):
    * column-merge on the matching edge set. */
  def updateEdges(pred: Column, newWeight: Column): PropertyGraph =
    copy(edges = edges.withColumn("weight",
      when(pred, newWeight).otherwise(col("weight"))))

  /** Degree per node — two partial-aggregated shuffles, never a
    * node×edge cartesian. */
  def degrees: DataFrame = {
    val out = edges.groupBy(col("src_label").as("label"),
      col("src_key").as("key")).agg(count(lit(1)).as("out_deg"))
    val in = edges.groupBy(col("dst_label").as("label"),
      col("dst_key").as("key")).agg(count(lit(1)).as("in_deg"))
    nodes.select("label", "key")
      .join(out, Seq("label", "key"), "left_outer")
      .join(in, Seq("label", "key"), "left_outer")
      .select(col("label"), col("key"),
        coalesce(col("out_deg"), lit(0L)).as("out_deg"),
        coalesce(col("in_deg"), lit(0L)).as("in_deg"))
  }

  /** Reference pathsTo (Neo4jGraph.scala:492-519): all simple directed
    * paths start→end, bounded depth. Frontier-driven iterative join: the
    * frontier descends from ONE node so it stays tiny → broadcast side;
    * the edge table is never collected. Visited-set is carried per-path
    * in an array column (simple-path check), all distributed.
    */
  def pathsTo(srcLabel: String, srcKey: Long,
              dstLabel: String, dstKey: Long, maxDepth: Int): DataFrame = {
    val e = edges.select(
      col("src_label"), col("src_key"), col("dst_label"), col("dst_key"),
      concat(col("dst_label"), lit(":"), col("dst_key")).as("dst_id"))
    val startId = s"$srcLabel:$srcKey"
    var frontier = nodes.filter(onNode(srcLabel, srcKey))
      .select(col("label").as("cur_label"), col("key").as("cur_key"),
        lit(startId).as("path"), array(lit(startId)).as("visited"),
        lit(0).as("depth"))
    var results: Option[DataFrame] = None
    for (_ <- 1 to maxDepth) {
      val step = e.join(broadcast(frontier),
          col("src_label") === col("cur_label") &&
          col("src_key") === col("cur_key"))
        .filter(!array_contains(col("visited"), col("dst_id")))
        .select(col("dst_label").as("cur_label"),
          col("dst_key").as("cur_key"),
          concat(col("path"), lit(">"), col("dst_id")).as("path"),
          array_append(col("visited"), col("dst_id")).as("visited"),
          (col("depth") + 1).as("depth"))
      val done = step.filter(col("cur_label") === dstLabel &&
        col("cur_key") === dstKey).select(col("path"), col("depth"))
      results = Some(results.map(_.unionByName(done)).getOrElse(done))
      frontier = step.filter(
        !(col("cur_label") === dstLabel && col("cur_key") === dstKey))
        .cache() // referenced by next level's join AND the result union
    }
    results.get
  }
}

object PropertyGraph {
  /** Deterministic graph from the TPC-H star schema (SURVEY.md §4) —
    * pure SQL-expressible construction so every oracle rebuilds the
    * identical graph in its CTEs.
    */
  def load(spark: SparkSession, dir: String): PropertyGraph = {
    def t(n: String) = Tables(spark, dir, n)
    def node(df: DataFrame, label: String, key: String, name: String,
             balance: Option[String]): DataFrame =
      df.select(lit(label).as("label"), col(key).cast("long").as("key"),
        col(name).as("name"),
        balance.map(col(_).cast("double")).getOrElse(lit(null).cast("double"))
          .as("balance"))

    val nodes =
      node(t("region"), "region", "r_regionkey", "r_name", None)
        .unionByName(node(t("nation"), "nation", "n_nationkey", "n_name", None))
        .unionByName(node(t("customer"), "customer", "c_custkey", "c_name", Some("c_acctbal")))
        .unionByName(node(t("supplier"), "supplier", "s_suppkey", "s_name", Some("s_acctbal")))
        .unionByName(node(t("part"), "part", "p_partkey", "p_name", None))
        .unionByName(node(t("orders"), "order", "o_orderkey", "o_orderstatus", Some("o_totalprice")))

    def edge(df: DataFrame, elabel: String, srcLabel: String, srcKey: String,
             dstLabel: String, dstKey: String): DataFrame =
      df.select(lit(elabel).as("elabel"),
        lit(srcLabel).as("src_label"), col(srcKey).cast("long").as("src_key"),
        lit(dstLabel).as("dst_label"), col(dstKey).cast("long").as("dst_key"),
        lit(1L).as("weight"))

    val li = t("lineitem")
    val edges =
      edge(t("nation"), "IN_REGION", "nation", "n_nationkey", "region", "n_regionkey")
        .unionByName(edge(t("customer"), "IN_NATION", "customer", "c_custkey", "nation", "c_nationkey"))
        .unionByName(edge(t("supplier"), "IN_NATION", "supplier", "s_suppkey", "nation", "s_nationkey"))
        .unionByName(edge(t("orders"), "PLACED", "customer", "o_custkey", "order", "o_orderkey"))
        .unionByName(li.groupBy(col("l_orderkey"), col("l_partkey"))
          .agg(count(lit(1)).as("weight"))
          .select(lit("HAS_PART").as("elabel"),
            lit("order").as("src_label"), col("l_orderkey").cast("long").as("src_key"),
            lit("part").as("dst_label"), col("l_partkey").cast("long").as("dst_key"),
            col("weight")))
        .unionByName(li.groupBy(col("l_partkey"), col("l_suppkey"))
          .agg(count(lit(1)).as("weight"))
          .select(lit("SUPPLIED_BY").as("elabel"),
            lit("part").as("src_label"), col("l_partkey").cast("long").as("src_key"),
            lit("supplier").as("dst_label"), col("l_suppkey").cast("long").as("dst_key"),
            col("weight")))

    // cache(): Spark's cache manager keys on the canonicalized plan, so
    // every query loading the same graph in one session shares ONE
    // materialization of the union + lineitem aggregations (nodes/edges
    // are a few MB even at sf0.1; at 100 TB you'd persist the graph as
    // bucketed tables instead — see SURVEY.md §6)
    PropertyGraph(nodes.cache(), edges.cache())
  }

  /** DuckDB-side reconstruction of the identical graph — the shared CTE
    * prefix every graph oracle starts with. */
  val oracleCte: String =
    """WITH nodes AS (
      | SELECT 'region' AS label, CAST(r_regionkey AS BIGINT) AS key, r_name AS name, CAST(NULL AS DOUBLE) AS balance FROM region
      | UNION ALL SELECT 'nation', CAST(n_nationkey AS BIGINT), n_name, CAST(NULL AS DOUBLE) FROM nation
      | UNION ALL SELECT 'customer', c_custkey, c_name, c_acctbal FROM customer
      | UNION ALL SELECT 'supplier', s_suppkey, s_name, s_acctbal FROM supplier
      | UNION ALL SELECT 'part', p_partkey, p_name, CAST(NULL AS DOUBLE) FROM part
      | UNION ALL SELECT 'order', o_orderkey, o_orderstatus, o_totalprice FROM orders
      |), edges AS (
      | SELECT 'IN_REGION' AS elabel, 'nation' AS src_label, CAST(n_nationkey AS BIGINT) AS src_key, 'region' AS dst_label, CAST(n_regionkey AS BIGINT) AS dst_key, CAST(1 AS BIGINT) AS weight FROM nation
      | UNION ALL SELECT 'IN_NATION', 'customer', c_custkey, 'nation', CAST(c_nationkey AS BIGINT), 1 FROM customer
      | UNION ALL SELECT 'IN_NATION', 'supplier', s_suppkey, 'nation', CAST(s_nationkey AS BIGINT), 1 FROM supplier
      | UNION ALL SELECT 'PLACED', 'customer', o_custkey, 'order', o_orderkey, 1 FROM orders
      | UNION ALL SELECT 'HAS_PART', 'order', l_orderkey, 'part', l_partkey, count(*) FROM lineitem GROUP BY l_orderkey, l_partkey
      | UNION ALL SELECT 'SUPPLIED_BY', 'part', l_partkey, 'supplier', l_suppkey, count(*) FROM lineitem GROUP BY l_partkey, l_suppkey
      |)""".stripMargin
}
