package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.model.PropertyGraph
import graft.operators.GraphOps

class GraphOpsSpec extends AnyFunSuite {
  import TestSession._

  lazy val g: PropertyGraph = PropertyGraph.load(spark, sf)

  test("graph construction: node and edge labels are complete") {
    val nl = g.nodes.select("label").distinct().collect().map(_.getString(0)).toSet
    assert(nl == Set("region", "nation", "customer", "supplier", "part", "order"))
    val el = g.edges.select("elabel").distinct().collect().map(_.getString(0)).toSet
    assert(el == Set("IN_REGION", "IN_NATION", "PLACED", "HAS_PART", "SUPPLIED_BY"))
  }

  test("every nation has exactly one region egress edge") {
    val bad = g.edges.filter(col("elabel") === "IN_REGION")
      .groupBy("src_key").count().filter(col("count") =!= 1).count()
    assert(bad == 0)
  }

  test("point lookup returns the single node") {
    val rows = g.getNode("customer", 42L).collect()
    assert(rows.length == 1 && rows.head.getAs[Long]("key") == 42L)
  }

  test("egress of customer 1 = its PLACED orders + nation") {
    val rows = GraphOps.egress(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[String]("elabel")).toSet.subsetOf(Set("PLACED", "IN_NATION")))
  }

  test("upsert then remove round-trips node count") {
    val update = spark.range(1).select(
      lit("region").as("label"), lit(100L).as("key"),
      lit("X").as("name"), lit(null).cast("double").as("balance"))
    val n0 = g.nodes.count()
    val g2 = g.upsertNodes(update)
    assert(g2.nodes.count() == n0 + 1)
    val g3 = g2.removeNodes("region", col("key") === 100L)
    assert(g3.nodes.count() == n0)
  }

  test("removeNodes detaches incident edges") {
    val g2 = g.removeNodes("supplier", lit(true)) // drop ALL suppliers
    assert(g2.nodes.filter(col("label") === "supplier").count() == 0)
    assert(g2.edges.filter(col("elabel") === "SUPPLIED_BY").count() == 0)
    assert(g2.edges.filter(col("dst_label") === "supplier" ||
      col("src_label") === "supplier").count() == 0)
  }

  test("pathsTo finds only simple paths ending at the target") {
    // directed = true: this spec exercises the round-1 directed contract
    // (the default is undirected, matching the reference's `-[*]-`)
    val rows = g.pathsTo("customer", 1L, "supplier", 1L, maxDepth = 3,
      directed = true).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val p = r.getAs[String]("path")
      assert(p.startsWith("customer:1>") && p.endsWith(">supplier:1"))
      val hops = p.split(">")
      assert(hops.distinct.length == hops.length, s"non-simple path $p")
      assert(hops.length - 1 == r.getAs[Int]("depth"))
    }
  }

  test("pathsTo backward-distance prune returns the identical path set") {
    // force pruning on from the very first level (threshold 0) and
    // compare against the default (never activates at this SF): the
    // prune must be invisible in the result — it only cuts expansions
    // that cannot reach the destination in the remaining budget
    val labels = graft.operators.GraphOps.plNodeLabels
    val elabels = graft.operators.GraphOps.plEdgeLabels
    val pruned = g.pathsTo("customer", 1L, "nation", 19L, maxDepth = 4,
      nodeLabels = labels, edgeLabels = elabels, withEdgeLabels = true,
      pruneActivationRows = 0L)
    val plain = g.pathsTo("customer", 1L, "nation", 19L, maxDepth = 4,
      nodeLabels = labels, edgeLabels = elabels, withEdgeLabels = true)
    assert(pruned.count() > 0)
    assert(pruned.except(plain).count() == 0)
    assert(plain.except(pruned).count() == 0)
  }

  test("upsertEdges: new rows win on the composite identity, others survive") {
    import org.apache.spark.sql.functions.lit
    val before = g.edges.count()
    // overwrite an existing edge's weight via the upsert path
    val target = g.edges.filter(col("elabel") === "IN_REGION").limit(1)
      .withColumn("weight", lit(999L))
    val after = g.upsertEdges(target)
    assert(after.edges.count() == before, "upsert of existing edge added a row")
    val hit = after.edges.filter(col("weight") === 999L).collect()
    assert(hit.length == 1, "updated edge not found exactly once")
  }

  test("degrees: every PLACED edge contributes to customer out-degree") {
    val placed = g.edges.filter(col("elabel") === "PLACED").count()
    val custOut = g.degrees.filter(col("label") === "customer")
      .agg(sum("out_deg")).collect().head.getLong(0)
    // customers also have IN_NATION egress
    val custN = g.nodes.filter(col("label") === "customer").count()
    assert(custOut == placed + custN)
  }

  test("label-less scans cover every label the predicate matches") {
    // getNodesAny == union of per-label getNodes over all labels
    // (balance > 0 matches customers, suppliers and orders at any SF)
    val pred = col("balance") > 0.0
    val any = g.getNodesAny(pred)
    val labels = g.nodes.select("label").distinct().collect().map(_.getString(0))
    val perLabel = labels.map(l => g.getNodes(l, pred).count()).sum
    assert(any.count() == perLabel && any.count() > 0)
    assert(any.select("label").distinct().count() > 1,
      "predicate should match across multiple labels")
    val anyE = g.getEdgesAny(col("weight") >= 2L)
    assert(anyE.select("elabel").distinct().count() > 1)
  }

  test("typed props: boolean/int round-trip through the JSON document") {
    val out = graft.operators.GraphOps.typedProps(spark, sf)
    val rows = out.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val key = r.getAs[Long]("key")
      val bal = r.getAs[String]("balance").toDouble
      val vipBase = bal > 5000.0
      // merge semantics: keys 1-10 flip vip (typed boolean op) and lose
      // tier (null => remove); 11-20 keep the extracted typed values
      if (key <= 10) {
        assert(r.getAs[Boolean]("vip") == !vipBase, s"vip not flipped: $r")
        assert(r.isNullAt(r.fieldIndex("tier")), s"tier not removed: $r")
      } else {
        assert(r.getAs[Boolean]("vip") == vipBase, s"vip changed: $r")
        assert(r.getAs[Long]("tier") == key % 5, s"tier mismatch: $r")
      }
    }
  }
}
