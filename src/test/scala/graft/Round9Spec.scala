package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-9 operators: g_scc against a full in-memory Tarjan replay —
  * the oracle proves cross-engine parity of the trim + FW/BW label
  * formulation; this proves that formulation actually computes
  * strongly connected components (the house gold standard: an
  * independent classical algorithm over the same tiny graph). */
class Round9Spec extends AnyFunSuite {
  import TestSession._

  private val labelCode = Map("region" -> 0L, "nation" -> 1L,
    "customer" -> 2L, "supplier" -> 3L, "part" -> 4L, "order" -> 5L)
  private def nid(l: String, k: Long) = labelCode(l) * 10000000000000L + k

  /** The op's directed graph at sf0.001: base edges + per-order part
    * rings (orderkey % sccRingMod, distinct parts sorted by partkey,
    * closing edge). */
  private def directedAdj(): (Seq[Long], Map[Long, Seq[Long]]) = {
    val g = graft.model.PropertyGraph.load(spark, sf)
    val edges = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    g.edges.collect().foreach { r =>
      edges += ((nid(r.getAs[String]("src_label"), r.getAs[Long]("src_key")),
        nid(r.getAs[String]("dst_label"), r.getAs[Long]("dst_key"))))
    }
    val ringOrders = g.edges.collect()
      .filter(r => r.getAs[String]("elabel") == "HAS_PART" &&
        r.getAs[Long]("src_key") % graft.operators.Analytics.sccRingMod == 0)
      .groupBy(_.getAs[Long]("src_key"))
    ringOrders.foreach { case (_, rows) =>
      val parts = rows.map(_.getAs[Long]("dst_key")).distinct.sorted
      if (parts.length > 1)
        parts.indices.foreach { i =>
          edges += ((nid("part", parts(i)),
            nid("part", parts((i + 1) % parts.length))))
        }
    }
    val nodes = g.nodes.collect().map(r =>
      nid(r.getAs[String]("label"), r.getAs[Long]("key"))).toSeq
    (nodes, edges.distinct.groupBy(_._1).view
      .mapValues(_.map(_._2).toSeq).toMap.withDefaultValue(Seq()))
  }

  /** Iterative Tarjan (explicit stack — sf0.001 recursion depth could
    * exceed the JVM stack on the ring chains). */
  private def tarjan(nodes: Seq[Long],
                     adj: Map[Long, Seq[Long]]): Map[Long, Long] = {
    val index = scala.collection.mutable.Map[Long, Int]()
    val low = scala.collection.mutable.Map[Long, Int]()
    val onStack = scala.collection.mutable.Set[Long]()
    val stack = scala.collection.mutable.ArrayBuffer[Long]()
    val comp = scala.collection.mutable.Map[Long, Long]()
    var counter = 0
    nodes.foreach { root =>
      if (!index.contains(root)) {
        // frames: (node, iterator position)
        val work = scala.collection.mutable.ArrayBuffer[(Long, Int)]((root, 0))
        while (work.nonEmpty) {
          val (v, pi) = work.last
          if (pi == 0) {
            index(v) = counter; low(v) = counter; counter += 1
            stack += v; onStack += v
          }
          val succs = adj(v)
          if (pi < succs.length) {
            work(work.length - 1) = (v, pi + 1)
            val u = succs(pi)
            if (!index.contains(u)) work += ((u, 0))
            else if (onStack(u)) low(v) = math.min(low(v), index(u))
          } else {
            work.remove(work.length - 1)
            if (work.nonEmpty) {
              val (p, _) = work.last
              low(p) = math.min(low(p), low(v))
            }
            if (low(v) == index(v)) {
              val members = scala.collection.mutable.ArrayBuffer[Long]()
              var u = 0L
              do {
                u = stack.remove(stack.length - 1); onStack -= u
                members += u
              } while (u != v)
              val m = members.min // op labels SCCs by min member id
              members.foreach(comp(_) = m)
            }
          }
        }
      }
    }
    comp.toMap
  }

  test("g_scc: full Tarjan replay agrees on every node; ring SCCs are non-trivial") {
    val (nodes, adj) = directedAdj()
    val want = tarjan(nodes, adj)
    val got = graft.operators.Analytics.scc(spark, sf).collect().map(r =>
      nid(r.getAs[String]("label"), r.getAs[Long]("key")) ->
        r.getAs[Long]("scc")).toMap
    assert(got.keySet == nodes.toSet)
    nodes.foreach { v =>
      assert(got(v) == want(v), s"node $v: op ${got(v)} != tarjan ${want(v)}")
    }
    // the construction is non-vacuous at sf0.001: at least one
    // multi-node SCC from the rings, and every non-part node singleton
    val sizes = want.groupBy(_._2).view.mapValues(_.size).toMap
    assert(sizes.values.max > 1, "expected a non-trivial ring SCC")
    nodes.filter(_ < 4L * 10000000000000L).foreach { v =>
      assert(want(v) == v, s"non-part node $v should be a singleton")
    }
    // mutual-reachability spot check inside the largest SCC: its id is
    // a member and every member's component id IS the min member
    val (big, _) = sizes.maxBy(_._2)
    val members = want.collect { case (v, c) if c == big => v }
    assert(members.min == big)
  }
}
