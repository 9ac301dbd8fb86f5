package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-10: the g_scc FW-BW RECURSION step (`Analytics.sccSettle`) on
  * general digraphs — cycles joined by ONE-WAY chords, the shape the
  * r9 implementation loud-aborted on. Gold standard is an in-memory
  * Tarjan over the same edge list (independent classical algorithm),
  * with graphs constructed so settling requires depth 2 and 3 of the
  * recursion (a single label fixpoint provably cannot finish them). */
class Round10Spec extends AnyFunSuite {
  import TestSession._

  /** Iterative Tarjan SCC (explicit stack — no JVM recursion limit). */
  private def tarjan(nodes: Seq[Long], adj: Map[Long, Seq[Long]]): Map[Long, Long] = {
    val index = scala.collection.mutable.Map[Long, Int]()
    val low = scala.collection.mutable.Map[Long, Int]()
    val onStack = scala.collection.mutable.Set[Long]()
    val stack = scala.collection.mutable.ArrayBuffer[Long]()
    val comp = scala.collection.mutable.Map[Long, Long]()
    var counter = 0
    for (root <- nodes if !index.contains(root)) {
      // work-stack frames: (node, iterator position over its successors)
      val work = scala.collection.mutable.ArrayBuffer[(Long, Int)]((root, 0))
      index(root) = counter; low(root) = counter; counter += 1
      stack += root; onStack += root
      while (work.nonEmpty) {
        val (v, i) = work.last
        val succ = adj.getOrElse(v, Seq.empty)
        if (i < succ.length) {
          work(work.length - 1) = (v, i + 1)
          val w = succ(i)
          if (!index.contains(w)) {
            index(w) = counter; low(w) = counter; counter += 1
            stack += w; onStack += w
            work += ((w, 0))
          } else if (onStack(w)) low(v) = math.min(low(v), index(w))
        } else {
          work.remove(work.length - 1)
          if (work.nonEmpty) {
            val p = work.last._1
            low(p) = math.min(low(p), low(v))
          }
          if (low(v) == index(v)) {
            val members = scala.collection.mutable.ArrayBuffer[Long]()
            var w = 0L
            while ({ w = stack.remove(stack.length - 1); onStack -= w
                     members += w; w != v }) ()
            val label = members.min // sccSettle labels by min member id
            members.foreach(m => comp(m) = label)
          }
        }
      }
    }
    comp.toMap
  }

  private def settle(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    val e = edges.toDF("a", "b")
    val interim = scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.DataFrame]()
    try {
      val assigned = graft.operators.Analytics
        .sccSettle(spark, e, 1000000L, interim)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // nodes isolated mid-recursion are omitted = proven singletons
      val nodes = edges.flatMap(p => Seq(p._1, p._2)).distinct
      nodes.map(v => v -> assigned.getOrElse(v, v)).toMap
    } finally interim.foreach(graft.model.PropertyGraph.freeLocalCheckpoint)
  }

  private def check(edges: Seq[(Long, Long)]): Unit = {
    val nodes = edges.flatMap(p => Seq(p._1, p._2)).distinct.sorted
    val adj = edges.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    val expect = {
      val t = tarjan(nodes, adj)
      nodes.map(v => v -> t.getOrElse(v, v)).toMap
    }
    assert(settle(edges) === expect)
  }

  private def cycle(ids: Long*): Seq[(Long, Long)] =
    ids.indices.map(i => ids(i) -> ids((i + 1) % ids.length))

  test("scc recursion: two cycles joined by a one-way chord (depth 2)") {
    // high-id cycle feeds the low-id cycle: at level 1 the high cycle
    // sees f = its own min but b = 1 (it REACHES the low cycle) — the
    // exact f != b shape that used to throw
    check(cycle(1, 2, 3) ++ cycle(10, 11, 12) ++ Seq(10L -> 1L))
  }

  test("scc recursion: three-cycle condensation chain settles at depth 3") {
    // A{30,31} -> B{20,21} -> C{10,11}: level 1 settles only C (its f
    // is the global min 10 reaching it through nothing — B's f=10 via
    // nothing... B is reached by A and itself, f=20? no: nothing from
    // C reaches B, so f(B)=20 while b(B)=10 -> unsettled), level 2
    // settles B, level 3 settles A.
    check(cycle(30, 31) ++ cycle(20, 21) ++ cycle(10, 11) ++
      Seq(30L -> 20L, 20L -> 10L))
  }

  test("scc recursion: chord THROUGH a singleton waypoint leaves it a singleton") {
    // 3 -> 40 -> 10: node 40 sits on a one-way path between two cycles;
    // once both cycles settle and retire, 40 is isolated mid-recursion
    // and must come back as its own singleton, never as a member
    check(cycle(1, 2, 3) ++ cycle(10, 11, 12) ++ Seq(3L -> 40L, 40L -> 10L))
  }

  test("scc recursion: overlapping cycles merge into one SCC with chords attached") {
    // {1,2,3} and {3,4,5} share node 3 => one 5-node SCC; a chord out
    // to cycle {50,51} and back-edge-free tail 60
    check(cycle(1, 2, 3) ++ cycle(3, 4, 5) ++ cycle(50, 51) ++
      Seq(5L -> 50L, 51L -> 60L))
  }

  test("scc recursion: bidirectional chord pair merges the two cycles") {
    // chords both ways make the union strongly connected — settle must
    // label ALL six nodes with the global min 1
    val edges = cycle(1, 2, 3) ++ cycle(10, 11, 12) ++
      Seq(3L -> 10L, 12L -> 1L)
    assert(settle(edges).values.toSet === Set(1L))
  }
}
