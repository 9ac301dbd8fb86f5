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

  // ---------------------------------------------------------- s_graph_ann
  /** In-memory replay of the whole graph-ANN pipeline (LSH-seeded kNN
    * graph build + entry-point beam search) — the oracle proves
    * cross-engine parity of the formulation; this proves the
    * formulation IS the NSW walk it claims to be, and measures its
    * recall against the exact baseline. */
  test("s_graph_ann: full in-memory build+search replay; recall vs exact is non-vacuous") {
    import graft.operators.Similarity
    // quantized corpus
    val vecs = graft.model.Tables(spark, sf, "embeddings")
      .selectExpr("vec_id",
        "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT)) AS qe")
      .collect().map(r => r.getAs[Long]("vec_id") ->
        r.getSeq[Long](1).toArray).toMap
    def dot(a: Array[Long], b: Array[Long]): Long =
      a.indices.map(i => a(i) * b(i)).sum
    def score(p: Long, c: Long): Long = {
      val dp = dot(vecs(p), vecs(c)); val nb = dot(vecs(c), vecs(c))
      val m = dp * dp * 1000 / nb
      if (dp >= 0) m else -m
    }
    // band signatures from the same deterministic plane matrix
    val sigs = vecs.keys.toSeq.sorted.flatMap { v =>
      (0 until Similarity.lshNumBands).map { b =>
        val sig = (0 until Similarity.lshRowsPerBand).map { j =>
          val pl = Similarity.planeMatrix(b * Similarity.lshRowsPerBand + j)
          if (vecs(v).indices.map(i => vecs(v)(i) * pl(i)).sum >= 0) 1L << j
          else 0L
        }.sum
        (b, sig) -> v
      }
    }
    val pairs = sigs.groupBy(_._1).values.flatMap { bucket =>
      val ids = bucket.map(_._2)
      for (a <- ids; b <- ids if a != b) yield (a, b)
    }.toSet
    // kNN-graph: top-gK by (score desc, id) among banded candidates
    val adj = pairs.groupBy(_._1).map { case (a, ps) =>
      a -> ps.toSeq.map(_._2).distinct
        .sortBy(b => (-score(a, b), b)).take(Similarity.gK)
    }.withDefaultValue(Seq())
    // beam search per probe
    val entry = vecs.keys.min
    def search(p: Long): Seq[(Int, Long, Long)] = {
      var walked = Map(entry -> score(p, entry))
      for (_ <- 1 to Similarity.gHops) {
        val beam = walked.toSeq.sortBy { case (c, s) => (-s, c) }
          .take(Similarity.gBeam).map(_._1)
        val expand = beam.flatMap(adj).distinct
        walked = walked ++ expand.filterNot(walked.contains)
          .map(c => c -> score(p, c))
      }
      walked.toSeq.filter(_._1 != p).sortBy { case (c, s) => (-s, c) }
        .take(Similarity.annK).zipWithIndex
        .map { case ((c, s), i) => (i + 1, c, s) }
    }
    val want = (0L until 10L).flatMap(p => search(p).map {
      case (rn, c, s) => (p, rn, c, s) }).toSet
    val got = Similarity.graphAnn(spark, sf).collect().map(r =>
      (r.getAs[Long]("probe_id"), r.getAs[Int]("rn"),
        r.getAs[Long]("cand_id"), r.getAs[Long]("score"))).toSet
    assert(got == want, s"graph-ANN walk != in-memory replay " +
      s"(got ${got.size}, want ${want.size}; diff ${(got diff want).take(3)})")
    // recall vs the exact baseline — the number the index is judged by;
    // a dead walk (recall 0) would mean the graph or entry is broken
    val exact = Similarity.annTopk(spark, sf).collect()
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("cand_id"))).toSet
    val hits = got.map(t => (t._1, t._3)) intersect exact
    assert(hits.nonEmpty, "graph-ANN found no exact-top-k member at all")
  }

  // -------------------------------------------------- g_core_decomposition
  /** The oracle proves cross-engine parity of the h-index recurrence;
    * this proves the recurrence's fixpoint IS the core number: true
    * SEQUENTIAL PEELING (the textbook algorithm — repeatedly remove
    * the minimum-degree node; its degree at removal time, maximized
    * over prefixes, is its coreness) replayed in memory over the same
    * multigraph edge list, compared on every node. */
  test("g_core_decomposition: h-iteration fixpoint == sequential peeling on every node") {
    val g = graft.model.PropertyGraph.load(spark, sf)
    val edges = g.edges.collect().map { r =>
      (nid(r.getAs[String]("src_label"), r.getAs[Long]("src_key")),
        nid(r.getAs[String]("dst_label"), r.getAs[Long]("dst_key")))
    }
    val nodes = g.nodes.collect().map(r =>
      nid(r.getAs[String]("label"), r.getAs[Long]("key"))).toSeq
    // multigraph adjacency (both directions, multiplicity kept — the
    // op's g_kcore degree convention)
    val adj = scala.collection.mutable.Map[Long, scala.collection.mutable.ArrayBuffer[Long]]()
    edges.foreach { case (a, b) =>
      adj.getOrElseUpdate(a, scala.collection.mutable.ArrayBuffer()) += b
      adj.getOrElseUpdate(b, scala.collection.mutable.ArrayBuffer()) += a
    }
    // sequential peel: min-degree removal; core(v) = the running max
    // of the minimum degree at the time v is removed
    val deg = scala.collection.mutable.Map[Long, Long]()
    nodes.foreach(v => deg(v) = adj.get(v).map(_.size.toLong).getOrElse(0L))
    val alive = scala.collection.mutable.Set(nodes: _*)
    val core = scala.collection.mutable.Map[Long, Long]()
    var k = 0L
    while (alive.nonEmpty) {
      val v = alive.minBy(x => (deg(x), x))
      k = math.max(k, deg(v))
      core(v) = k
      alive -= v
      adj.get(v).foreach(_.foreach { u =>
        if (alive(u)) deg(u) -= 1
      })
    }
    val got = graft.operators.Analytics.coreDecomposition(spark, sf)
      .collect().map(r =>
        nid(r.getAs[String]("label"), r.getAs[Long]("key")) ->
          (r.getAs[Long]("core"), r.getAs[Long]("n_unstable"))).toMap
    assert(got.keySet == nodes.toSet)
    assert(got.values.forall(_._2 == 0L), "h-iteration must reach its fixpoint at sf0.001")
    nodes.foreach { v =>
      assert(got(v)._1 == core(v),
        s"node $v: h-fixpoint ${got(v)._1} != peel coreness ${core(v)}")
    }
    // non-vacuity: a real core hierarchy, not a constant
    assert(core.values.toSet.size > 3, "expected a multi-level core structure")
  }

  // ------------------------------------------------------- s_kmeanspp_seed
  test("s_kmeanspp_seed: in-memory farthest-first replay; picked d2 non-increasing") {
    import graft.operators.Similarity
    val vecs = graft.model.Tables(spark, sf, "embeddings")
      .selectExpr("vec_id",
        "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT)) AS qe")
      .collect().map(r => r.getAs[Long]("vec_id") ->
        r.getSeq[Long](1).toArray).toMap
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.indices.map(i => (a(i) - b(i)) * (a(i) - b(i))).sum
    var seeds = Seq((0, vecs.keys.min, 0L))
    for (r <- 1 until Similarity.kppK) {
      val chosen = seeds.map(s => vecs(s._2))
      val (pickId, pickD2) = vecs.keys.toSeq.sorted
        .map(v => v -> chosen.map(c => d2(vecs(v), c)).min)
        .maxBy { case (v, d) => (d, -v) }
      seeds :+= ((r, pickId, pickD2))
    }
    val got = Similarity.kmeansppSeed(spark, sf).collect()
      .map(r => (r.getAs[Int]("round"), r.getAs[Long]("seed_id"),
        r.getAs[Long]("d2"))).toSeq
    assert(got == seeds, s"farthest-first replay mismatch: $got vs $seeds")
    // Gonzalez: the covering radius (the picked d2) never increases
    val ds = got.drop(1).map(_._3)
    assert(ds == ds.sorted.reverse, s"picked d2 must be non-increasing: $ds")
    assert(got.map(_._2).distinct.size == Similarity.kppK, "seeds must be distinct")
  }

  // -------------------------------------- q_bitmap_distinct / q_ab_test /
  // t_ngram_novelty — invariant specs on the oracle-checked outputs
  test("q_bitmap_distinct: the bitmap path is lossless (== exact distinct per group)") {
    val rows = SparkEntry.queries("q_bitmap_distinct")(spark, sf).collect()
    assert(rows.length == 5) // the 5 order priorities
    rows.foreach { r =>
      assert(r.getAs[Long]("n_distinct_bitmap") ==
        r.getAs[Long]("n_distinct_exact"),
        s"bitmap != exact for ${r.getAs[String]("o_orderpriority")}")
      assert(r.getAs[Long]("n_words") <= r.getAs[Long]("n_distinct_bitmap"),
        "words cannot outnumber members")
    }
  }

  test("q_ab_test: z² matches a direct float computation; groups partition the users") {
    val r = SparkEntry.queries("q_ab_test")(spark, sf).collect().head
    val (na, nb) = (r.getAs[Long]("n_a").toDouble, r.getAs[Long]("n_b").toDouble)
    val (ca, cb) = (r.getAs[Long]("conv_a").toDouble, r.getAs[Long]("conv_b").toDouble)
    val users = graft.model.Tables(spark, sf, "events")
      .select("user_id").distinct().count()
    assert(na + nb == users, "A/B groups must partition the user set")
    assert(na > 0 && nb > 0, "md5-parity split must populate both arms")
    val p = (ca + cb) / (na + nb)
    val z2 = math.pow(ca / na - cb / nb, 2) / (p * (1 - p) * (1 / na + 1 / nb))
    assert(math.abs(r.getAs[Long]("z2_micro") - z2 * 1e6) <= 1.0,
      s"z2_micro ${r.getAs[Long]("z2_micro")} vs float ${z2 * 1e6}")
  }

  test("t_ngram_novelty: the first shingled doc is fully novel; ppm bounded; spot replay") {
    val rows = SparkEntry.queries("t_ngram_novelty")(spark, sf).collect()
    assert(rows.nonEmpty)
    val first = rows.minBy(_.getAs[Long]("doc_id"))
    assert(first.getAs[Long]("novelty_ppm") == 1000000L,
      "the earliest doc's shingles all first-occur there")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_novel") <= r.getAs[Long]("n_shingles"))
      assert(r.getAs[Long]("novelty_ppm") <= 1000000L)
    }
    // spot replay on one later doc: recompute its novel count in memory
    val docs = graft.model.Tables(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    def shingles(t: String): Set[String] = {
      val w = t.split(" ")
      if (w.length < 3) Set()
      else (0 to w.length - 3).map(i => s"${w(i)} ${w(i + 1)} ${w(i + 2)}").toSet
    }
    val target = rows.map(_.getAs[Long]("doc_id")).max
    val mine = shingles(docs(target))
    val earlier = docs.filter(_._1 < target).values.flatMap(shingles).toSet
    val novel = mine.count(sh => !earlier.contains(sh))
    val row = rows.find(_.getAs[Long]("doc_id") == target).get
    assert(row.getAs[Long]("n_shingles") == mine.size.toLong)
    assert(row.getAs[Long]("n_novel") == novel.toLong,
      s"doc $target novelty replay: op ${row.getAs[Long]("n_novel")} vs $novel")
  }
}
