package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Analytics, Relational, TextOps}

/** Round-5 batch 2: cohort retention, event-sequence matching,
  * readability, mixture resampling, bounded-radius betweenness —
  * semantic invariants plus an independent in-memory Brandes recompute
  * (the oracle proves cross-engine parity; this proves the ALGORITHM). */
class Round5bSpec extends AnyFunSuite {
  import TestSession._

  test("q_retention: offset-0 rows cover the whole cohort, ppm bounded") {
    val rows = Relational.qRetention(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("week_offset") >= 0)
      assert(r.getAs[Long]("n_users") <= r.getAs[Long]("cohort_size"))
      assert(r.getAs[Long]("retained_ppm") <= 1000000L)
    }
    // by construction every cohort member is active in their first week
    rows.filter(_.getAs[Long]("week_offset") == 0).foreach { r =>
      assert(r.getAs[Long]("n_users") == r.getAs[Long]("cohort_size"), r.toString)
    }
    // cohort sizes sum to the distinct-user universe
    val users = graft.model.Tables(spark, sf, "events")
      .select("user_id").distinct().count()
    val cohortTotal = rows.filter(_.getAs[Long]("week_offset") == 0)
      .map(_.getAs[Long]("cohort_size")).sum
    assert(cohortTotal == users, s"cohorts $cohortTotal vs users $users")
  }

  test("q_seq_pattern: direct conversions never exceed pattern matches") {
    val rows = Relational.qSeqPattern(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (conv, direct) = (r.getAs[Long]("n_conversions"), r.getAs[Long]("n_direct"))
      assert(conv >= 0 && direct >= 0 && direct <= conv, r.toString)
      assert(conv <= r.getAs[Long]("n_events") / 2, r.toString)
    }
    assert(rows.map(_.getAs[Long]("n_conversions")).sum > 0)
  }

  test("t_readability: buckets consistent, one doc recomputed brute-force") {
    val rows = TextOps.readability(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val f = r.getAs[Long]("flesch_milli")
      val want = if (f >= 60000) "easy" else if (f >= 30000) "medium" else "hard"
      assert(r.getAs[String]("bucket") == want, r.toString)
    }
    val doc = spark.read.parquet(s"$sf/documents.parquet")
      .orderBy("doc_id").limit(1).collect()(0)
    val text = doc.getAs[String]("text")
    val words = text.split(" ").length.toLong
    val sents = math.max("[.!?]".r.findAllIn(text).length, 1).toLong
    val syll = math.max("[aeiouy]+".r.findAllIn(text.toLowerCase).length, 1).toLong
    val flesch = 206835L - (1015L * words) / sents - (84600L * syll) / words
    val got = rows.find(_.getAs[Long]("doc_id") == doc.getAs[Long]("doc_id")).get
    assert(got.getAs[Long]("n_words") == words)
    assert(got.getAs[Long]("flesch_milli") == flesch,
      s"brute force $flesch vs ${got.getAs[Long]("flesch_milli")}")
  }

  test("t_mixture_resample: balanced to the minimum source count") {
    val rows = TextOps.mixtureResample(spark, sf).collect()
    assert(rows.nonEmpty)
    val kept = rows.map(_.getAs[Long]("n_kept")).toSet
    assert(kept.size == 1, s"unbalanced kept counts: $kept")
    val minAvail = rows.map(_.getAs[Long]("avail")).min
    assert(kept.head == minAvail)
    // the pinning columns must describe a plausible member set
    rows.foreach { r =>
      assert(r.getAs[Long]("min_doc_id") <= r.getAs[Long]("max_doc_id"))
      assert(r.getAs[Long]("kept_ppm") <= 1000000L)
    }
    assert(rows.exists(_.getAs[Long]("kept_ppm") == 1000000L),
      "the minimum source must keep everything")
  }

  test("GraphX TriangleCount matches the DataFrame node-iterator exactly") {
    val df = Analytics.triangles(spark, sf).collect()(0)
      .getAs[Long]("n_triangles")
    val gx = graft.operators.GraphXAnalytics.trianglesGraphX(spark, sf)
      .collect()(0).getAs[Long]("n_triangles")
    assert(df == gx, s"DataFrame $df vs GraphX $gx")
    assert(df > 0, "triangle count should be non-trivial at spec scale")
  }

  test("g_butterfly_count: matches an in-memory motif recompute") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byOrder = li.groupBy(_._1).values.map(_.map(_._2).sorted)
    val pairCounts = scala.collection.mutable.Map.empty[(Long, Long), Long]
    for (ps <- byOrder; i <- ps.indices; j <- (i + 1) until ps.length)
      pairCounts((ps(i), ps(j))) = pairCounts.getOrElse((ps(i), ps(j)), 0L) + 1
    val row = Analytics.butterflyCount(spark, sf).collect()(0)
    assert(row.getAs[Long]("n_part_pairs") == pairCounts.size)
    assert(row.getAs[Long]("n_wedges") == pairCounts.values.sum)
    assert(row.getAs[Long]("n_butterflies") ==
      pairCounts.values.map(c => c * (c - 1) / 2).sum)
  }

  test("q_multi_distinct: distinct counts reconcile with direct recompute") {
    val rows = Relational.qMultiDistinct(spark, sf).collect()
    assert(rows.nonEmpty)
    val o = spark.read.parquet(s"$sf/orders.parquet")
    rows.foreach { r =>
      val direct = o.filter(col("o_orderstatus") === r.getAs[String]("status"))
        .select("o_custkey").distinct().count()
      assert(r.getAs[Long]("n_customers") == direct, r.toString)
      assert(r.getAs[Long]("n_priorities") <= 5)
    }
  }

  test("d_dedup_incremental: exactly the full-dedup pairs with a new side") {
    import graft.operators.Dedup
    val newDoc = (id: Long) => id % 5 == 0
    val full = Dedup.dedupMinhash(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Long]("n_match")).toMap
    val inc = Dedup.dedupIncremental(spark, sf).collect()
    inc.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      assert(newDoc(a) || newDoc(b), s"pair ($a,$b) has no new side")
      assert(full.get((a, b)).contains(r.getAs[Long]("n_match")),
        s"pair ($a,$b) disagrees with the full dedup")
      val wantKind = if (newDoc(a) && newDoc(b)) "new-new" else "new-old"
      assert(r.getAs[String]("pair_kind") == wantKind)
    }
    val incPairs = inc.map(r => (r.getLong(0), r.getLong(1))).toSet
    full.keys.filter(p => newDoc(p._1) || newDoc(p._2)).foreach { p =>
      assert(incPairs.contains(p), s"full-dedup pair $p missing incrementally")
    }
  }

  test("g_graph_summary: counts reconcile with the graph frames") {
    val g = graft.model.PropertyGraph.load(spark, sf)
    val rows = graft.operators.GraphOps.graphSummary(spark, sf).collect()
    val nodeTotal = rows.filter(_.getString(0) == "node")
      .map(_.getAs[Long]("n_rows")).sum
    val edgeTotal = rows.filter(_.getString(0) == "edge")
      .map(_.getAs[Long]("n_rows")).sum
    assert(nodeTotal == g.nodes.count())
    assert(edgeTotal == g.edges.count())
    rows.filter(_.getString(0) == "edge").foreach { r =>
      assert(r.getAs[Long]("n_src") <= r.getAs[Long]("n_rows"))
      assert(r.getAs[Long]("total_weight") >= r.getAs[Long]("n_rows"))
    }
  }

  test("g_pagerank_weighted: mass bounded, weights actually shift rank") {
    val w = Analytics.pagerankWeighted(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getAs[Long]("r")).toMap
    val u = Analytics.pagerank(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getAs[Long]("r")).toMap
    assert(w.keySet == u.keySet)
    // floors only ever DROP mass: total stays under the fixed-point unit
    assert(w.values.sum <= Analytics.prScale)
    assert(w.values.forall(_ >= 0))
    // multiplicity-weighted edges must shift rank somewhere (HAS_PART
    // weights exceed 1 in the corpus); identical vectors would mean the
    // weighted path silently fell back to uniform splitting
    assert(w.exists { case (k, v) => u(k) != v },
      "weighted pagerank identical to unweighted on weighted data")
    // hierarchy-only nodes (region gets mass via weight-1 edges from
    // nations whose outdegree is also all weight-1) still score > 0
    assert(w.collect { case (("region", _), v) => v }.forall(_ > 0))
  }

  test("g_node2vec_walk: every walk replayed exactly by an in-memory model") {
    val g = graft.model.PropertyGraph.load(spark, sf)
    val codes = Map("region" -> 0L, "nation" -> 1L, "customer" -> 2L,
      "supplier" -> 3L, "part" -> 4L, "order" -> 5L)
    def id(l: String, k: Long) = codes(l) * 10000000000000L + k
    val pairs: Set[(Long, Long)] =
      g.edges.select("src_label", "src_key", "dst_label", "dst_key")
        .collect().flatMap { r =>
          val a = id(r.getString(0), r.getLong(1))
          val b = id(r.getString(2), r.getLong(3))
          Seq((a, b), (b, a))
        }.toSet
    val adjm = pairs.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    def md5hex(x: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def h8(cur: Long, tag: String): Long =
      java.lang.Long.parseLong(md5hex(s"$cur:$tag").substring(0, 8), 16)
    val rows = Analytics.node2vecWalk(spark, sf).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val ids = r.getAs[String]("path").split(">").map(_.toLong)
      assert(ids.length == Analytics.n2vSteps + 1)
      assert(ids.last == r.getAs[Long]("end_id"))
      ids.sliding(2).foreach { p =>
        assert(adjm(p(0)).contains(p(1)), s"phantom hop ${p.mkString(">")}")
      }
      // replay: uniform first step, then the exact weighted selection
      var prev = ids(0)
      val nb1 = adjm(prev).toSeq.sorted
      var cur = nb1((h8(prev, "n2v1") % nb1.size).toInt)
      assert(ids(1) == cur, s"step 1 of ${r}")
      for (i <- 2 to Analytics.n2vSteps) {
        val cands = adjm(cur).toSeq.sorted
        val wgts = cands.map { b =>
          if (b == prev) Analytics.n2vBack
          else if (adjm(prev).contains(b)) Analytics.n2vTri
          else Analytics.n2vFwd
        }
        val rr = h8(cur, s"n2v$i") % wgts.sum
        var cum = 0L
        var chosen = -1L
        cands.zip(wgts).foreach { case (b, w) =>
          if (chosen < 0) { cum += w; if (cum > rr) chosen = b }
        }
        assert(ids(i) == chosen, s"step $i from $cur (prev $prev)")
        prev = cur; cur = chosen
      }
    }
  }

  test("g_betweenness: matches an independent in-memory Brandes recompute") {
    val g = graft.model.PropertyGraph.load(spark, sf)
    val codes = Map("region" -> 0L, "nation" -> 1L, "customer" -> 2L,
      "supplier" -> 3L, "part" -> 4L, "order" -> 5L)
    def id(l: String, k: Long) = codes(l) * 10000000000000L + k
    val pairs = g.edges.select("src_label", "src_key", "dst_label", "dst_key")
      .collect().flatMap { r =>
        val (a, b) = (id(r.getString(0), r.getLong(1)), id(r.getString(2), r.getLong(3)))
        Seq((a, b), (b, a))
      }.toSet
    val adj = pairs.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    val seeds = g.nodes.filter(col("label") === "nation" &&
        col("key") < Analytics.betweennessPivots)
      .select("key").collect().map(r => id("nation", r.getLong(0)))
    val B = Analytics.betweennessHops
    val acc = scala.collection.mutable.Map.empty[Long, Long]
    for (s0 <- seeds) {
      // forward: level-synchronous sigma
      var levels = Vector(Map(s0 -> 1L))
      var seen = Set(s0)
      for (_ <- 1 to B) {
        val nxt = scala.collection.mutable.Map.empty[Long, Long]
        for ((v, sg) <- levels.last; w <- adj.getOrElse(v, Set.empty)
             if !seen.contains(w))
          nxt(w) = nxt.getOrElse(w, 0L) + sg
        seen ++= nxt.keySet
        levels :+= nxt.toMap
      }
      // backward: ppm-quantized dependency accumulation
      var delta = levels(B).map { case (k, _) => k -> 0L }
      for (i <- (B - 1) to 1 by -1) {
        val cur = scala.collection.mutable.Map.empty[Long, Long]
        for ((v, sv) <- levels(i); w <- adj.getOrElse(v, Set.empty)
             if levels(i + 1).contains(w))
          cur(v) = cur.getOrElse(v, 0L) +
            sv * (1000000L + delta.getOrElse(w, 0L)) / levels(i + 1)(w)
        delta = cur.toMap
        for ((v, d) <- cur) acc(v) = acc.getOrElse(v, 0L) + d
      }
    }
    val want = acc.filter(_._2 > 0)
    val got = Analytics.betweenness(spark, sf).collect()
      .map(r => id(r.getAs[String]("label"), r.getAs[Long]("key")) ->
        r.getAs[Long]("bc_ppm")).toMap
    assert(got.size == want.size, s"${got.size} rows vs brute ${want.size}")
    want.foreach { case (k, v) =>
      assert(got.getOrElse(k, -1L) == v, s"node $k: got ${got.get(k)}, want $v")
    }
  }
}
