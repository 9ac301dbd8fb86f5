package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Analytics, Similarity}

/** Round-5 batch 3: topological levels, integer Lloyd k-means and the
  * SemDeDup prune built on it — each replayed by an independent
  * in-memory model (the oracle proves cross-engine parity; these prove
  * the ALGORITHM computes what it claims). */
class Round5cSpec extends AnyFunSuite {
  import TestSession._

  private val labelCode = Map("region" -> 0L, "nation" -> 1L,
    "customer" -> 2L, "supplier" -> 3L, "part" -> 4L, "order" -> 5L)
  private def nid(l: String, k: Long) = labelCode(l) * 10000000000000L + k

  test("g_topo_levels: matches an in-memory longest-path DP; depth spans 0..5") {
    val g = graft.model.PropertyGraph.load(spark, sf)
    val edges = g.edges
      .select("src_label", "src_key", "dst_label", "dst_key").collect()
      .map(r => (nid(r.getString(0), r.getLong(1)),
        nid(r.getString(2), r.getLong(3))))
    val inEdges = edges.groupBy(_._2).map { case (v, es) => v -> es.map(_._1) }
    val nodes = g.nodes.select("label", "key").collect()
      .map(r => nid(r.getString(0), r.getLong(1)))
    var lvl = nodes.map(_ -> 0L).toMap
    for (_ <- 1 to Analytics.topoIters) {
      lvl = lvl.map { case (v, l) =>
        val in = inEdges.getOrElse(v, Array.empty[Long])
        v -> math.max(l, if (in.isEmpty) 0L else in.map(lvl(_) + 1).max)
      }
    }
    val rows = Analytics.topoLevels(spark, sf).collect()
    assert(rows.length == nodes.length)
    rows.foreach { r =>
      val v = nid(r.getAs[String]("label"), r.getAs[Long]("key"))
      assert(r.getAs[Long]("lvl") == lvl(v), s"node $v")
    }
    // the TPC-H DAG's critical path: customer→order→part→supplier→
    // nation→region, and customers are sources
    assert(rows.map(_.getAs[Long]("lvl")).max == 5)
    rows.filter(_.getAs[String]("label") == "customer")
      .foreach(r => assert(r.getAs[Long]("lvl") == 0, r.toString))
  }

  /** In-memory integer Lloyd, same contract as the operator. */
  private def lloyd(): (Map[Long, (Long, Long)], Map[Long, Array[Long]]) = {
    val vecs: Map[Long, Array[Long]] = spark.read
      .parquet(s"$sf/embeddings.parquet").collect().map { r =>
        r.getAs[Long]("vec_id") -> r.getAs[Seq[Float]]("embedding")
          .map(f => math.floor(f.toDouble * 1000 + 0.5).toLong).toArray
      }.toMap
    def dot(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => x * y }.sum
    var cents: Map[Long, Array[Long]] =
      vecs.filter(_._1 < Similarity.kmK)
    var asg: Map[Long, (Long, Long)] = Map.empty
    for (it <- 1 to Similarity.kmIters) {
      asg = vecs.map { case (v, q) =>
        val nv = dot(q, q)
        val best = cents.toSeq.map { case (cid, qc) =>
          (nv + dot(qc, qc) - 2 * dot(q, qc), cid)
        }.minBy { case (d, cid) => (d, cid) }
        v -> (best._2, best._1)
      }
      if (it < Similarity.kmIters) {
        cents = asg.groupBy(_._2._1).map { case (cid, members) =>
          val qs = members.keys.map(vecs).toSeq
          val n = qs.size.toLong
          cid -> Array.tabulate(qs.head.length) { d =>
            Math.floorDiv(qs.map(_(d)).sum + n * 1024, n) - 1024
          }
        }
      }
    }
    (asg, vecs)
  }

  test("d_kmeans_cluster: matches an in-memory integer-Lloyd replay") {
    val (asg, _) = lloyd()
    val rows = Similarity.kmeansCluster(spark, sf).collect()
    assert(rows.length == asg.size)
    rows.foreach { r =>
      val (cid, dist) = asg(r.getAs[Long]("vec_id"))
      assert(r.getAs[Long]("cluster") == cid, r.toString)
      assert(r.getAs[Long]("dist") == dist, r.toString)
    }
    // every initial centroid survives and claims its own vector
    (0L until Similarity.kmK).foreach(c => assert(asg(c)._1 == c))
  }

  test("d_semdedup: pruned ⇔ an earlier same-cluster cosine>0.45 neighbor") {
    val (asg, vecs) = lloyd()
    def dot(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => x * y }.sum
    val pruned = (for {
      (va, (ca, _)) <- asg.toSeq
      (vb, (cb, _)) <- asg.toSeq
      if ca == cb && va < vb
      dp = dot(vecs(va), vecs(vb))
      if dp > 0 &&
        400L * dp * dp > 81L * dot(vecs(va), vecs(va)) * dot(vecs(vb), vecs(vb))
    } yield vb).toSet
    val rows = Similarity.semDedup(spark, sf).collect()
    assert(rows.length == asg.size)
    rows.foreach { r =>
      val v = r.getAs[Long]("vec_id")
      assert(r.getAs[Long]("cluster") == asg(v)._1, r.toString)
      assert(r.getAs[Long]("keep") == (if (pruned(v)) 0L else 1L), r.toString)
    }
    // the prune actually fires at sf0.01, and never on an initial seed
    assert(pruned.nonEmpty)
    assert(rows.count(_.getAs[Long]("keep") == 0L) == pruned.size)
  }

  test("t_doc_lm_score: matches an in-memory bigram-LM replay") {
    val texts = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    val docBigrams = texts.map { case (id, t) =>
      id -> t.split(" ").sliding(2).filter(_.length == 2)
        .map(a => (a(0), a(1))).toSeq
    }
    val cb = docBigrams.values.flatten
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val cw = cb.groupBy(_._1._1).map { case (w1, m) => w1 -> m.values.sum }
    val condPpm = cb.map { case (bg, c) =>
      bg -> Math.floorDiv(c * 1000000L, cw(bg._1))
    }
    val rows = graft.operators.TextOps.docLmScore(spark, sf).collect()
    assert(rows.length == texts.size)
    rows.foreach { r =>
      val bgs = docBigrams(r.getAs[Long]("doc_id"))
      assert(r.getAs[Long]("n_bigrams") == bgs.size, r.toString)
      val expected =
        if (bgs.isEmpty) 0L
        else Math.floorDiv(bgs.map(condPpm).sum, bgs.size.toLong)
      assert(r.getAs[Long]("lm_ppm") == expected, r.toString)
    }
    // the score separates docs: not all identical at sf0.01
    assert(rows.map(_.getAs[Long]("lm_ppm")).distinct.length > 10)
  }

  test("d_dedup_span: matches an in-memory first-occurrence replay") {
    val texts = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text"))
      .sortBy(_._1)
    // every 8-word sliding span as (hash-key, doc, pos) occurrences
    val occ = texts.flatMap { case (id, t) =>
      val w = t.split(" ")
      (0 to w.length - 8).map(i =>
        (w.slice(i, i + 8).mkString(" "), id, i + 1))
    }
    val byKey = occ.groupBy(_._1)
    val first = byKey.map { case (k, os) =>
      k -> os.map(o => (o._2, o._3)).min
    }
    val expected = texts.map { case (id, _) =>
      val mine = occ.filter(_._2 == id)
      val dup = mine.count(o => byKey(o._1).length > 1)
      val removed = mine.count(o => first(o._1) != ((o._2, o._3)))
      (id, mine.length.toLong, dup.toLong, removed.toLong,
        if (mine.nonEmpty)
          Math.floorDiv(removed.toLong * 1000000L, mine.length.toLong)
        else 0L)
    }
    val rows = graft.operators.Dedup.dedupSpan(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_spans"),
        r.getAs[Long]("n_dup_spans"), r.getAs[Long]("n_removed"),
        r.getAs[Long]("removed_ppm")))
    assert(rows.toSeq == expected.toSeq)
    // the injected exact-duplicate docs make the op non-trivial here
    assert(expected.exists(_._4 > 0L),
      "no removed spans at this sf — op untested")
  }

  test("g_clustering_coef: matches an in-memory adjacency-set replay") {
    val g = graft.model.PropertyGraph.load(spark, sf)
    val hp = g.edges.filter(col("elabel") === "HAS_PART")
      .select("src_key", "dst_key").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byOrder = hp.groupBy(_._1).values
    val co = byOrder.flatMap { es =>
      val ps = es.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.toSet
    val nbrs = (co.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) })
      .groupBy(_._1).map { case (p, es) => p -> es.map(_._2).toSet }
    val rows = graft.operators.Analytics.clusteringCoef(spark, sf).collect()
    assert(rows.length == nbrs.size)
    rows.foreach { r =>
      val p = r.getAs[Long]("p")
      val n = nbrs(p)
      assert(r.getAs[Long]("degree") == n.size.toLong, s"degree of $p")
      val tri = n.toSeq.combinations(2)
        .count(pr => nbrs(pr(0)).contains(pr(1))).toLong
      assert(r.getAs[Long]("n_tri") == tri, s"tri of $p")
      val expLcc = if (n.size >= 2)
        Math.floorDiv(tri * 2000000L, n.size.toLong * (n.size - 1L))
      else 0L
      assert(r.getAs[Long]("lcc_ppm") == expLcc, s"lcc of $p")
    }
    // the projection is dense enough to exercise both branches
    assert(rows.exists(_.getAs[Long]("n_tri") > 0L))
  }

  test("d_dedup_span_rewrite: rebuilt text md5-matches an in-memory rewrite") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val texts = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text"))
      .sortBy(_._1)
    val occ = texts.flatMap { case (id, t) =>
      val w = t.split(" ")
      (0 to w.length - 8).map(i =>
        (w.slice(i, i + 8).mkString(" "), id, i + 1))
    }
    val first = occ.groupBy(_._1).map { case (k, os) =>
      k -> os.map(o => (o._2, o._3)).min
    }
    val expected = texts.map { case (id, t) =>
      val w = t.split(" ")
      val covered = occ.filter(o => o._2 == id && first(o._1) != ((id, o._3)))
        .flatMap(o => o._3 until o._3 + 8).toSet
      val keptWords = w.indices.filterNot(i => covered(i + 1)).map(w)
      (id, w.length.toLong, keptWords.length.toLong,
        md5hex(keptWords.mkString(" ")))
    }
    val rows = graft.operators.Dedup.dedupSpanRewrite(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("n_kept"), r.getAs[String]("kept_md5")))
    assert(rows.toSeq == expected.toSeq)
    // exact-duplicate docs collapse to the empty rebuild; others keep all
    assert(expected.exists(_._3 == 0L), "no fully-rewritten doc at this sf")
    assert(expected.exists(e => e._3 == e._2), "no untouched doc at this sf")
  }

  test("m_phash_dedup: matches an in-memory bigram-histogram + banding replay") {
    val texts = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text"))
    def signature(t: String): (Long, Long) = {
      val bs = t.getBytes("UTF-8").map(_ & 0xff)
      val cnt = Array.fill(64)(0L)
      bs.sliding(2).foreach { p =>
        if (p.length == 2) cnt((p(0) * 31 + p(1)) % 64) += 1
      }
      val total = (bs.length - 1).toLong
      val lo = (0 until 32).map(v =>
        if (cnt(v) * 64 > total) 1L << v else 0L).sum
      val hi = (32 until 64).map(v =>
        if (cnt(v) * 64 > total) 1L << (v - 32) else 0L).sum
      (lo, hi)
    }
    val sigs = texts.map { case (id, t) => id -> signature(t) }.toMap
    def bandVals(s: (Long, Long)): Seq[(Int, Long)] =
      (0 until 8).map(b => b ->
        (if (b < 4) (s._1 >> (b * 8)) & 255L else (s._2 >> ((b - 4) * 8)) & 255L))
    val expected = (for {
      (a, sa) <- sigs.toSeq; (b, sb) <- sigs.toSeq if a < b
      if bandVals(sa).intersect(bandVals(sb)).nonEmpty
      hamming = java.lang.Long.bitCount(sa._1 ^ sb._1) +
        java.lang.Long.bitCount(sa._2 ^ sb._2)
      if hamming <= 2
    } yield (a, b, hamming.toLong)).sorted
    val rows = graft.operators.Multimodal.phashDedup(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Long]("hamming"))).toSeq
    assert(rows == expected)
    // duplicate payloads collide at hamming 0 at this sf
    assert(expected.exists(_._3 == 0L), "no hamming-0 pair — op untested")
  }

  test("t_global_shuffle: matches an in-memory seeded permutation") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val ids = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0))
    val keyed = ids.map(id => (id, md5hex(s"shuf42:$id")))
    val expected = keyed
      .groupBy { case (_, k) => "0123456789abcdef".indexOf(k.head) % 8 }
      .toSeq.flatMap { case (shard, members) =>
        members.sortBy { case (id, k) => (k, id) }.zipWithIndex
          .map { case ((id, _), i) => (id, shard.toLong, i + 1L) }
      }.sortBy(t => (t._2, t._3))
    val rows = graft.operators.TextOps.globalShuffle(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows == expected)
    // every shard non-empty and positions dense from 1
    val byShard = rows.groupBy(_._2)
    assert(byShard.size == 8)
    byShard.values.foreach(m =>
      assert(m.map(_._3).sorted == (1L to m.length).toSeq))
  }
}
