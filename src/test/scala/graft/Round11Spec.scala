package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-11 operators. s_hnsw gets the house gold standard: a full
  * in-memory replay of the hierarchy build (md5-geometric levels,
  * per-layer LSH-banded adjacencies) and the greedy-descent + beam
  * search, compared row-for-row — the oracle proves cross-engine
  * parity of the formulation; this proves the formulation IS the
  * hierarchical walk it claims to be.
  */
class Round11Spec extends AnyFunSuite {
  import TestSession._

  // ---------------------------------------------------------------- s_hnsw
  test("s_hnsw: full in-memory hierarchy replay; aggregate recall >= flat NSW") {
    import graft.operators.Similarity
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
    // banded candidate pairs — the Round9Spec graph-ANN build
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
    // deterministic md5-geometric level (h = first 8 hex chars of
    // md5("hnsw|id"), exactly the op's hexSlice)
    def lvl(v: Long): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"hnsw|$v".getBytes("UTF-8"))
      val hex = md.take(4).map(b => f"$b%02x").mkString
      val h = java.lang.Long.parseLong(hex, 16)
      if (h % 16 == 0) 2 else if (h % 4 == 0) 1 else 0
    }
    def adjAtLevel(minL: Int): Map[Long, Seq[Long]] =
      pairs.filter { case (a, b) => lvl(a) >= minL && lvl(b) >= minL }
        .groupBy(_._1).map { case (a, ps) =>
          a -> ps.toSeq.map(_._2).distinct
            .sortBy(b => (-score(a, b), b)).take(Similarity.gK)
        }.withDefaultValue(Seq())
    val adj0 = adjAtLevel(0)
    val adj1 = adjAtLevel(1)
    val adj2 = adjAtLevel(2)
    val entryTop = {
      val l2 = vecs.keys.filter(lvl(_) >= 2)
      if (l2.nonEmpty) l2.min else vecs.keys.min
    }
    val entryFlat = vecs.keys.min
    def greedy(p: Long, start: (Long, Long),
        adj: Map[Long, Seq[Long]]): (Long, Long) = {
      var cur = start // (cand, score); best-so-far rides each hop
      for (_ <- 1 to Similarity.hLevHops) {
        val cands = Seq(cur) ++ adj(cur._1).map(c => c -> score(p, c))
        cur = cands.minBy { case (c, sc) => (-sc, c) }
      }
      cur
    }
    def search(p: Long): Seq[(Int, Long, Long)] = {
      val s2 = greedy(p, entryTop -> score(p, entryTop), adj2)
      val s1 = greedy(p, s2, adj1)
      var walked = Map(entryFlat -> score(p, entryFlat)) + s1
      for (_ <- 1 to Similarity.gHops) {
        val beam = walked.toSeq.sortBy { case (c, sc) => (-sc, c) }
          .take(Similarity.gBeam).map(_._1)
        val expand = beam.flatMap(adj0).distinct
        walked = walked ++ expand.filterNot(walked.contains)
          .map(c => c -> score(p, c))
      }
      walked.toSeq.filter(_._1 != p).sortBy { case (c, sc) => (-sc, c) }
        .take(Similarity.annK).zipWithIndex
        .map { case ((c, sc), i) => (i + 1, c, sc) }
    }
    val want = (0L until 10L).flatMap(p => search(p).map {
      case (rn, c, sc) => (p, rn, c, sc) }).toSet
    val got = Similarity.hnsw(spark, sf).collect().map(r =>
      (r.getAs[Long]("probe_id"), r.getAs[Int]("rn"),
        r.getAs[Long]("cand_id"), r.getAs[Long]("score"))).toSet
    assert(got == want, s"HNSW walk != in-memory replay " +
      s"(got ${got.size}, want ${want.size}; diff ${(got diff want).take(3)})")
    // hierarchy non-vacuity at sf0.001: upper layers exist and carry
    // edges — otherwise the descent tests nothing
    assert(vecs.keys.count(lvl(_) >= 1) > 0, "no level-1 nodes")
    assert(adj1.nonEmpty, "layer-1 adjacency empty — descent vacuous")
    // AGGREGATE recall ≥ flat NSW: the base beam keeps the flat seed
    // and adds the descent seed. Per-probe monotonicity does NOT hold
    // (both seeds' frontiers compete for the same fixed beam width),
    // which is why the claim is summed over the probe set.
    val rec = Similarity.hnswRecall(spark, sf).collect()
    val hn = rec.map(_.getAs[Long]("hits_hnsw")).sum
    val nsw = rec.map(_.getAs[Long]("hits_nsw")).sum
    assert(hn >= nsw, s"HNSW aggregate recall $hn < flat NSW $nsw")
    assert(hn > 0, "HNSW found no exact-top-k member at all")
  }

  // -------------------------------------------- d_weighted_minhash_eval
  /** The oracle proves cross-engine parity of the Σmin/Σmax
    * formulation; this proves the exact leg IS capped weighted Jaccard
    * — an independent in-memory truth from raw text (token trigrams,
    * tf capped, direct multiset min/max sums) compared on every truth
    * pair, plus the Ioffe reduction sanity: a pair of identical docs
    * must estimate 9/9. */
  test("d_weighted_minhash_eval: exact leg == in-memory capped weighted Jaccard") {
    import graft.operators.Dedup
    val texts = graft.model.Tables(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    def tf(id: Long): Map[String, Long] = {
      val w = texts(id).split(" ", -1)
      if (w.length < 3) Map.empty
      else w.sliding(3).map(_.mkString(" ")).toSeq
        .groupBy(identity).map { case (sh, o) =>
          sh -> math.min(o.size.toLong, Dedup.wmhCap) }
    }
    def wjPpm(a: Long, b: Long): Long = {
      val (ta, tb) = (tf(a), tf(b))
      val keys = ta.keySet ++ tb.keySet
      val mins = keys.toSeq.map(k =>
        math.min(ta.getOrElse(k, 0L), tb.getOrElse(k, 0L))).sum
      val maxs = keys.toSeq.map(k =>
        math.max(ta.getOrElse(k, 0L), tb.getOrElse(k, 0L))).sum
      mins * 1000000L / maxs
    }
    val rows = Dedup.weightedMinhashEval(spark, sf).collect()
    assert(rows.nonEmpty, "no truth pairs at sf0.001")
    rows.foreach { r =>
      val (a, b) = (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))
      assert(r.getAs[Long]("wexact_ppm") == wjPpm(a, b),
        s"pair ($a,$b): op wexact ${r.getAs[Long]("wexact_ppm")} != replay ${wjPpm(a, b)}")
      // sketch estimates live on the 1/9 grid
      Seq("est_wmh_ppm", "est_flat_ppm").foreach { c =>
        assert(r.getAs[Long](c) % (1000000L / 9) <= 1,
          s"$c off the k/9 grid: ${r.getAs[Long](c)}")
      }
    }
  }

  // --------------------------------------------------------- g_transitivity
  test("g_transitivity: T equals g_triangles' census count") {
    import graft.operators.Analytics
    val t3 = Analytics.triangles(spark, sf).collect()
      .head.getAs[Long]("n_triangles")
    val row = Analytics.transitivity(spark, sf).collect().head
    assert(row.getAs[Long]("n_triangles") == t3,
      s"transitivity T ${row.getAs[Long]("n_triangles")} != census $t3")
    val (tt, w) = (row.getAs[Long]("n_triangles"), row.getAs[Long]("n_wedges"))
    assert(w >= 3 * tt, "every triangle contributes three wedges")
    assert(row.getAs[Long]("transitivity_ppm") == 3 * tt * 1000000L / w)
  }

  // ------------------------------------------------------------ q_autocorr
  /** Independent in-memory Pearson per lag from raw orders: BigInt
    * moments (no Spark, no DuckDB), the same one-float-expression
    * finish and HALF_UP round-6 — the gold standard for the one r11
    * op whose correctness otherwise rests on cross-engine parity of
    * the same declarative formulation. */
  test("q_autocorr: in-memory exact-moment Pearson replay at every lag") {
    import graft.operators.Relational
    val daily = graft.model.Tables(spark, sf, "orders")
      .selectExpr(
        "CAST(to_unix_timestamp(o_orderdate) div 86400 AS BIGINT) AS day",
        "CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents")
      .collect().groupBy(_.getAs[Long]("day"))
      .map { case (d, rs) => d -> rs.map(_.getAs[Long]("cents")).sum }
    def corr(k: Int): Option[(Long, Double)] = {
      val pairs = daily.toSeq.flatMap { case (d, x) =>
        daily.get(d - k).map(y => (BigInt(x), BigInt(y)))
      }
      if (pairs.isEmpty) None
      else {
        val n = BigInt(pairs.size)
        val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
        val sxy = pairs.map(p => p._1 * p._2).sum
        val sxx = pairs.map(p => p._1 * p._1).sum
        val syy = pairs.map(p => p._2 * p._2).sum
        val r = (n * sxy - sx * sy).toDouble /
          (math.sqrt((n * sxx - sx * sx).toDouble) *
            math.sqrt((n * syy - sy * sy).toDouble))
        val rounded = BigDecimal(r)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        Some((pairs.size.toLong, rounded))
      }
    }
    val got = Relational.qAutocorr(spark, sf).collect()
      .map(r => r.getAs[Long]("lag_days") ->
        (r.getAs[Long]("n_pairs"), r.getAs[Double]("autocorr"))).toMap
    (1 to 7).foreach { k =>
      (corr(k), got.get(k.toLong)) match {
        case (Some((n, r)), Some((gn, gr))) =>
          assert(gn == n, s"lag $k: n_pairs $gn != replay $n")
          assert(gr == r, s"lag $k: autocorr $gr != replay $r")
        case (None, None) => // lag absent in both — consistent
        case (w, g) => fail(s"lag $k: presence mismatch replay=$w op=$g")
      }
    }
    assert(got.nonEmpty, "no lags at sf0.001")
  }

  // -------------------------------------------------------- q_market_basket
  test("q_market_basket: full in-memory support/lift replay") {
    import graft.operators.Relational
    val li = graft.model.Tables(spark, sf, "lineitem")
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getAs[Long]("l_orderkey"), r.getAs[Long]("l_partkey")))
      .toSet
    val byOrder = li.groupBy(_._1).map { case (o, ps) => o -> ps.map(_._2).toSeq.sorted }
    val n = byOrder.size.toLong // distinct ordering orders
    val partOrders = li.groupBy(_._2).map { case (p, os) => p -> os.size.toLong }
    val pairCounts = byOrder.values.flatMap { ps =>
      for (i <- ps.indices; j <- i + 1 until ps.size) yield (ps(i), ps(j))
    }.groupBy(identity).map { case (pr, o) => pr -> o.size.toLong }
      .filter(_._2 >= Relational.basketMinSup)
    val want = pairCounts.toSeq.map { case ((a, b), nab) =>
      val (na, nb) = (partOrders(a), partOrders(b))
      (a, b, nab, na, nb, nab * n * 1000000L / (na * nb))
    }.sortBy { case (a, b, _, _, _, l) => (-l, a, b) }
      .take(Relational.basketTopK)
      .sortBy { case (a, b, _, _, _, _) => (a, b) }
    val got = Relational.qMarketBasket(spark, sf).collect().map(r =>
      (r.getAs[Long]("pa"), r.getAs[Long]("pb"), r.getAs[Long]("n_ab"),
        r.getAs[Long]("n_a"), r.getAs[Long]("n_b"), r.getAs[Long]("lift_ppm")))
      .toSeq
    assert(got == want,
      s"basket mismatch: got ${got.size} want ${want.size}; " +
        s"first diff ${(got zip want).find(t => t._1 != t._2)}")
    assert(want.nonEmpty, "no pair reached the support floor at sf0.001")
  }

  // ------------------------------------------------------------------ q_rfm
  test("q_rfm: in-memory cutoff + scoring replay") {
    import graft.operators.Relational
    val rows = graft.model.Tables(spark, sf, "orders")
      .selectExpr("o_custkey",
        "CAST(to_unix_timestamp(o_orderdate) div 86400 AS BIGINT) AS day",
        "CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents")
      .collect()
      .map(r => (r.getAs[Long]("o_custkey"), r.getAs[Long]("day"),
        r.getAs[Long]("cents")))
    val byCust = rows.groupBy(_._1)
    val maxDay = rows.map(_._2).max
    val base = byCust.map { case (c, os) =>
      (c, os.size.toLong, maxDay - os.map(_._2).max,
        Math.floorDiv(os.map(_._3).sum, Relational.rfmMonQuant))
    }.toSeq
    def cuts(vs: Seq[Long]): (Long, Long, Long) = {
      val sorted = vs.sorted
      val n = sorted.size.toLong
      def cut(p: Long) = sorted(((n * p + 99) / 100 - 1).toInt)
      (cut(25), cut(50), cut(75))
    }
    val (rc, fc, mc) =
      (cuts(base.map(_._3)), cuts(base.map(_._2)), cuts(base.map(_._4)))
    def score(v: Long, c: (Long, Long, Long)): Long =
      1L + (if (v > c._1) 1 else 0) + (if (v > c._2) 1 else 0) +
        (if (v > c._3) 1 else 0)
    val want = base.groupBy { case (_, f, r, m) =>
      (score(r, rc), score(f, fc), score(m, mc))
    }.map { case (k, g) => (k._1, k._2, k._3, g.size.toLong) }
      .toSeq.sorted
    val got = Relational.qRfm(spark, sf).collect().map(r =>
      (r.getAs[Long]("r_score"), r.getAs[Long]("f_score"),
        r.getAs[Long]("m_score"), r.getAs[Long]("n_customers"))).toSeq.sorted
    assert(got == want, s"RFM mismatch:\n got $got\nwant $want")
    // non-vacuity: more than one populated cell
    assert(want.size > 1, "RFM collapsed to a single segment")
  }

  // ------------------------------------------------------ d_dedup_keep_best
  test("d_dedup_keep_best: kept doc is the quality argmax of its cluster") {
    import graft.operators.{Dedup, TextOps}
    val clusters = Dedup.dedupCluster(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("canon_id"))
    val quality = TextOps.qualityScore(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("quality")).toMap
    val members = clusters.groupBy(_._2).view
      .mapValues(_.map(_._1).toSeq.sorted).toMap
      .filter(_._2.size >= 2)
    val got = Dedup.dedupKeepBest(spark, sf).collect()
    assert(got.map(_.getAs[Long]("canon_id")).toSet == members.keySet,
      "one row per multi-member cluster expected")
    got.foreach { r =>
      val cid = r.getAs[Long]("canon_id")
      val best = members(cid).minBy(d => (-quality(d), d))
      assert(r.getAs[Long]("kept_doc_id") == best,
        s"cluster $cid: kept ${r.getAs[Long]("kept_doc_id")} != argmax $best")
      assert(r.getAs[Long]("n_members") == members(cid).size.toLong)
      assert(r.getAs[Boolean]("kept_ne_canon") == (best != cid))
      assert(r.getAs[Double]("kept_quality") == quality(best))
    }
    assert(got.nonEmpty, "no multi-member clusters at sf0.001")
  }
}
