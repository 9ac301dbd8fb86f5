package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, GraphOps, Similarity, TextOps}

/** Round-6 continuation operators: algorithm-level invariants for the
  * snapshot diff, DSIR weighting, IVF multiprobe, and the dataset
  * split (the oracle proves cross-engine parity; these prove the ops
  * compute what their contracts claim). */
class Round6bSpec extends AnyFunSuite {
  import TestSession._

  test("g_snapshot_diff: mutation-batch accounting is conserved") {
    val rows = GraphOps.snapshotDiff(spark, sf).collect()
    val bySec = rows.groupBy(_.getAs[String]("section"))
    def tot(sec: String, c: String): Long =
      bySec(sec).map(_.getAs[Long](c)).sum
    // node side: exactly one added node (region:100); removed =
    // negative-balance suppliers; changed = negative-balance customers
    val g = graft.model.PropertyGraph.load(spark, sf)
    val negSup = g.nodes.filter(col("label") === "supplier" &&
      col("balance") < 0).count()
    val negCust = g.nodes.filter(col("label") === "customer" &&
      col("balance") < 0).count()
    assert(tot("node", "n_added") == 1L)
    assert(tot("node", "n_removed") == negSup)
    assert(tot("node", "n_changed") == negCust)
    // conservation: base rows = removed + changed + unchanged
    assert(g.nodes.count() ==
      tot("node", "n_removed") + tot("node", "n_changed") +
        tot("node", "n_unchanged"))
    // edge side: added = the 3-edge REFERRED fan; removed = edges
    // incident to doomed suppliers; changed = bumped HAS_PART rows
    assert(tot("edge", "n_added") == 3L)
    val doomed = g.nodes.filter(col("label") === "supplier" &&
      col("balance") < 0).select(col("key"))
    val rmEdges = g.edges.join(doomed.withColumnRenamed("key", "dst_key"),
        Seq("dst_key"), "left_semi").filter(col("dst_label") === "supplier")
      .count() +
      g.edges.join(doomed.withColumnRenamed("key", "src_key"),
        Seq("src_key"), "left_semi").filter(col("src_label") === "supplier")
        .count()
    assert(tot("edge", "n_removed") == rmEdges)
    val bumped = g.edges.filter(col("elabel") === "HAS_PART" &&
      col("src_key") <= 50L).count()
    assert(tot("edge", "n_changed") == bumped)
    assert(g.edges.count() ==
      tot("edge", "n_removed") + tot("edge", "n_changed") +
        tot("edge", "n_unchanged"))
  }

  test("t_dsir: target docs outscore non-target on average; selection is the top-k") {
    val rows = TextOps.dsir(spark, sf).collect()
    val docs = graft.model.Tables(spark, sf, "documents")
      .select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // the importance model was built FOR lang=en: mean en score must
    // beat the mean non-en score, or the weighting does nothing
    val (en, other) = rows.partition(r => docs(r.getAs[Long]("doc_id")) == "en")
    val meanEn = en.map(_.getAs[Long]("dsir_ppm")).sum / en.length
    val meanOther = other.map(_.getAs[Long]("dsir_ppm")).sum / other.length
    assert(meanEn > meanOther,
      s"en mean $meanEn not above non-en mean $meanOther")
    // selected = exactly dsirKeep docs, and they are the (score, id) top-k
    val sel = rows.filter(_.getAs[Long]("selected") == 1L)
    assert(sel.length == TextOps.dsirKeep)
    val ordered = rows.sortBy(r =>
      (-r.getAs[Long]("dsir_ppm"), r.getAs[Long]("doc_id")))
      .take(TextOps.dsirKeep).map(_.getAs[Long]("doc_id")).toSet
    assert(sel.map(_.getAs[Long]("doc_id")).toSet == ordered)
  }

  test("s_ivf_multiprobe: per-probe recall vs exact is >= single-probe ivf") {
    def hits(df: org.apache.spark.sql.DataFrame): Map[Long, Int] = {
      val exact = Similarity.annTopk(spark, sf).collect()
        .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("cand_id"))).toSet
      df.collect().map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("cand_id")))
        .filter(exact.contains).groupBy(_._1).map { case (p, g) => p -> g.length }
        .withDefaultValue(0)
    }
    val h1 = hits(Similarity.annIvf(spark, sf))
    val h2 = hits(Similarity.ivfMultiprobe(spark, sf))
    (0L until 10L).foreach { p =>
      assert(h2(p) >= h1(p),
        s"probe $p: multiprobe recall ${h2(p)} < single-probe ${h1(p)}")
    }
  }

  test("g_mst: chosen edges are exactly the Kruskal MSF under the same total order") {
    val labelCode = Map("region" -> 0L, "nation" -> 1L, "customer" -> 2L,
      "supplier" -> 3L, "part" -> 4L, "order" -> 5L)
    def nid(l: String, k: Long) = labelCode(l) * 10000000000000L + k
    val g = graft.model.PropertyGraph.load(spark, sf)
    // canonical min-weight simple edges, same prep as the op
    val eset = g.edges.collect().map { r =>
      val a = nid(r.getAs[String]("src_label"), r.getAs[Long]("src_key"))
      val b = nid(r.getAs[String]("dst_label"), r.getAs[Long]("dst_key"))
      (math.min(a, b), math.max(a, b)) -> r.getAs[Long]("weight")
    }.groupBy(_._1).map { case (k, g) => (k._1, k._2, g.map(_._2).min) }.toSeq
    val nodes = g.nodes.collect().map(r =>
      nid(r.getAs[String]("label"), r.getAs[Long]("key")))
    // Kruskal with union-find under the identical (w, ea, eb) order —
    // an INDEPENDENT algorithm finding the same unique MSF
    val parent = scala.collection.mutable.Map(nodes.map(x => x -> x): _*)
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    val kruskal = scala.collection.mutable.Set[(Long, Long, Long)]()
    eset.sortBy { case (ea, eb, w) => (w, ea, eb) }.foreach {
      case (ea, eb, w) =>
        val (ra, rb) = (find(ea), find(eb))
        if (ra != rb) { parent(ra) = rb; kruskal += ((ea, eb, w)) }
    }
    val chosen = graft.operators.Analytics.mst(spark, sf).collect()
      .map(r => (r.getAs[Long]("ea"), r.getAs[Long]("eb"), r.getAs[Long]("w")))
    // every Borůvka pick is in the unique MSF (cut property under the
    // total order); no edge is ever picked twice across rounds
    assert(chosen.length == chosen.distinct.length, "edge picked twice")
    val missing = chosen.toSet -- kruskal
    assert(missing.isEmpty, s"non-MSF edges chosen: ${missing.take(3)}")
    // at this scale 3 rounds complete the forest: counts must agree with
    // the Kruskal component census exactly
    assert(chosen.length == kruskal.size,
      s"forest incomplete: chosen ${chosen.length} vs MSF ${kruskal.size}")
  }

  test("g_anf: full sketch replay; sub-k sketches are the exact 3-hop ball") {
    import graft.operators.Analytics
    val labelCode = Map("region" -> 0L, "nation" -> 1L, "customer" -> 2L,
      "supplier" -> 3L, "part" -> 4L, "order" -> 5L)
    def nid(l: String, k: Long) = labelCode(l) * 10000000000000L + k
    val g = graft.model.PropertyGraph.load(spark, sf)
    val adj = scala.collection.mutable.Map[Long, Set[Long]]()
      .withDefaultValue(Set())
    g.edges.collect().foreach { r =>
      val a = nid(r.getAs[String]("src_label"), r.getAs[Long]("src_key"))
      val b = nid(r.getAs[String]("dst_label"), r.getAs[Long]("dst_key"))
      adj(a) = adj(a) + b; adj(b) = adj(b) + a
    }
    val nodes = g.nodes.collect().map(r =>
      nid(r.getAs[String]("label"), r.getAs[Long]("key")))
    def h13(id: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      hex.take(13).foldLeft(0L)((acc, c) => acc * 16 + Character.digit(c, 16))
    }
    // replay the KMV recurrence exactly
    var sk: Map[Long, Set[Long]] = nodes.map(v => v -> Set(h13(v))).toMap
    for (_ <- 1 to Analytics.anfRounds)
      sk = nodes.map { v =>
        val merged = sk(v) ++ adj(v).flatMap(sk)
        v -> merged.toSeq.sorted.take(Analytics.anfK).toSet
      }.toMap
    // exact 3-hop balls (including self) for the sub-k check
    var ball: Map[Long, Set[Long]] = nodes.map(v => v -> Set(v)).toMap
    for (_ <- 1 to Analytics.anfRounds)
      ball = nodes.map { v =>
        v -> (ball(v) ++ adj(v).flatMap(ball))
      }.toMap
    val rows = Analytics.anf(spark, sf).collect()
    assert(rows.length == nodes.length)
    rows.foreach { r =>
      val v = nid(r.getAs[String]("label"), r.getAs[Long]("key"))
      val mine = sk(v)
      assert(r.getAs[Long]("n_sketch") == mine.size.toLong,
        s"node $v sketch size ${r.getAs[Long]("n_sketch")} != replay ${mine.size}")
      val want =
        if (mine.size < Analytics.anfK) mine.size.toLong
        else (Analytics.anfK - 1).toLong * Analytics.anfM / math.max(1L, mine.max)
      assert(r.getAs[Long]("est_reach") == want, s"node $v estimate mismatch")
      // a sketch below k lost nothing: it IS the exact ball
      if (mine.size < Analytics.anfK)
        assert(r.getAs[Long]("est_reach") == ball(v).size.toLong,
          s"node $v sub-k sketch ${mine.size} != exact ball ${ball(v).size}")
    }
  }

  test("g_triangle_estimate: sampled count is a subgraph count; arithmetic exact") {
    import graft.operators.Analytics
    val r = Analytics.triangleEstimate(spark, sf).collect().head
    val (nS, triS, est, exact, err) = (r.getAs[Long]("n_sampled"),
      r.getAs[Long]("tri_sampled"), r.getAs[Long]("est_triangles"),
      r.getAs[Long]("tri_exact"), r.getAs[Long]("err_ppm"))
    // the sampled graph is a subgraph: its census can never exceed exact
    assert(triS <= exact && nS <= r.getAs[Long]("n_edges"))
    val p3 = Analytics.triSampleP * Analytics.triSampleP * Analytics.triSampleP
    assert(est == triS * p3)
    assert(err == math.abs(est - exact) * 1000000L / math.max(1L, exact))
    // exact side must agree with the census op itself
    val tri = Analytics.triangles(spark, sf).collect().head
    assert(exact == tri.getAs[Long]("n_triangles"),
      s"support-frame exact $exact != census ${tri.getAs[Long]("n_triangles")}")
  }

  test("g_louvain_move: every community choice is the replayed argmax gain") {
    val labelCode = Map("region" -> 0L, "nation" -> 1L, "customer" -> 2L,
      "supplier" -> 3L, "part" -> 4L, "order" -> 5L)
    def nid(l: String, k: Long) = labelCode(l) * 10000000000000L + k
    val g = graft.model.PropertyGraph.load(spark, sf)
    // weighted undirected adjacency with parallel edges collapsed
    val kin = scala.collection.mutable.Map[(Long, Long), Long]()
      .withDefaultValue(0L)
    g.edges.collect().foreach { r =>
      val a = nid(r.getAs[String]("src_label"), r.getAs[Long]("src_key"))
      val b = nid(r.getAs[String]("dst_label"), r.getAs[Long]("dst_key"))
      val w = r.getAs[Long]("weight")
      kin((a, b)) += w; kin((b, a)) += w
    }
    val k = kin.toSeq.groupBy(_._1._1)
      .map { case (i, es) => i -> es.map(_._2).sum }.withDefaultValue(0L)
    val m2 = kin.values.sum
    val rows = graft.operators.Analytics.louvainMove(spark, sf).collect()
    rows.foreach { r =>
      val i = nid(r.getAs[String]("label"), r.getAs[Long]("key"))
      val cands = kin.collect { case ((a, c), w) if a == i =>
        c -> (m2 * w - k(i) * k(c)) }.filter(_._2 > 0)
      val want =
        if (cands.isEmpty) i
        else cands.toSeq.sortBy { case (c, gain) => (-gain, c) }.head._1
      assert(r.getAs[Long]("comm") == want,
        s"node $i chose ${r.getAs[Long]("comm")}, replay says $want")
    }
    // the move phase must actually form communities: strictly fewer
    // distinct communities than nodes
    assert(rows.map(_.getAs[Long]("comm")).distinct.length < rows.length)
  }

  test("t_bpe_apply: token counts replay under the trained merges") {
    // replay: learn the same merges in memory (the Round6Spec BPE
    // replay machinery, reduced), apply to every word, count tokens
    val docs = graft.model.Tables(spark, sf, "documents")
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    var vocab: Map[String, Long] = docs.flatMap(_._2.split(" "))
      .filter(_.length >= 2).groupBy(identity)
      .map { case (w, g) => w.toSeq.mkString(" ") -> g.length.toLong }
    for (_ <- 1 to TextOps.bpeIters) {
      val pairCounts = scala.collection.mutable.Map[String, Long]()
        .withDefaultValue(0L)
      vocab.foreach { case (w, c) =>
        val sy = w.split(" ")
        sy.zip(sy.tail).foreach { case (a, b2) =>
          pairCounts(s"$a $b2") += c }
      }
      val best = pairCounts.toSeq.sortBy { case (p, f) => (-f, p) }.head._1
      vocab = vocab.map { case (w, c) =>
        w.replace(best, best.replace(" ", "")) -> c }
        .groupBy(_._1).map { case (w, g) => w -> g.map(_._2).sum }
    }
    val nSym: Map[String, Long] = vocab.map { case (w, _) =>
      w.replace(" ", "") -> w.split(" ").length.toLong }
    val want = docs.groupBy(_._1).map { case (src, g) =>
      val ws = g.flatMap(_._2.split(" "))
      src -> ws.map(w => nSym.getOrElse(w, w.length.toLong)).sum
    }
    val rows = TextOps.bpeApply(spark, sf).collect()
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      assert(r.getAs[Long]("n_bpe_tokens") == want(src),
        s"$src: bpe tokens ${r.getAs[Long]("n_bpe_tokens")} != replay ${want(src)}")
      assert(r.getAs[Long]("n_bpe_tokens") <= r.getAs[Long]("n_chars"))
      assert(r.getAs[Long]("n_bpe_tokens") >= r.getAs[Long]("n_words"))
    }
  }

  test("s_hybrid_search: rrf replays from the leg ranks; single-leg candidates survive") {
    val rows = Similarity.hybridSearch(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (rl, rv, rrf) = (r.getAs[Int]("r_lex"), r.getAs[Int]("r_vec"),
        r.getAs[Long]("rrf"))
      // every fused candidate came from at least one leg, and the rrf
      // is exactly the two reciprocal terms
      assert(rl > 0 || rv > 0)
      val want = (if (rl > 0) 1000000L / (60 + rl) else 0L) +
        (if (rv > 0) 1000000L / (60 + rv) else 0L)
      assert(rrf == want, s"rrf $rrf != $want for ranks ($rl, $rv)")
      assert(rl <= Similarity.hybridTopn && rv <= Similarity.hybridTopn)
    }
    // fusion is doing work: some probe's list mixes dual-leg and
    // single-leg candidates (pure-intersection output would mean the
    // full-outer join degenerated to inner)
    assert(rows.exists(r => r.getAs[Int]("r_lex") == 0 ||
      r.getAs[Int]("r_vec") == 0), "no single-leg candidate surfaced")
    assert(rows.exists(r => r.getAs[Int]("r_lex") > 0 &&
      r.getAs[Int]("r_vec") > 0), "no dual-leg candidate surfaced")
    // per-probe ordering is (rrf desc, cand asc)
    rows.groupBy(_.getAs[Long]("probe_id")).foreach { case (_, g) =>
      val sorted = g.sortBy(_.getAs[Int]("rn"))
      sorted.zip(sorted.tail).foreach { case (a, b) =>
        assert(a.getAs[Long]("rrf") > b.getAs[Long]("rrf") ||
          (a.getAs[Long]("rrf") == b.getAs[Long]("rrf") &&
            a.getAs[Long]("cand_id") < b.getAs[Long]("cand_id")))
      }
    }
  }

  test("src_manifest_snapshot: manifest readers are isolated from newer files") {
    import graft.sources.Formats
    // run the op (writes gen1+manifest-1, then gen2+manifest-2)
    val byVersion = Formats.manifestSnapshot(spark, sf).collect()
      .map(r => r.getAs[Long]("version") -> r.getAs[Long]("n_docs")).toMap
    val docs = graft.model.Tables(spark, sf, "documents")
    val even = docs.filter(col("doc_id") % 2 === 0).count()
    val all = docs.count()
    assert(byVersion(1L) == even && byVersion(2L) == all)
    // ISOLATION: reading manifest v1 NOW — with gen2's files on disk in
    // the same tree — still returns exactly the v1 snapshot, twice
    val v1a = Formats.manifestRead(spark, sf, 1)
    assert(v1a.count() == even)
    assert(v1a.filter(col("doc_id") % 2 === 1).count() == 0,
      "a phantom odd row leaked into the v1 snapshot")
    assert(Formats.manifestRead(spark, sf, 1).count() == even)
    // the CONTRAST: a directory-listing reader sees the phantoms —
    // which is why lakehouse readers never plan from listings
    assert(Formats.manifestDirListingRead(spark, sf).count() == all)
  }

  test("d_dup_distribution: histogram masses reconcile with the cluster op") {
    val rows = Dedup.dupDistribution(spark, sf).collect()
    val nDocs = graft.model.Tables(spark, sf, "documents").count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == nDocs,
      "histogram doc mass != corpus size")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_docs") ==
        r.getAs[Long]("cluster_size") * r.getAs[Long]("n_clusters"))
      assert(r.getAs[Long]("doc_share_ppm") ==
        r.getAs[Long]("n_docs") * 1000000L / nDocs)
    }
    // cross-check the multi-doc mass against d_soft_dedup's cluster view
    val dupDocs = Dedup.softDedup(spark, sf)
      .filter(col("n_members") > 1).count()
    assert(rows.filter(_.getAs[Long]("cluster_size") > 1)
      .map(_.getAs[Long]("n_docs")).sum == dupDocs)
  }

  test("m_phash_eval: counts consistent with the two source pair ops") {
    import graft.operators.Multimodal
    val r = Multimodal.phashEval(spark, sf).collect().head
    val (nPred, nTruth, nTp) = (r.getAs[Long]("n_pred"),
      r.getAs[Long]("n_truth"), r.getAs[Long]("n_tp"))
    assert(nTp <= math.min(nPred, nTruth))
    assert(nPred == Multimodal.phashDedup(spark, sf).count(),
      "pred count != m_phash_dedup pair count")
    assert(nTruth == Dedup.ngramJaccard(spark, sf).count(),
      "truth count != d_ngram_jaccard pair count")
    assert(r.getAs[Long]("precision_ppm") ==
      (if (nPred == 0) 0L else nTp * 1000000L / nPred))
    assert(r.getAs[Long]("recall_ppm") ==
      (if (nTruth == 0) 0L else nTp * 1000000L / nTruth))
  }

  test("q_skyline: window formulation equals brute-force dominance") {
    val o = graft.model.Tables(spark, sf, "orders")
    val c = graft.model.Tables(spark, sf, "customer")
    val spend = o.groupBy(col("o_custkey"))
      .agg((sum(col("o_totalprice").cast("decimal(12,2)")) * 100)
        .cast("long").as("sp")).collect()
      .map(r => r.getAs[Long]("o_custkey") -> r.getAs[Long]("sp")).toMap
    val pts = c.select(col("c_custkey"),
      (col("c_acctbal").cast("decimal(12,2)") * 100).cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1), spend.getOrElse(r.getLong(0), 0L)))
    // O(n²) dominance — the definition, not the windowed shortcut
    val want = pts.filter { case (id, x, y) =>
      !pts.exists { case (id2, x2, y2) =>
        id2 != id && x2 >= x && y2 >= y && (x2 > x || y2 > y) }
    }.map(_._1).toSet
    val got = graft.operators.Relational.qSkyline(spark, sf).collect()
      .map(_.getAs[Long]("c_custkey")).toSet
    assert(got == want, s"skyline ${got.size} != brute ${want.size}")
  }

  test("g_neighborhood_function: monotone curve, consistent with g_anf at the horizon") {
    import graft.operators.Analytics
    val rows = Analytics.neighborhoodFunction(spark, sf).collect()
      .sortBy(_.getAs[Long]("hop"))
    assert(rows.map(_.getAs[Long]("hop")).toSeq ==
      (1L to Analytics.anfRounds.toLong))
    // monotone: balls only grow, and a KMV superset's estimate is >=
    val est = rows.map(_.getAs[Long]("n_pairs_est"))
    assert(est.zip(est.tail).forall { case (a, b) => b >= a },
      s"N(h) decreased: ${est.mkString(",")}")
    // growth_ppm is the exact floor ratio
    rows.zip(rows.tail).foreach { case (p, c) =>
      val (np, nc) = (p.getAs[Long]("n_pairs_est"), c.getAs[Long]("n_pairs_est"))
      assert(c.getAs[Long]("growth_ppm") == (nc - np) * 1000000L / np)
    }
    assert(rows.head.getAs[Long]("growth_ppm") == 0L)
    // the curve's horizon row must equal the per-node op aggregated
    val anf = Analytics.anf(spark, sf).collect()
    assert(rows.last.getAs[Long]("n_pairs_est") ==
      anf.map(_.getAs[Long]("est_reach")).sum)
    assert(rows.last.getAs[Long]("n_exact_balls") ==
      anf.count(_.getAs[Long]("n_sketch") < Analytics.anfK))
    // h=1: exact balls are degree+1 — the estimate is near-exact there
    // (sanity anchor: N(1) must be within a few percent of 2m+n)
    val g = graft.model.PropertyGraph.load(spark, sf)
    val truth1 = 2 * g.edges.count() + g.nodes.count()
    val n1 = rows.head.getAs[Long]("n_pairs_est")
    assert(math.abs(n1 - truth1) * 100 < truth1 * 10,
      s"N(1) $n1 vs exact $truth1 — estimator off by >10%")
  }

  test("t_content_chunking: in-memory chunking replay matches every statistic") {
    def h8(s4: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s4.getBytes("UTF-8")).map("%02x".format(_)).mkString
      hex.take(8).foldLeft(0L)((a, c) => a * 16 + Character.digit(c, 16))
    }
    val texts = graft.model.Tables(spark, sf, "documents")
      .select("text").collect().map(_.getString(0)).filter(_.nonEmpty)
    val chunks = texts.flatMap { t =>
      val cuts = ((1 to math.max(t.length - 3, 0))
        .filter(p => h8(t.substring(p - 1, p + 3)) % TextOps.cdcMod == 0)
        .map(_.toLong) :+ t.length.toLong).distinct.sorted
      cuts.foldLeft((0L, Seq.empty[(String, Long)])) {
        case ((prev, acc), cut) =>
          (cut, acc :+ ((t.substring(prev.toInt, cut.toInt), cut - prev)))
      }._2
    }
    val r = TextOps.contentChunking(spark, sf).collect().head
    assert(r.getAs[Long]("n_chunks") == chunks.length.toLong)
    assert(r.getAs[Long]("total_bytes") == chunks.map(_._2).sum)
    val uniq = chunks.map { case (c, n) => (c, n) }.distinct
    assert(r.getAs[Long]("n_unique") == uniq.length.toLong)
    assert(r.getAs[Long]("unique_bytes") == uniq.map(_._2).sum)
    val (tb, ub) = (chunks.map(_._2).sum, uniq.map(_._2).sum)
    assert(r.getAs[Long]("saved_ppm") == (tb - ub) * 1000000L / tb)
    // edit-locality: chunks really are content-defined — the bulk of a
    // near-dup pair's chunks must coincide (spot check two dup docs)
    assert(r.getAs[Long]("n_unique") < r.getAs[Long]("n_chunks"),
      "no cross-doc chunk dedup found on a corpus with known duplicates")
  }

  test("d_dedup_threshold_curve: tightening the cutoff is monotone both ways") {
    val rows = Dedup.dedupThresholdCurve(spark, sf).collect()
      .sortBy(_.getAs[Long]("threshold"))
    assert(rows.map(_.getAs[Long]("threshold")).toSeq ==
      Dedup.mhCurveTs.map(_.toLong))
    // a higher cutoff can only shrink the claim set: n_pred and n_tp
    // non-increasing, so precision can't fall and recall can't rise
    rows.zip(rows.tail).foreach { case (lo, hi) =>
      assert(hi.getAs[Long]("n_pred") <= lo.getAs[Long]("n_pred"))
      assert(hi.getAs[Long]("n_tp") <= lo.getAs[Long]("n_tp"))
      assert(hi.getAs[Long]("recall_ppm") <= lo.getAs[Long]("recall_ppm"))
    }
    // the ppm columns are the exact floor ratios
    rows.foreach { r =>
      val (p, tp, tr) = (r.getAs[Long]("n_pred"), r.getAs[Long]("n_tp"),
        r.getAs[Long]("n_truth"))
      assert(r.getAs[Long]("precision_ppm") ==
        (if (p == 0) 0L else tp * 1000000L / p))
      assert(r.getAs[Long]("recall_ppm") ==
        (if (tr == 0) 0L else tp * 1000000L / tr))
    }
  }

  test("g_coloring: proper coloring; full Jones-Plassmann replay agrees") {
    import graft.operators.Analytics
    val labelCode = Map("region" -> 0L, "nation" -> 1L, "customer" -> 2L,
      "supplier" -> 3L, "part" -> 4L, "order" -> 5L)
    def nid(l: String, k: Long) = labelCode(l) * 10000000000000L + k
    val g = graft.model.PropertyGraph.load(spark, sf)
    val adj = scala.collection.mutable.Map[Long, Seq[Long]]()
      .withDefaultValue(Seq())
    g.edges.collect().foreach { r =>
      val a = nid(r.getAs[String]("src_label"), r.getAs[Long]("src_key"))
      val b = nid(r.getAs[String]("dst_label"), r.getAs[Long]("dst_key"))
      adj(a) = adj(a) :+ b; adj(b) = adj(b) :+ a
    }
    val nodes = g.nodes.collect().map(r =>
      nid(r.getAs[String]("label"), r.getAs[Long]("key")))
    // LDF priority exactly as the op: least(deg, 65535)*1e14 + id
    // (deg counts edge ENDPOINTS, parallel edges included)
    val p = nodes.map(v =>
      v -> (math.min(adj(v).length, 65535).toLong * 100000000000000L + v)).toMap
    var color = Map.empty[Long, Long]
    for (_ <- 1 to Analytics.colorRounds if color.size < nodes.length) {
      val winners = nodes.filterNot(color.contains).filter(v =>
        adj(v).filterNot(color.contains).forall(u => p(v) > p(u)))
      color = color ++ winners.map { v =>
        val used = adj(v).flatMap(color.get).toSet
        v -> (1L to 100L).find(!used.contains(_)).get
      }
    }
    val got = Analytics.coloring(spark, sf).collect().map(r =>
      nid(r.getAs[String]("label"), r.getAs[Long]("key")) ->
        r.getAs[Long]("color")).toMap
    // exact replay agreement, including any uncolored (0) nodes
    nodes.foreach { v =>
      assert(got(v) == color.getOrElse(v, 0L),
        s"node $v: op ${got(v)} != replay ${color.getOrElse(v, 0L)}")
    }
    // PROPER: no edge joins two equal nonzero colors
    g.edges.collect().foreach { r =>
      val a = nid(r.getAs[String]("src_label"), r.getAs[Long]("src_key"))
      val b = nid(r.getAs[String]("dst_label"), r.getAs[Long]("dst_key"))
      assert(got(a) == 0L || got(b) == 0L || got(a) != got(b),
        s"adjacent nodes $a, $b share color ${got(a)}")
    }
    // and LDF actually finishes here — the measured claim in the doc
    assert(got.values.forall(_ > 0L), "uncolored nodes remain at sf0.001")
  }

  test("g_matching: a valid MAXIMAL matching; local-max replay agrees") {
    import graft.operators.Analytics
    val labelCode = Map("region" -> 0L, "nation" -> 1L, "customer" -> 2L,
      "supplier" -> 3L, "part" -> 4L, "order" -> 5L)
    def nid(l: String, k: Long) = labelCode(l) * 10000000000000L + k
    val g = graft.model.PropertyGraph.load(spark, sf)
    val pairs = g.edges.collect().map { r =>
      val a = nid(r.getAs[String]("src_label"), r.getAs[Long]("src_key"))
      val b = nid(r.getAs[String]("dst_label"), r.getAs[Long]("dst_key"))
      (math.min(a, b), math.max(a, b))
    }.distinct
    def h13(ea: Long, eb: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$ea>$eb".getBytes("UTF-8")).map("%02x".format(_)).mkString
      hex.take(13).foldLeft(0L)((a, c) => a * 16 + Character.digit(c, 16))
    }
    // replay the local-max rounds exactly
    var es = pairs.map { case (ea, eb) => (ea, eb, h13(ea, eb)) }
    val replay = scala.collection.mutable.Map[(Long, Long), Long]()
    var round = 0
    while (round < Analytics.matchRounds && es.nonEmpty) {
      round += 1
      val vmax = (es.map { case (ea, eb, h) => ea -> (h, ea, eb) } ++
        es.map { case (ea, eb, h) => eb -> (h, ea, eb) })
        .groupBy(_._1).map { case (v, g) => v -> g.map(_._2).max }
      val win = es.filter { case (ea, eb, h) =>
        vmax(ea) == ((h, ea, eb)) && vmax(eb) == ((h, ea, eb)) }
      win.foreach { case (ea, eb, _) => replay((ea, eb)) = round.toLong }
      val used = win.flatMap { case (ea, eb, _) => Seq(ea, eb) }.toSet
      es = es.filter { case (ea, eb, _) =>
        !used.contains(ea) && !used.contains(eb) }
    }
    val got = Analytics.matching(spark, sf).collect().map(r =>
      (r.getAs[Long]("ea"), r.getAs[Long]("eb")) -> r.getAs[Long]("round"))
      .toMap
    assert(got == replay.toMap, s"op ${got.size} pairs != replay ${replay.size}")
    // VALID: no node appears in two matched edges
    val ends = got.keys.toSeq.flatMap { case (a, b) => Seq(a, b) }
    assert(ends.length == ends.distinct.length, "a node is matched twice")
    // MAXIMAL (the fixpoint drained here): every edge touches a match
    val matchedV = ends.toSet
    assert(pairs.forall { case (a, b) =>
      matchedV.contains(a) || matchedV.contains(b) },
      "an edge with two free endpoints remains — matching not maximal")
  }

  test("g_densest: the peel trajectory replays exactly; peak is the max") {
    import graft.operators.Analytics
    // build the co-purchase projection in memory
    val hp = graft.model.PropertyGraph.load(spark, sf).edges
      .filter(col("elabel") === "HAS_PART")
      .select("src_key", "dst_key").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val co = hp.groupBy(_._1).values.flatMap { g =>
      val ps = g.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.toSet
    // replay the Bahmani peel: remove d*n*10 <= 21*m each round
    var e = co
    val want = scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]()
    var r = 0
    var go = true
    while (r < Analytics.densestRounds && go && e.nonEmpty) {
      r += 1
      val deg = e.toSeq.flatMap { case (a, b) => Seq(a, b) }
        .groupBy(identity).map { case (v, g) => v -> g.length.toLong }
      val (m, n) = (e.size.toLong, deg.size.toLong)
      want += ((r.toLong, n, m))
      val keep = deg.filter { case (_, d) => d * n * 10L > 21L * m }.keySet
      val e2 = e.filter { case (a, b) => keep(a) && keep(b) }
      if (e2 == e) go = false
      e = e2
    }
    val got = Analytics.densest(spark, sf).collect()
      .sortBy(_.getAs[Long]("round"))
      .map(x => (x.getAs[Long]("round"), x.getAs[Long]("n_nodes"),
        x.getAs[Long]("n_edges")))
    assert(got.toSeq == want.toSeq,
      s"trajectory mismatch:\n op: ${got.toSeq}\n rep: ${want.toSeq}")
    // peak marks exactly the max-density rows
    val rows = Analytics.densest(spark, sf).collect()
    val best = rows.map(_.getAs[Long]("density_ppm")).max
    rows.foreach { x =>
      assert((x.getAs[Long]("is_peak") == 1L) ==
        (x.getAs[Long]("density_ppm") == best))
      assert(x.getAs[Long]("density_ppm") ==
        x.getAs[Long]("n_edges") * 1000000L / x.getAs[Long]("n_nodes"))
    }
  }

  test("t_dsir_eval: the calibration rows reconcile with both composed ops") {
    val rows = TextOps.dsirEval(spark, sf).collect()
      .map(r => r.getAs[Long]("selected") -> r).toMap
    val nDocs = graft.model.Tables(spark, sf, "documents").count()
    assert(rows.values.map(_.getAs[Long]("n_docs")).sum == nDocs)
    assert(rows(1L).getAs[Long]("n_docs") == TextOps.dsirKeep.toLong)
    // keep counts must equal composing the two source ops directly
    val sel = TextOps.dsir(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("selected")).toMap
    val keep = TextOps.gopherQuality(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("keep")).toMap
    Seq(0L, 1L).foreach { g =>
      val want = sel.count { case (d, s2) => s2 == g && keep(d) }
      assert(rows(g).getAs[Long]("n_gopher_keep") == want.toLong,
        s"group $g keep count off")
      assert(rows(g).getAs[Long]("keep_ppm") ==
        want.toLong * 1000000L / rows(g).getAs[Long]("n_docs"))
    }
  }

  test("q_mom_yoy: deltas replay from the monthly frame") {
    val rows = graft.operators.Relational.qMomYoy(spark, sf).collect()
      .sortBy(_.getAs[Long]("month"))
    val rev = rows.map(r => r.getAs[Long]("month") -> r.getAs[Long]("rev_cents"))
    rows.zipWithIndex.foreach { case (r, i) =>
      def delta(lagN: Int): Long =
        if (i < lagN) 0L
        else (rev(i)._2 - rev(i - lagN)._2) * 1000000L / rev(i - lagN)._2
      assert(r.getAs[Long]("mom_ppm") == delta(1), s"mom at ${rev(i)._1}")
      assert(r.getAs[Long]("yoy_ppm") == delta(12), s"yoy at ${rev(i)._1}")
    }
    // months are a strictly increasing yyyymm sequence with valid months
    rev.map(_._1).foreach(m => assert(m % 100 >= 1 && m % 100 <= 12))
    assert(rev.map(_._1).sliding(2).forall(p => p.length < 2 || p(0) < p(1)))
  }

  test("d_dataset_split: content-keyed split leaks nothing and covers the corpus") {
    val rows = Dedup.datasetSplit(spark, sf).collect()
    assert(rows.forall(_.getAs[Long]("n_leak_hashes") == 0L),
      "content-hash split produced a cross-split duplicate")
    val nDocs = graft.model.Tables(spark, sf, "documents").count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == nDocs)
    // every source contributes to train (8/10 of the hash space — at
    // this corpus size an empty train bucket would be a split-key bug)
    val bySrc = rows.groupBy(_.getAs[String]("source"))
    bySrc.foreach { case (src, g) =>
      assert(g.exists(r => r.getAs[String]("split") == "train" &&
        r.getAs[Long]("n_docs") > 0L), s"source $src has no train docs")
    }
    // share_ppm is the exact floor ratio against the source total
    bySrc.foreach { case (_, g) =>
      val nSrc = g.map(_.getAs[Long]("n_docs")).sum
      g.foreach { r =>
        assert(r.getAs[Long]("share_ppm") ==
          r.getAs[Long]("n_docs") * 1000000L / nSrc)
      }
    }
  }
}
