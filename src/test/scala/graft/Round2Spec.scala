package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.model.PropertyGraph
import graft.operators.{Analytics, Dedup, GraphOps, GraphXAnalytics, Similarity}

/** Round-2 features: full pathsTo semantics, property maps, banded LSH. */
class Round2Spec extends AnyFunSuite {
  import TestSession._

  lazy val g: PropertyGraph = PropertyGraph.load(spark, sf)

  test("pathsTo undirected+labeled: every path obeys both label filters") {
    val rows = GraphOps.pathsLabeled(spark, sf).collect()
    assert(rows.nonEmpty, "at least the direct customer:1>nation:19 hop")
    val allowed = GraphOps.plNodeLabels.toSet
    rows.foreach { r =>
      val hops = r.getAs[String]("path").split(">")
      assert(hops.head == "customer:1" && hops.last == "nation:19")
      assert(hops.distinct.length == hops.length, "non-simple path")
      hops.foreach(h => assert(allowed.contains(h.split(":")(0)),
        s"node label outside filter in ${r.getAs[String]("path")}"))
    }
    // undirectedness does real work: PLACED is customer→order, so the
    // order hop in any depth-4 path was entered AGAINST edge direction
    // by the reversed (order→customer is not stored) — and IN_NATION is
    // traversed forward; a directed traversal finds only the depth-1 hop
    assert(rows.exists(_.getAs[Int]("depth") == 4),
      "expected customer>order>part>supplier>nation paths")
  }

  test("pathsTo with maxDepth <= 0 returns empty, not an exception") {
    assert(g.pathsTo("customer", 1L, "supplier", 1L, maxDepth = 0).isEmpty)
  }

  test("pathsTo src == dst yields no paths (simple-path contract)") {
    // the visited set contains the start, so no path can re-enter it:
    // cycles are excluded by the re-expressed simple-path semantics
    // (documented divergence from Cypher's edge-trail cycles)
    assert(g.pathsTo("customer", 1L, "customer", 1L, maxDepth = 4).isEmpty)
  }

  test("updateNodeProps with an empty change-map is the identity") {
    val a = g.nodeProps.filter(col("label") === "customer" && col("key") <= 5L)
      .select("key", "props").collect()
      .map(r => r.getLong(0) -> r.getMap[String, String](1)).toMap
    val b = g.updateNodeProps(col("label") === "customer", Map.empty)
      .filter(col("label") === "customer" && col("key") <= 5L)
      .select("key", "props").collect()
      .map(r => r.getLong(0) -> r.getMap[String, String](1)).toMap
    assert(a == b)
  }

  test("dedup cluster canon assignment is idempotent") {
    val canon = Dedup.dedupCluster(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every canonical id maps to itself — re-canonicalizing changes nothing
    canon.values.foreach(c => assert(canon(c) == c, s"canon $c not a root"))
  }

  test("pathsTo label filter excluding the start yields no paths") {
    val rows = g.pathsTo("customer", 1L, "nation", 19L, maxDepth = 2,
      nodeLabels = Seq("nation", "region"))
    assert(rows.isEmpty)
  }

  test("removeEdges keeps rows whose predicate evaluates to NULL") {
    // weight IS NOT NULL everywhere, so null-ify via a nullable column:
    // a predicate over balance (absent on edges) is simulated by
    // comparing against a null literal — pred is NULL on every row
    val pred = col("weight") > lit(null).cast("long")
    val before = g.edges.count()
    assert(g.removeEdges(pred).edges.count() == before,
      "NULL predicate must keep rows (three-valued logic)")
  }

  test("property maps: merge adds user key, null removes, others intact") {
    val df = g.updateNodeProps(
      col("label") === "customer" && col("key") === 1L,
      Map("tier" -> Some("gold"), "balance" -> None))
      .filter(col("label") === "customer" && col("key") <= 2L)
    val m1 = df.filter(col("key") === 1L)
      .select(col("props")).collect().head.getMap[String, String](0)
    assert(m1.get("tier").contains("gold"), "user-defined key added")
    assert(!m1.contains("balance"), "null change removes the key")
    assert(m1.contains("name"), "untouched key survives the merge")
    val m2 = df.filter(col("key") === 2L)
      .select(col("props")).collect().head.getMap[String, String](0)
    assert(m2.contains("balance") && !m2.contains("tier"),
      "non-matching rows keep their original map")
  }

  test("banded-LSH embedding dedup: subset of brute force, same values") {
    val brute = Dedup.dedupEmbedding(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val lsh = Similarity.dedupEmbeddingLsh(spark, sf).collect()
    assert(lsh.nonEmpty, "banding must recall some near-dup pairs")
    lsh.foreach { r =>
      val k = (r.getLong(0), r.getLong(1))
      assert(brute.contains(k), s"LSH pair $k not in brute-force truth")
      assert(brute(k) == ((r.getLong(2), r.getLong(3), r.getLong(4))),
        s"dp/na/nb mismatch for $k")
    }
  }

  test("banded-LSH ANN: scores agree with brute force on shared pairs") {
    val brute = Similarity.annTopk(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getLong(3)).toMap
    val lsh = Similarity.annTopkLsh(spark, sf).collect()
    assert(lsh.nonEmpty)
    lsh.foreach { r =>
      val k = (r.getLong(0), r.getLong(2))
      // a pair surfaced by LSH that also ranks top-k in brute force
      // must carry the identical exact integer score
      brute.get(k).foreach(s => assert(s == r.getLong(3),
        s"score mismatch for $k"))
    }
  }

  test("GraphX Pregel CC matches the DataFrame fixed point exactly") {
    val df = Analytics.connectedComponents(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val gx = GraphXAnalytics.connectedComponentsGraphX(spark, sf).collect()
    assert(gx.nonEmpty && gx.length == df.size)
    gx.foreach { r =>
      val k = (r.getString(0), r.getLong(1))
      assert(df(k) == r.getLong(2), s"component mismatch at $k")
    }
  }

  test("structured path: hops zip edge labels with visited nodes") {
    val paths = g.pathsTo("customer", 1L, "nation", 19L,
      maxDepth = GraphOps.plMaxDepth, nodeLabels = GraphOps.plNodeLabels,
      edgeLabels = GraphOps.plEdgeLabels, withEdgeLabels = true)
    val rows = g.pathHops(paths).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val hops = r.getSeq[org.apache.spark.sql.Row](r.fieldIndex("hops"))
      assert(hops.length == r.getAs[Int]("depth"), "one hop per level")
      val last = hops.last
      assert(last.getAs[String]("node") == "nation:19")
      assert(GraphOps.plEdgeLabels.contains(last.getAs[String]("elabel")))
    }
  }

  test("edge identity: id-addressed lookup returns the composite edge") {
    val rows = GraphOps.getEdgeById(spark, sf).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[String]("elabel") == "IN_REGION")
    assert(r.getAs[Long]("src_key") == 19L && r.getAs[Long]("dst_key") == 4L)
  }

  test("sssp: source at 0, costs dominate hop depths, same reachable set") {
    val sssp = Analytics.ssspWeighted(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val bfs = Analytics.bfsDepth(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(sssp(("region", 0L)) == 0L)
    // 6 Bellman-Ford rounds relax exactly the <=6-edge paths, so the
    // reachable set equals 6-level BFS; with weights >= 1 the cheapest
    // cost is at least the hop count
    assert(sssp.keySet == bfs.keySet)
    sssp.foreach { case (k, d) => assert(d >= bfs(k), s"$k: $d < ${bfs(k)}") }
  }

  test("dedup cluster: canon is minimal and direct pairs share a canon") {
    val canon = Dedup.dedupCluster(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(canon.forall { case (id, c) => c <= id })
    val pairs = Dedup.ngramJaccard(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(canon(a) == canon(b), s"pair ($a,$b) split across clusters")
    }
  }

  test("rollup: per-nation subtotals and grand total are consistent") {
    val rows = operators.Relational.qRollup(spark, sf).collect()
    val detail = rows.filter(r => r.getString(0) != "ALL" && r.getInt(1) != -1)
    val natSub = rows.filter(r => r.getString(0) != "ALL" && r.getInt(1) == -1)
    val grand = rows.filter(r => r.getString(0) == "ALL" && r.getInt(1) == -1)
    assert(grand.length == 1)
    assert(grand.head.getAs[Long]("n_orders") ==
      detail.map(_.getAs[Long]("n_orders")).sum)
    natSub.foreach { s =>
      val nat = s.getString(0)
      assert(s.getAs[Long]("n_orders") ==
        detail.filter(_.getString(0) == nat).map(_.getAs[Long]("n_orders")).sum)
    }
  }

  test("session extensions: dot_l reaches the native expression from SQL") {
    val r = spark.sql(
      "SELECT dot_l(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS d").collect()
    assert(r.head.getLong(0) == 32L)
  }

  test("session extensions: hex_slice reaches the native expression from SQL") {
    val r = spark.sql("SELECT hex_slice('ff0a', 1, 4) AS v").collect()
    assert(r.head.getLong(0) == 0xff0aL)
    // non-literal start must be rejected, not mis-planned
    val e = intercept[Exception] {
      spark.sql("SELECT hex_slice('ff', length('x'), 2)").collect()
    }
    assert(e.getMessage.contains("integer literal") ||
      e.getMessage.toLowerCase.contains("hex_slice"))
  }

  test("pack_sequences: per-shard chunking is gapless and consistent") {
    val rows = operators.TextOps.packSequences(spark, sf).collect()
    assert(rows.length == 500)
    val seqLen = operators.TextOps.packSeqLen
    rows.groupBy(_.getAs[Long]("shard")).foreach { case (_, docs) =>
      var cum = 0L
      docs.sortBy(_.getAs[Long]("doc_id")).foreach { r =>
        // seq_id/offset are exactly the running token count chunked
        assert(r.getAs[Long]("seq_id") == cum / seqLen)
        assert(r.getAs[Long]("offset") == cum % seqLen)
        val span = (cum % seqLen + r.getAs[Long]("n_tokens") + seqLen - 1) / seqLen
        assert(r.getAs[Long]("n_seqs") == span)
        cum += r.getAs[Long]("n_tokens")
      }
    }
  }

  test("rep_ngram: repetitive iff strictly over 5% duplicate bigrams") {
    val rows = operators.TextOps.repNgram(spark, sf).collect()
    assert(rows.exists(_.getAs[Boolean]("repetitive")),
      "threshold should flag part of the corpus")
    rows.foreach { r =>
      val total = r.getAs[Long]("n_bigrams")
      val dup = r.getAs[Long]("n_dup")
      assert(dup == total - r.getAs[Long]("n_distinct_bg"))
      assert(r.getAs[Boolean]("repetitive") == (20L * dup > total))
    }
  }

  test("asof join: strict, and matched click is the latest in between") {
    import org.apache.spark.sql.functions.{col, expr}
    val asof = operators.Relational.qEventsAsof(spark, sf).collect()
    assert(asof.nonEmpty)
    val clicks = graft.model.Tables(spark, sf, "events")
      .filter(col("event_type") === "click")
      .select(col("user_id"), expr("ts div 1000").as("us")).collect()
      .groupBy(_.getLong(0)).map { case (u, rs) => u -> rs.map(_.getLong(1)) }
    asof.foreach { r =>
      val (u, pUs, cUs) = (r.getAs[Long]("user_id"),
        r.getAs[Long]("purchase_us"), r.getAs[Long]("click_us"))
      assert(cUs < pUs, "strictly earlier")
      assert(r.getAs[Long]("delay_us") == pUs - cUs)
      // defining as-of property: no click of the same user strictly
      // between the matched click and the purchase
      assert(!clicks(u).exists(c => c > cUs && c < pUs),
        s"user $u: a later click exists between $cUs and $pUs")
    }
  }

  test("kmv sketch: estimate within 25% of the exact distinct count") {
    val r = operators.TextOps.distinctKmv(spark, sf).collect().head
    val (exact, kUsed, est) = (r.getAs[Long]("n_exact"),
      r.getAs[Long]("k_used"), r.getAs[Long]("est_distinct"))
    if (kUsed < operators.TextOps.kmvK) assert(est == kUsed, "small-set: exact")
    else {
      // k=256 ⇒ typical relative error 1/√k ≈ 6%; 25% is a loose bound
      // that still catches a broken estimator (off by 2× or more)
      assert(math.abs(est - exact).toDouble / exact < 0.25,
        s"estimate $est too far from exact $exact")
    }
  }

  test("frame sampling: counts follow the 256-byte/step-4 contract") {
    val rows = operators.Multimodal.frameSampleQ(spark, sf).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val (nf, ns) = (r.getAs[Long]("n_frames"), r.getAs[Long]("n_sampled"))
      assert(ns == (nf + 3) / 4, s"sampled $ns of $nf frames")
      assert(r.getAs[String]("first_frame_md5").length == 32)
    }
  }

  test("minhash band-bucket cap: no band bucket exceeds the cap") {
    // indirect: candidate count is bounded by cap^2/2 per bucket; the
    // direct invariant is that results are reproducible and the planted
    // near-dups (high n_match) survive the cap
    val rows = Dedup.dedupMinhash(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.exists(_.getAs[Long]("n_match") == 9L),
      "exact-dup pairs must agree on all 9 minhashes")
  }
}
