package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Round-8 operators: algorithm-level invariants (the DuckDB oracle
  * proves cross-engine parity; these prove each op computes what its
  * contract claims, against independent in-memory replays). */
class Round8Spec extends AnyFunSuite {
  import TestSession._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("q_hll_distinct: register pipeline equals the imperative HLL replay") {
    val custs = graft.model.Tables(spark, sf, "orders")
      .select(col("o_custkey")).collect().map(_.getLong(0))
    val regs = Array.fill(64)(0)
    custs.foreach { c =>
      val hex = md5hex(c.toString)
      val j = Integer.parseInt(hex.substring(0, 2), 16) % 64
      val w = java.lang.Long.parseLong(hex.substring(2, 12), 16)
      val rho = if (w == 0L) 41
                else 41 - (64 - java.lang.Long.numberOfLeadingZeros(w))
      if (rho > regs(j)) regs(j) = rho
    }
    val sPow = regs.map(m => 1L << (41 - m)).sum
    val vEmpty = regs.count(_ == 0).toLong
    val row = graft.operators.Relational.qHllDistinct(spark, sf).collect().head
    assert(row.getAs[Long]("s_pow") == sPow, "s_pow mismatch vs replay")
    assert(row.getAs[Long]("v_empty") == vEmpty, "v_empty mismatch vs replay")
    assert(row.getAs[Long]("n_exact") == custs.distinct.length.toLong)
    // the estimate must answer within the m=64 error regime (σ≈13%);
    // allow 4σ so the assertion tests the estimator, not the noise
    val est = row.getAs[Double]("est_hll")
    val exact = row.getAs[Long]("n_exact").toDouble
    assert(math.abs(est - exact) / exact < 0.52,
      s"HLL estimate $est implausibly far from exact $exact")
  }

  test("q_chi2: statistic equals the in-memory contingency replay") {
    val o = graft.model.Tables(spark, sf, "orders")
      .select(col("o_custkey"), col("o_orderpriority")).collect()
      .map(r => (r.getAs[Number](0).longValue, r.getString(1)))
    val nat = graft.model.Tables(spark, sf, "customer")
      .select(col("c_custkey"), col("c_nationkey")).collect()
      .map(r => (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue))
      .toMap
    val cells = o.groupBy { case (ck, pri) => (nat(ck), pri) }
      .map { case (k, v) => k -> v.length.toLong }
    val n = cells.values.sum
    val rT = cells.groupBy(_._1._1).map { case (k, v) => k -> v.values.sum }
    val cT = cells.groupBy(_._1._2).map { case (k, v) => k -> v.values.sum }
    val micro = cells.map { case ((r, c), obs) =>
      val num = (BigInt(obs) * n - BigInt(rT(r)) * cT(c))
      math.round((num * num).toDouble / (BigInt(n) * rT(r) * cT(c)).toDouble
        * 1000000.0)
    }.sum
    val chi2 = BigDecimal(micro.toDouble / 1000000.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val row = graft.operators.Relational.qChi2(spark, sf).collect().head
    assert(row.getAs[Double]("chi2") == chi2, "chi2 mismatch vs replay")
    assert(row.getAs[Long]("dof") ==
      (rT.size.toLong - 1) * (cT.size.toLong - 1))
  }

  test("q_time_decay: per-user scores equal the shifted-cents replay") {
    val ev = graft.model.Tables(spark, sf, "events")
      .select(col("user_id"), col("value"), col("ts")).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    val maxDay = ev.map(_._3 / 86400000000000L).max
    val want = ev.groupBy(_._1).map { case (u, es) =>
      val s = es.map { case (_, v, ts) =>
        val cents = BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP)
          .*(100).toLongExact
        val age = math.min(maxDay - ts / 86400000000000L, 40L)
        BigInt(cents) << (40 - age).toInt
      }.sum
      u -> BigDecimal(s.toDouble / 1099511627776.0)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val got = graft.operators.Relational.qTimeDecay(spark, sf).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Double]("decay_score"))
      .toMap
    assert(got == want, "decay scores mismatch vs replay")
  }

  test("q_linreg: slope/intercept/r2 equal the exact-moment OLS replay") {
    val li = graft.model.Tables(spark, sf, "lineitem")
      .select(col("l_suppkey"), col("l_quantity"), col("l_extendedprice"))
      .collect().map(r => (r.getAs[Number](0).longValue,
        r.getAs[Number](1).doubleValue, r.getAs[Number](2).doubleValue))
    val supNat = graft.model.Tables(spark, sf, "supplier")
      .select(col("s_suppkey"), col("s_nationkey")).collect()
      .map(r => (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue))
      .toMap
    val natName = graft.model.Tables(spark, sf, "nation")
      .select(col("n_nationkey"), col("n_name")).collect()
      .map(r => (r.getAs[Number](0).longValue, r.getString(1))).toMap
    def cents(v: Double) = BigInt(BigDecimal(v)
      .setScale(2, BigDecimal.RoundingMode.HALF_UP).*(100).toLongExact)
    val groups = li.groupBy { case (sk, _, _) => natName(supNat(sk)) }
    val got = graft.operators.Relational.qLinreg(spark, sf).collect()
      .map(r => r.getAs[String]("n_name") ->
        ((r.getAs[Double]("slope"), r.getAs[Double]("r2")))).toMap
    groups.foreach { case (name, rows) =>
      val xs = rows.map(t => cents(t._2)); val ys = rows.map(t => cents(t._3))
      val n = BigInt(rows.length)
      val sx = xs.sum; val sy = ys.sum
      val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
      val sxx = xs.map(a => a * a).sum; val syy = ys.map(a => a * a).sum
      def r6(x: Double) = BigDecimal(x)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val slope = r6((n * sxy - sx * sy).toDouble / (n * sxx - sx * sx).toDouble)
      val r2 = r6((n * sxy - sx * sy).toDouble * (n * sxy - sx * sy).toDouble /
        ((n * sxx - sx * sx).toDouble * (n * syy - sy * sy).toDouble))
      assert(got(name)._1 == slope, s"$name slope mismatch")
      assert(got(name)._2 == r2, s"$name r2 mismatch")
    }
  }

  test("t_simpson_diversity + t_hapax: word-count replays agree") {
    val docs = graft.model.Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val gotDiv = graft.operators.TextOps.simpsonDiversity(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_words"), r.getAs[Double]("simpson_div")))).toMap
    docs.foreach { case (id, text) =>
      val cs = text.split(" ", -1).groupBy(identity).map(_._2.length.toLong)
      val nw = cs.sum
      val div = r6(1.0 - cs.map(c => c.toDouble * c).sum / (nw.toDouble * nw))
      assert(gotDiv(id) == ((nw, div)), s"doc $id diversity mismatch")
    }
    val vocab = docs.flatMap(_._2.split(" ", -1)).groupBy(identity)
      .map(_._2.length.toLong)
    val row = graft.operators.TextOps.hapax(spark, sf).collect().head
    assert(row.getAs[Long]("vocab_size") == vocab.size.toLong)
    assert(row.getAs[Long]("n_hapax") == vocab.count(_ == 1L).toLong)
    assert(row.getAs[Long]("n_dis") == vocab.count(_ == 2L).toLong)
  }

  test("t_sentence_stats: segmentation replay agrees") {
    val docs = graft.model.Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val got = graft.operators.TextOps.sentenceStats(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_sentences"), r.getAs[Long]("max_sent_words"))))
      .toMap
    docs.foreach { case (id, text) =>
      val sents = text.split("[.!?]+", -1).map(_.trim).filter(_.nonEmpty)
      val maxW = if (sents.isEmpty) 0L
                 else sents.map(_.split(" +").length.toLong).max
      assert(got(id) == ((sents.length.toLong, maxW)),
        s"doc $id sentence stats mismatch")
    }
  }

  test("g_eigencentrality: power-iteration replay agrees frame-for-frame") {
    val labelCode = Map("region" -> 0L, "nation" -> 1L, "customer" -> 2L,
      "supplier" -> 3L, "part" -> 4L, "order" -> 5L)
    def nid(l: String, k: Long) = labelCode(l) * 10000000000000L + k
    val g = graft.model.PropertyGraph.load(spark, sf)
    // numericGraph contract: one und row per edges-table row per
    // direction — parallel rows (if any) each contribute to the sum,
    // so the replay keeps duplicates (multiset, not set)
    val und = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    g.edges.collect().foreach { r =>
      val a = nid(r.getAs[String]("src_label"), r.getAs[Long]("src_key"))
      val b = nid(r.getAs[String]("dst_label"), r.getAs[Long]("dst_key"))
      und += ((a, b)); und += ((b, a))
    }
    val ids = g.nodes.collect().map(r =>
      (r.getAs[String]("label"), r.getAs[Long]("key")))
    var x = ids.map(i => nid(i._1, i._2) -> 1000000L).toMap
    for (_ <- 1 to graft.operators.Analytics.eigenIters) {
      val s = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
      und.foreach { case (a, b) => if (x.contains(a)) s(b) += x(a) }
      val mx = if (s.isEmpty) 1L else s.values.max
      val divisor = math.max(1L, mx / 1000000L)
      x = s.map { case (id, v) => id -> v / divisor }.toMap
    }
    val want = ids.map { case (l, k) =>
      (l, k) -> x.getOrElse(nid(l, k), 0L) }.toMap
    val got = graft.operators.Analytics.eigencentrality(spark, sf).collect()
      .map(r => (r.getAs[String]("label"), r.getAs[Long]("key")) ->
        r.getAs[Long]("x")).toMap
    assert(got == want, "eigencentrality mismatch vs replay")
  }

  test("g_eigencentrality: GraphX Pregel twin produces identical integers") {
    val df = graft.operators.Analytics.eigencentrality(spark, sf).collect()
      .map(r => (r.getAs[String]("label"), r.getAs[Long]("key")) ->
        r.getAs[Long]("x")).toMap
    val gx = graft.operators.GraphXAnalytics.eigencentralityGraphX(spark, sf)
      .collect()
      .map(r => (r.getAs[String]("label"), r.getAs[Long]("key")) ->
        r.getAs[Long]("x")).toMap
    assert(gx == df, "GraphX eigencentrality != DataFrame operator")
  }

  test("m_audio_vad: handcrafted payloads segment correctly") {
    import spark.implicits._
    // 64 high-energy chars ('z' → d=90, e=64·8100 ≫ thresh·64), then 64
    // spaces (e=0), then 128 high — speech/silence/speech = 2 segments
    val loud = "z" * 64; val quiet = " " * 64
    val media = Seq(
      graft.operators.Multimodal.MediaRow(1L, "wav",
        (loud + quiet + loud + loud).getBytes("UTF-8")),
      graft.operators.Multimodal.MediaRow(2L, "wav",
        quiet.getBytes("UTF-8")),
      graft.operators.Multimodal.MediaRow(3L, "wav", Array.empty[Byte]))
      .toDS()
    val out = graft.operators.Multimodal.audioVad(media).collect()
      .map(v => v.doc_id -> v).toMap
    assert(out(1L).n_frames == 4 && out(1L).n_speech == 3 &&
      out(1L).n_segments == 2 && out(1L).max_segment == 2)
    assert(out(2L).n_frames == 1 && out(2L).n_speech == 0 &&
      out(2L).n_segments == 0 && out(2L).max_segment == 0)
    assert(out(3L).n_frames == 0 && out(3L).n_speech == 0)
  }

  test("s_ann_rerank: reranked rows are exact-scored and recall-flagged consistently") {
    val rer = graft.operators.Similarity.annRerank(spark, sf).collect()
    val exact = graft.operators.Similarity.annTopk(spark, sf).collect()
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("cand_id")) ->
        r.getAs[Long]("score")).toMap
    assert(rer.nonEmpty)
    rer.groupBy(_.getAs[Long]("probe_id")).foreach { case (p, rows) =>
      val byRn = rows.sortBy(_.getAs[Int]("rn"))
      // scores non-increasing down the ranking
      val scores = byRn.map(_.getAs[Long]("score"))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
        s"probe $p scores not sorted")
      byRn.foreach { r =>
        val key = (p, r.getAs[Long]("cand_id"))
        val flagged = r.getAs[Long]("in_exact") == 1L
        assert(flagged == exact.contains(key),
          s"probe $p in_exact flag wrong for $key")
        // a reranked candidate that IS in the exact top-k must carry
        // the exact pipeline's score — same integer expression
        if (flagged) assert(r.getAs[Long]("score") == exact(key),
          s"probe $p score differs from exact pipeline for $key")
      }
    }
  }

  test("q_markov_transitions: pair counts + ppm equal the sequence replay") {
    val ev = graft.model.Tables(spark, sf, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val pairs = scala.collection.mutable.Map[(String, String), Long]()
      .withDefaultValue(0L)
    ev.groupBy(_._1).foreach { case (_, es) =>
      val seq = es.sortBy(e => (e._2, e._3)).map(_._4)
      seq.zip(seq.tail).foreach(p => pairs(p) += 1)
    }
    val marg = pairs.toSeq.groupBy(_._1._1)
      .map { case (k, v) => k -> v.map(_._2).sum }
    val want = pairs.map { case ((a, b), n) =>
      (a, b) -> ((n, n * 1000000L / marg(a))) }.toMap
    val got = graft.operators.Relational.qMarkovTransitions(spark, sf)
      .collect().map(r => (r.getAs[String]("prev_type"),
        r.getAs[String]("next_type")) ->
        ((r.getAs[Long]("n"), r.getAs[Long]("prob_ppm")))).toMap
    assert(got == want, "transition matrix mismatch vs replay")
  }

  test("q_changepoint: CUSUM series and peak equal the replay") {
    val ev = graft.model.Tables(spark, sf, "events")
      .select(col("ts")).collect().map(_.getLong(0) / 86400000000000L)
    val days = ev.groupBy(identity).map { case (d, v) => d -> v.length.toLong }
      .toSeq.sortBy(_._1)
    val t = days.map(_._2).sum; val d = days.length.toLong
    var acc = 0L
    val cusum = days.map { case (day, c) => acc += d * c - t; (day, c, acc) }
    val mx = cusum.map(x => math.abs(x._3)).max
    val peak = cusum.filter(x => math.abs(x._3) == mx).map(_._1).min
    val got = graft.operators.Relational.qChangepoint(spark, sf).collect()
      .map(r => (r.getAs[Long]("day"), r.getAs[Long]("n_events"),
        r.getAs[Long]("cusum"), r.getAs[Long]("is_peak")))
    assert(got.toSeq == cusum.map { case (day, c, s) =>
      (day, c, s, if (day == peak) 1L else 0L) },
      "CUSUM table mismatch vs replay")
  }

  test("t_code_detect: symbol/digit ppm equal the regex replay") {
    val docs = graft.model.Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val sym = java.util.regex.Pattern.compile("[{}()<>;=\\[\\]]")
    val dig = java.util.regex.Pattern.compile("[0-9]")
    def count(p: java.util.regex.Pattern, s: String): Long = {
      val m = p.matcher(s); var n = 0L; while (m.find()) n += 1; n
    }
    val got = graft.operators.TextOps.codeDetect(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_sym"), r.getAs[Long]("sym_ppm"),
          r.getAs[Long]("digit_ppm")))).toMap
    docs.foreach { case (id, text) =>
      val nc = math.max(text.length.toLong, 1L)
      val ns = count(sym, text); val nd = count(dig, text)
      assert(got(id) == ((ns, ns * 1000000L / nc, nd * 1000000L / nc)),
        s"doc $id code-detect mismatch")
    }
  }

  test("q_benford: digit histogram equals the integer-extraction replay") {
    val prices = graft.model.Tables(spark, sf, "orders")
      .select(col("o_totalprice")).collect().map(_.getDouble(0))
    val digits = prices.map { p =>
      val c = BigDecimal(p).setScale(2, BigDecimal.RoundingMode.HALF_UP)
        .*(100).toLongExact
      c.toString.head.asDigit.toLong
    }
    val obs = digits.groupBy(identity).map { case (d, v) => d -> v.length.toLong }
    val tot = digits.length.toLong
    val got = graft.operators.Relational.qBenford(spark, sf).collect()
      .map(r => r.getAs[Long]("digit") ->
        ((r.getAs[Long]("n_obs"), r.getAs[Long]("obs_ppm"),
          r.getAs[Long]("exp_ppm") + r.getAs[Long]("dev_ppm")))).toMap
    obs.foreach { case (d, n) =>
      assert(got(d)._1 == n, s"digit $d count mismatch")
      assert(got(d)._2 == n * 1000000L / tot, s"digit $d ppm mismatch")
      assert(got(d)._3 == got(d)._2, "dev_ppm is not obs - exp")
    }
    // Benford exp_ppm column must be the log10(1+1/d) table
    val row1 = graft.operators.Relational.qBenford(spark, sf).collect()
      .map(r => r.getAs[Long]("digit") -> r.getAs[Long]("exp_ppm")).toMap
    (1 to 9).foreach { d =>
      assert(row1(d.toLong) ==
        math.round(math.log10(1.0 + 1.0 / d) * 1000000.0))
    }
  }

  test("g_salsa: degree-normalized walk replay agrees frame-for-frame") {
    val labelCode = Map("region" -> 0L, "nation" -> 1L, "customer" -> 2L,
      "supplier" -> 3L, "part" -> 4L, "order" -> 5L)
    def nid(l: String, k: Long) = labelCode(l) * 10000000000000L + k
    val g = graft.model.PropertyGraph.load(spark, sf)
    val e = g.edges.collect().map { r =>
      (nid(r.getAs[String]("src_label"), r.getAs[Long]("src_key")),
        nid(r.getAs[String]("dst_label"), r.getAs[Long]("dst_key")))
    }
    val outd = e.groupBy(_._1).map { case (k, v) => k -> v.length.toLong }
    val ind = e.groupBy(_._2).map { case (k, v) => k -> v.length.toLong }
    val ids = g.nodes.collect().map(r =>
      (r.getAs[String]("label"), r.getAs[Long]("key")))
    var h = ids.map(i => nid(i._1, i._2) -> 1000000L).toMap
    var a = Map.empty[Long, Long]
    for (_ <- 1 to graft.operators.Analytics.salsaIters) {
      val aAcc = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
      e.foreach { case (u, v) =>
        if (h.contains(u)) aAcc(v) += h(u) / outd(u) }
      a = aAcc.toMap
      val hAcc = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
      e.foreach { case (u, v) =>
        if (a.contains(v)) hAcc(u) += a(v) / ind(v) }
      h = hAcc.toMap
    }
    val want = ids.map { case (l, k) =>
      (l, k) -> ((a.getOrElse(nid(l, k), 0L), h.getOrElse(nid(l, k), 0L)))
    }.toMap
    val got = graft.operators.Analytics.salsa(spark, sf).collect()
      .map(r => (r.getAs[String]("label"), r.getAs[Long]("key")) ->
        ((r.getAs[Long]("a"), r.getAs[Long]("h")))).toMap
    assert(got == want, "salsa mismatch vs replay")
  }

  test("s_ndcg_eval: DCG replay from the two source rankings agrees") {
    val disc = (1 to 5).map(i =>
      math.round(1000000.0 / (math.log(i + 1) / math.log(2))))
    val idcg = (1 to 5).map(i => (6 - i).toLong * disc(i - 1)).sum
    val ex = graft.operators.Similarity.annTopk(spark, sf).collect()
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("cand_id")) ->
        r.getAs[Int]("rn")).toMap
    val sys = graft.operators.Similarity.binaryQuant(spark, sf).collect()
      .filter(_.getAs[Int]("rn") <= 5)
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Int]("rn"),
        r.getAs[Long]("cand_id")))
    val want = sys.groupBy(_._1).map { case (p, rows) =>
      p -> rows.map { case (_, rn, cand) =>
        val rel = ex.get((p, cand)).map(6L - _).getOrElse(0L)
        rel * disc(rn - 1)
      }.sum
    }
    val got = graft.operators.Similarity.ndcgEval(spark, sf).collect()
      .map(r => r.getAs[Long]("probe_id") ->
        ((r.getAs[Long]("dcg_micro"), r.getAs[Long]("idcg_micro"),
          r.getAs[Long]("ndcg_ppm")))).toMap
    want.foreach { case (p, dcg) =>
      assert(got(p)._1 == dcg, s"probe $p DCG mismatch")
      assert(got(p)._2 == idcg)
      assert(got(p)._3 == dcg * 1000000L / idcg)
      assert(got(p)._3 <= 1000000L, "NDCG cannot exceed 1")
    }
  }

  test("s_pca_power: matvec replay agrees; direction aligns with the true top eigenvector") {
    val vecs = graft.model.Tables(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(_.getAs[Seq[Float]]("embedding").toArray)
    val q = vecs.map(_.map(x => math.floor(x.toDouble * 1000 + 0.5).toLong))
    val d = 64
    val gram = Array.ofDim[BigInt](d, d)
    for (i <- 0 until d; j <- 0 until d)
      gram(i)(j) = q.map(v => BigInt(v(i)) * v(j)).sum
    var v = Array.fill(d)(1000000L)
    for (_ <- 1 to graft.operators.Similarity.pcaIters) {
      val sm = (0 until d).map(i =>
        (0 until d).map(j => gram(i)(j) * v(j)).sum)
      val mx = sm.map(_.abs).max.toLong
      val divisor = math.max(1L, mx / 1000000L)
      v = sm.map { s => // truncation toward zero, the op's contract
        val t = s.abs.toLong / divisor; if (s < 0) -t else t
      }.toArray
    }
    val got = graft.operators.Similarity.pcaPower(spark, sf).collect()
      .sortBy(_.getAs[Long]("component")).map(_.getAs[Long]("v"))
    assert(got.toSeq == v.toSeq, "pca power mismatch vs exact replay")
    // power-iteration guarantee on a PSD matrix: the Rayleigh quotient
    // is non-decreasing per round (the MEASURED convergence claim —
    // full eigenvector alignment is out of reach here by design: these
    // near-isotropic synthetic embeddings have a ~1.7% eigengap, the
    // documented O(1/gap)-rounds regime)
    def rayleigh(x: Array[Long]): Double = {
      val xd = x.map(_.toDouble)
      val gx = (0 until d).map(i =>
        (0 until d).map(j => gram(i)(j).toDouble * xd(j)).sum)
      xd.zip(gx).map { case (a, b) => a * b }.sum /
        xd.map(a => a * a).sum
    }
    var cur = Array.fill(d)(1000000L)
    var prevRq = rayleigh(cur)
    for (_ <- 1 to graft.operators.Similarity.pcaIters) {
      val sm = (0 until d).map(i =>
        (0 until d).map(j => gram(i)(j) * cur(j)).sum)
      val mx = sm.map(_.abs).max.toLong
      val divisor = math.max(1L, mx / 1000000L)
      cur = sm.map { s =>
        val t = s.abs.toLong / divisor; if (s < 0) -t else t
      }.toArray
      val rq = rayleigh(cur)
      assert(rq >= prevRq, s"Rayleigh quotient decreased: $prevRq -> $rq")
      prevRq = rq
    }
    // and after the op's 3 rounds the quotient must already capture
    // most of the top eigenvalue's mass (measured 0.79 at sf0.001/0.01)
    val topEig = {
      var w = Array.fill(d)(1.0)
      for (_ <- 1 to 300) {
        val nw = (0 until d).map(i =>
          (0 until d).map(j => gram(i)(j).toDouble * w(j)).sum).toArray
        val n = math.sqrt(nw.map(x => x * x).sum)
        w = nw.map(_ / n)
      }
      (0 until d).map(i =>
        (0 until d).map(j => gram(i)(j).toDouble * w(j)).sum * w(i)).sum
    }
    assert(rayleigh(got) >= 0.7 * topEig,
      s"3-round Rayleigh ${rayleigh(got)} below 70% of top eigenvalue $topEig")
  }

  test("st_cdc_apply: materialized state == batch MERGE under ordered AND shuffled splits") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val saved = spark.conf.get("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val events = graft.model.Tables(spark, sf, "events")
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"))
        .as[graft.streaming.Streams.Event].collect().toSeq
      val want = graft.streaming.Streams.cdcApplyBatch(events.toDF())
        .collect().map(r => r.getAs[Long]("user_id") ->
          ((r.getAs[Long]("seq"), r.getAs[Long]("cents"),
            r.getAs[Boolean]("is_deleted")))).toMap
      def run(name: String,
          batches: Seq[Seq[graft.streaming.Streams.Event]]): Map[Long, (Long, Long, Boolean)] = {
        val mem = MemoryStream[graft.streaming.Streams.Event]
        val q = graft.streaming.Streams.cdcApply(mem.toDS())
          .toDF().writeStream.format("memory").queryName(name)
          .outputMode("update").start()
        try {
          batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
          spark.table(name).collect().zipWithIndex
            .groupBy(_._1.getAs[Long]("user_id"))
            .map { case (u, rs) =>
              val last = rs.maxBy(_._2)._1
              u -> ((last.getAs[Long]("seq"), last.getAs[Long]("cents"),
                last.getAs[Boolean]("is_deleted")))
            }
        } finally q.stop()
      }
      val oneShot = run("cdc_one", Seq(events))
      // adversarial arrival order: md5-shuffled, so changes for a key
      // arrive OUT of sequence across batches — LWW must still win
      val shuffled = events.sortBy(e => md5hex(e.event_id.toString))
      val split = run("cdc_shuf",
        shuffled.grouped(math.max(1, shuffled.size / 5)).toSeq)
      assert(oneShot == want, "one-shot stream != batch MERGE twin")
      assert(split == want,
        "shuffled split != batch MERGE twin (LWW not order-invariant?)")
    } finally spark.conf.set(
      "spark.sql.streaming.stateStore.providerClass", saved)
  }

  test("src_rowgroup_stats: footer stats equal the sorted-slice replay") {
    val keys = graft.model.Tables(spark, sf, "lineitem")
      .select(col("l_orderkey")).collect().map(_.getLong(0)).sorted
    val want = keys.grouped(10000).zipWithIndex.map { case (g, i) =>
      (i.toLong, g.length.toLong, g.min, g.max) }.toSeq
    val got = graft.sources.Formats.rowgroupStats(spark, sf).collect()
      .map(r => (r.getAs[Long]("grp"), r.getAs[Long]("num_rows"),
        r.getAs[Long]("okey_min"), r.getAs[Long]("okey_max"))).toSeq
    assert(got == want, "row-group footer stats != sorted-slice replay")
  }

  test("q_path_analysis: trigram counts equal the sequence replay") {
    val ev = graft.model.Tables(spark, sf, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val tri = scala.collection.mutable.Map[(String, String, String), Long]()
      .withDefaultValue(0L)
    ev.groupBy(_._1).foreach { case (_, es) =>
      val seq = es.sortBy(e => (e._2, e._3)).map(_._4)
      seq.sliding(3).filter(_.size == 3)
        .foreach(t => tri((t(0), t(1), t(2))) += 1)
    }
    val want = tri.toSeq
      .sortBy { case ((a, b, c), n) => (-n, a, b, c) }.take(20).toSet
    val got = graft.operators.Relational.qPathAnalysis(spark, sf).collect()
      .map(r => ((r.getAs[String]("e1"), r.getAs[String]("e2"),
        r.getAs[String]("e3")), r.getAs[Long]("n"))).toSet
    assert(got == want, "top trigram paths mismatch vs replay")
  }

  test("m_video_dedup: every planted glitched re-upload with enough frames is found") {
    val docs = graft.model.Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def sigs(text: String): Set[String] =
      text.grouped(64).map(f => md5hex(f)).toSet
    val got = graft.operators.Multimodal.videoDedup(spark, sf).collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b")) ->
        r.getAs[Long]("jaccard_ppm")).toMap
    docs.filter(d => d._1 % 50 == 0 && d._1 != 0L).foreach { case (id, text) =>
      val glitched = text.substring(0, math.min(128, text.length)) + "ZZZ" +
        (if (text.length >= 131) text.substring(131) else "")
      val a = sigs(text); val b = sigs(glitched)
      val j = a.intersect(b).size.toLong * 1000000L /
        math.max(a.union(b).size.toLong, 1L)
      if (j >= 500000L)
        assert(got.contains((-id, id)) &&
          got((-id, id)) == j,
          s"planted pair for doc $id (jaccard $j) missing or wrong")
    }
    got.foreach { case (_, j) => assert(j >= 500000L && j <= 1000000L) }
  }

  test("q_k_anonymity: class-size bands equal the contingency replay") {
    val nat = graft.model.Tables(spark, sf, "customer")
      .select(col("c_custkey"), col("c_nationkey")).collect()
      .map(r => (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue))
      .toMap
    val classes = graft.model.Tables(spark, sf, "orders")
      .select(col("o_custkey"), year(col("o_orderdate")).as("yr"),
        col("o_orderpriority")).collect()
      .map(r => (nat(r.getAs[Number](0).longValue),
        r.getAs[Number](1).intValue, r.getString(2)))
      .groupBy(identity).map(_._2.length.toLong)
    def band(c: Long) = if (c >= 5) "k_or_more" else s"size_$c"
    val want = classes.groupBy(band).map { case (b, cs) =>
      b -> ((cs.size.toLong, cs.sum,
        cs.count(_ < 5).toLong, cs.filter(_ < 5).sum))
    }
    val got = graft.operators.Relational.qKAnonymity(spark, sf).collect()
      .map(r => r.getAs[String]("band") ->
        ((r.getAs[Long]("n_classes"), r.getAs[Long]("n_rows"),
          r.getAs[Long]("n_risky_classes"),
          r.getAs[Long]("rows_to_suppress")))).toMap
    assert(got == want, "k-anonymity bands mismatch vs replay")
  }

  test("q_disorder_profile: lateness replay agrees (and reports the in-order truth)") {
    val ev = graft.model.Tables(spark, sf, "events")
      .select(col("user_id"), col("event_id"), col("ts")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2) / 1000))
    val perUser = ev.groupBy(_._1).map { case (u, es) =>
      val ordered = es.sortBy(_._2)
      var runMax = Long.MinValue; var maxLate = 0L; var nLate = 0L
      ordered.foreach { case (_, _, tus) =>
        runMax = math.max(runMax, tus)
        val late = runMax - tus
        maxLate = math.max(maxLate, late); if (late > 0) nLate += 1
      }
      u -> ((maxLate, nLate))
    }
    def band(m: Long) = if (m == 0) "0_in_order"
      else if (m <= 60000000L) "1_under_1min"
      else if (m <= 3600000000L) "2_under_1h" else "3_over_1h"
    val want = perUser.values.groupBy(v => band(v._1))
      .map { case (b, vs) => b -> ((vs.size.toLong, vs.map(_._2).sum)) }
    val got = graft.operators.Relational.qDisorderProfile(spark, sf).collect()
      .map(r => r.getAs[String]("band") ->
        ((r.getAs[Long]("n_users"), r.getAs[Long]("n_late_events")))).toMap
    assert(got == want, "disorder profile mismatch vs replay")
  }

  test("src_delete_vectors: merged read equals the logical delete replay") {
    val li = graft.model.Tables(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"), col("l_returnflag"))
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
    val want = li.filter(_._1 % 13 != 0).groupBy(_._3).map { case (f, rows) =>
      f -> ((rows.length.toLong,
        rows.map(r => BigDecimal(r._2)
          .setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble))
    }
    val got = graft.sources.Formats.deleteVectors(spark, sf).collect()
      .map(r => r.getAs[String]("l_returnflag") ->
        ((r.getAs[Long]("n_rows"), r.getAs[Double]("sum_qty")))).toMap
    assert(got == want, "merged read != logical delete")
  }

  test("d_norm_dedup_gain: distinct deltas equal the canonicalization replay") {
    val docs = graft.model.Tables(spark, sf, "documents")
      .select(col("text")).collect().map(_.getString(0))
    def canon(t: String) = t.toLowerCase
      .replaceAll("[^a-z0-9 ]", "").replaceAll(" +", " ").trim
    val row = graft.operators.Dedup.normDedupGain(spark, sf).collect().head
    assert(row.getAs[Long]("n_docs") == docs.length.toLong)
    assert(row.getAs[Long]("distinct_raw") == docs.distinct.length.toLong)
    assert(row.getAs[Long]("distinct_norm") ==
      docs.map(canon).distinct.length.toLong)
    assert(row.getAs[Long]("dups_unlocked") ==
      row.getAs[Long]("distinct_raw") - row.getAs[Long]("distinct_norm"))
  }

  test("s_ivf_probe_curve: recall is monotone in nprobe and exact at nprobe = K") {
    val rows = graft.operators.Similarity.ivfProbeCurve(spark, sf).collect()
      .sortBy(_.getAs[Long]("nprobe"))
      .map(r => (r.getAs[Long]("nprobe"), r.getAs[Long]("recall_ppm")))
    // growing the probe budget can only grow the candidate set
    rows.zip(rows.tail).foreach { case ((np1, r1), (np2, r2)) =>
      assert(r1 <= r2, s"recall fell $r1 -> $r2 going nprobe $np1 -> $np2")
    }
    // nprobe = ivfK probes EVERY cell — the candidate set is the whole
    // corpus, so the "approximate" search IS brute force: recall must
    // be exactly 1.0, not approximately
    assert(rows.last._1 == 8L && rows.last._2 == 1000000L,
      s"full-probe recall must be exact: ${rows.last}")
  }

  test("st_bloom_dedup: emissions replay the sequential fold; no false negatives") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val saved = spark.conf.get("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val events = graft.model.Tables(spark, sf, "events")
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"))
        .as[graft.streaming.Streams.Event].collect().toSeq
        .sortBy(_.event_id)
      // in-memory gold standard: per-shard bloom, check-then-insert in
      // event-id order
      val blooms = Array.fill(graft.streaming.Streams.bloomShards)(
        Array.fill(graft.streaming.Streams.bloomBitsM / 64)(0L))
      val want = events.map { e =>
        val (shard, pos) = graft.streaming.Streams.bloomPositions(e.user_id)
        val b = blooms(shard)
        val seen = pos.forall(p => (b(p / 64) >>> (p % 64) & 1L) == 1L)
        pos.foreach(p => b(p / 64) |= (1L << (p % 64)))
        e.event_id -> seen
      }.toMap
      def run(name: String,
          batches: Seq[Seq[graft.streaming.Streams.Event]]): Map[Long, Boolean] = {
        val mem = MemoryStream[graft.streaming.Streams.Event]
        val q = graft.streaming.Streams.bloomDedup(mem.toDS())
          .toDF().writeStream.format("memory").queryName(name)
          .outputMode("update").start()
        try {
          batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
          spark.table(name).collect()
            .map(r => r.getAs[Long]("event_id") ->
              r.getAs[Boolean]("maybe_seen")).toMap
        } finally q.stop()
      }
      val oneShot = run("bd_one", Seq(events))
      val split = run("bd_split",
        events.grouped(math.max(1, events.size / 6)).toSeq)
      assert(oneShot == want, "one-shot stream != sequential replay")
      assert(split == want, "ordered split != sequential replay")
      // NO FALSE NEGATIVES: any user's non-first event must be flagged
      val firstEvent = events.groupBy(_.user_id)
        .map { case (_, es) => es.map(_.event_id).min }.toSet
      val fn = events.filterNot(e => firstEvent(e.event_id))
        .count(e => !want(e.event_id))
      assert(fn == 0, s"$fn false negatives — impossible for a Bloom filter")
      // false positives exist only at the documented Bloom rate
      val firsts = events.filter(e => firstEvent(e.event_id))
      val fp = firsts.count(e => want(e.event_id))
      assert(fp.toDouble / math.max(firsts.size, 1) < 0.25,
        s"FP rate $fp/${firsts.size} implausibly high for k=3, m=1024")
    } finally spark.conf.set(
      "spark.sql.streaming.stateStore.providerClass", saved)
  }

  test("g_pr_convergence: delta shrinks monotonically and iter-5 mass equals g_pagerank") {
    val rows = graft.operators.Analytics.prConvergence(spark, sf).collect()
      .sortBy(_.getAs[Long]("iter"))
      .map(r => (r.getAs[Long]("iter"), r.getAs[Long]("delta_mass"),
        r.getAs[Long]("total_mass")))
    rows.zip(rows.tail).foreach { case ((i1, d1, _), (i2, d2, _)) =>
      assert(d2 <= d1, s"delta mass grew $d1 -> $d2 at iter $i1 -> $i2")
    }
    // the curve's final round IS g_pagerank's published vector
    val prMass = graft.operators.Analytics.pagerank(spark, sf).collect()
      .map(_.getAs[Long]("r")).sum
    assert(rows.last._3 == prMass,
      s"iter-${rows.last._1} mass ${rows.last._3} != g_pagerank Σr $prMass")
  }

  test("q_window_pct: percentiles equal the per-segment rank replay") {
    val os = graft.model.Tables(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        BigDecimal(r.getDouble(2)).setScale(2, BigDecimal.RoundingMode.HALF_UP)))
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = os.groupBy(_._2).toSeq.flatMap { case (st, rows) =>
      val ranked = rows.sortBy(r => (r._3, r._1)).zipWithIndex
      val n = ranked.length
      ranked.map { case ((k, _, _), i) =>
        (st, k) -> ((r6(i.toDouble / (n - 1)), r6((i + 1).toDouble / n)))
      }.toSeq
    }.toMap
    val got = graft.operators.Relational.qWindowPct(spark, sf).collect()
      .map(r => (r.getAs[String]("o_orderstatus"), r.getAs[Long]("o_orderkey")) ->
        ((r.getAs[Double]("pct_rank"), r.getAs[Double]("cume_dist_ub"))))
    assert(got.nonEmpty)
    got.foreach { case (key, v) =>
      assert(want(key) == v, s"window pct mismatch for $key")
    }
  }

  test("st_rate_limit: admissions replay the token-bucket fold under any ordered split") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val saved = spark.conf.get("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val events = graft.model.Tables(spark, sf, "events")
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"))
        .as[graft.streaming.Streams.Event].collect().toSeq
        .sortBy(_.event_id)
      // sequential token-bucket fold, integer micro-tokens
      val st = scala.collection.mutable.Map[Long, (Long, Long)]()
      val want = events.map { e =>
        val (tok, last) = st.getOrElse(e.user_id,
          (3000000L, Long.MinValue))
        val tsUs = e.ts / 1000
        val refill = if (last == Long.MinValue) 0L
                     else math.max(0L, tsUs - last) / 86400L
        val avail = math.min(3000000L, tok + refill)
        val admit = avail >= 1000000L
        st(e.user_id) = (if (admit) avail - 1000000L else avail, tsUs)
        e.event_id -> admit
      }.toMap
      // sanity: the limiter actually bites on this data (both classes)
      assert(want.values.exists(identity) && want.values.exists(!_),
        "rate limiter never rejected (or never admitted) — vacuous data")
      def run(name: String,
          batches: Seq[Seq[graft.streaming.Streams.Event]]): Map[Long, Boolean] = {
        val mem = MemoryStream[graft.streaming.Streams.Event]
        val q = graft.streaming.Streams.rateLimit(mem.toDS())
          .toDF().writeStream.format("memory").queryName(name)
          .outputMode("update").start()
        try {
          batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
          spark.table(name).collect()
            .map(r => r.getAs[Long]("event_id") ->
              r.getAs[Boolean]("admitted")).toMap
        } finally q.stop()
      }
      assert(run("rl_one", Seq(events)) == want,
        "one-shot stream != token-bucket replay")
      assert(run("rl_split",
        events.grouped(math.max(1, events.size / 6)).toSeq) == want,
        "ordered split != token-bucket replay")
    } finally spark.conf.set(
      "spark.sql.streaming.stateStore.providerClass", saved)
  }

  test("st_hll: streaming registers == batch twin under any split") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val saved = spark.conf.get("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val events = graft.model.Tables(spark, sf, "events")
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"))
        .as[graft.streaming.Streams.Event].collect().toSeq
      val want = graft.streaming.Streams
        .hllSketchBatch(events.toDF()).collect()
        .map(r => r.getAs[String]("event_type") ->
          ((r.getAs[Long]("s_pow"), r.getAs[Long]("v_empty")))).toMap
      def run(name: String,
          batches: Seq[Seq[graft.streaming.Streams.Event]]): Map[String, (Long, Long)] = {
        val mem = MemoryStream[graft.streaming.Streams.Event]
        val q = graft.streaming.Streams.hllStream(mem.toDS())
          .toDF().writeStream.format("memory").queryName(name)
          .outputMode("update").start()
        try {
          batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
          spark.table(name).collect().zipWithIndex
            .groupBy(_._1.getAs[String]("event_type"))
            .map { case (k, rs) =>
              val last = rs.maxBy(_._2)._1
              k -> ((last.getAs[Long]("s_pow"), last.getAs[Long]("v_empty")))
            }
        } finally q.stop()
      }
      val oneShot = run("hll_one", Seq(events))
      val split = run("hll_split",
        events.grouped(math.max(1, events.size / 7)).toSeq)
      assert(oneShot == want, "one-shot stream != batch twin")
      assert(split == want, "split stream != batch twin (merge not split-invariant?)")
    } finally spark.conf.set(
      "spark.sql.streaming.stateStore.providerClass", saved)
  }
}
