package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-12 second-wave operators: the streaming KMV sketch gets the
  * st_cms treatment (one-shot == split == batch twin == first-principles
  * gold), and the new batch ops get their algebraic invariants checked
  * against brute force (growth-accounting's WAU identity, burstiness'
  * closed form vs a dense zero-padded recompute).
  */
class Round12bSpec extends AnyFunSuite {
  import TestSession._

  // ------------------------------------------------------------- st_kmv
  test("st_kmv: streamed bottom-k buffer is split-invariant and its last " +
      "emission equals the batch twin and first-principles gold") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val Streams = graft.streaming.Streams
    val saved = spark.conf.get("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val events = graft.model.Tables(spark, sf, "events")
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"))
        .as[Streams.Event].collect().toSeq
      // first-principles gold: bottom-k of the distinct 40-bit hashes
      val md = java.security.MessageDigest.getInstance("MD5")
      def h40(u: Long): Long = {
        md.reset()
        val hex = md.digest(u.toString.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        java.lang.Long.parseLong(hex.substring(0, 10), 16)
      }
      val gold = events.groupBy(_.event_type).map { case (k, es) =>
        k -> Streams.kmvEstimate(k,
          es.map(e => h40(e.user_id)).distinct.sorted
            .take(Streams.kmvStreamK))
      }
      def run(name: String,
          batches: Seq[Seq[Streams.Event]]): Map[String, Streams.KmvOut] = {
        val mem = MemoryStream[Streams.Event]
        val q = Streams.kmvStream(mem.toDS())
          .toDF().writeStream.format("memory").queryName(name)
          .outputMode("update").start()
        try {
          batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
          spark.table(name).collect().zipWithIndex
            .groupBy(_._1.getAs[String]("event_type"))
            .map { case (k, rs) =>
              val last = rs.maxBy(_._2)._1
              k -> Streams.KmvOut(k, last.getAs[Long]("k_used"),
                last.getAs[Long]("hk"), last.getAs[Long]("est_distinct")) }
        } finally q.stop()
      }
      val oneShot = run("kmv_one", Seq(events))
      val split = run("kmv_split",
        events.grouped(math.max(1, events.size / 7)).toSeq)
      assert(oneShot == gold, "one-shot != first-principles bottom-k")
      assert(split == gold,
        "split != gold (bottom-k merge is not split-invariant?)")
      // batch twin parity — the same (k_used, hk, est) per key
      val twin = Streams.kmvSketchBatch(
        graft.model.Tables(spark, sf, "events")).collect()
        .map(r => r.getAs[String]("event_type") -> Streams.KmvOut(
          r.getAs[String]("event_type"), r.getAs[Long]("k_used"),
          r.getAs[Long]("hk"), r.getAs[Long]("est_distinct"))).toMap
      assert(twin == gold, "batch twin != gold")
      // on a saturated sketch the estimate should be within ~2/sqrt(k)
      // of the true distinct count (sanity, generous band)
      gold.foreach { case (k, out) =>
        val exact = events.filter(_.event_type == k).map(_.user_id)
          .distinct.size.toLong
        if (out.k_used == Streams.kmvStreamK)
          assert(math.abs(out.est_distinct - exact).toDouble / exact < 0.4,
            s"$k: est ${out.est_distinct} vs exact $exact out of band")
        else assert(out.est_distinct == exact,
          s"$k: unsaturated sketch must be exact")
      }
    } finally spark.conf.set(
      "spark.sql.streaming.stateStore.providerClass", saved)
  }

  // ------------------------------------------------------ st_attribution
  test("st_attribution: every watermark-decidable purchase is credited " +
      "exactly once and exactly as the batch computation; split-invariant") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val Streams = graft.streaming.Streams
    val events = graft.model.Tables(spark, sf, "events")
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
      .as[Streams.Event].collect().toSeq
    val winUs = 3600000000L
    val wmUs = events.map(_.ts / 1000).max - 3600000000L
    // gold: batch credit for exactly the purchases with p_us <= wm
    val touches = events
      .filter(e => Set("click", "view", "signup")(e.event_type))
      .groupBy(_.user_id)
    val gold = events.filter(_.event_type == "purchase")
      .filter(_.ts / 1000 <= wmUs).map { p =>
        val pUs = p.ts / 1000
        val inWin = touches.getOrElse(p.user_id, Seq.empty)
          .map(t => (t.ts / 1000, t.event_id, t.event_type))
          .filter(t => t._1 < pUs && t._1 >= pUs - winUs)
        val first = if (inWin.isEmpty) "direct"
          else inWin.minBy(t => (t._1, t._2))._3
        val last = if (inWin.isEmpty) "direct"
          else inWin.maxBy(t => (t._1, t._2))._3
        (p.user_id, p.event_id, math.round(p.value * 100), first, last)
      }.toSet
    def run(name: String, batches: Seq[Seq[Streams.Event]]) = {
      val mem = MemoryStream[Streams.Event]
      val q = Streams.attributionStream(mem.toDS())
        .toDF().writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
        val rows = spark.table(name).collect()
          .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("p_id"),
            r.getAs[Long]("cents"), r.getAs[String]("first_touch"),
            r.getAs[String]("last_touch")))
        assert(rows.length == rows.distinct.length,
          s"$name: duplicate credit emission")
        rows.toSet
      } finally q.stop()
    }
    val sorted = events.sortBy(_.ts)
    assert(run("attr_one", Seq(sorted)) == gold, "one-shot != batch gold")
    assert(run("attr_split",
      sorted.grouped(math.max(1, sorted.size / 7)).toSeq) == gold,
      "split != gold (credit not split-invariant)")
  }

  // ----------------------------------------------------- st_pit_features
  test("st_pit_features: streamed feature vectors equal the driver-checked " +
      "batch rows for every watermark-decidable label (training/serving " +
      "parity), under any split") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val Streams = graft.streaming.Streams
    val events = graft.model.Tables(spark, sf, "events")
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
      .as[Streams.Event].collect().toSeq.sortBy(_.ts)
    val wmUs = events.map(_.ts / 1000).max - 3600000000L
    // the BATCH op is the gold — the exact frame the DuckDB oracle
    // checks — restricted to labels the stream can finalize
    val batch = graft.operators.Relational.qPitFeatures(spark, sf).collect()
      .map(r => (r.getAs[Long]("label_id"), r.getAs[Long]("user_id"),
        r.getAs[Long]("p_us"), r.getAs[Long]("label_cents"),
        r.getAs[Long]("n_click_7d"), r.getAs[Long]("n_view_7d"),
        r.getAs[Long]("n_signup_7d"), r.getAs[Long]("n_error_7d"),
        r.getAs[Long]("recency_us")))
      .filter(_._3 <= wmUs).toSet
    def run(name: String, batches: Seq[Seq[Streams.Event]]) = {
      val mem = MemoryStream[Streams.Event]
      val q = Streams.pitFeaturesStream(mem.toDS())
        .toDF().writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
        spark.table(name).collect()
          .map(r => (r.getAs[Long]("label_id"), r.getAs[Long]("user_id"),
            r.getAs[Long]("p_us"), r.getAs[Long]("label_cents"),
            r.getAs[Long]("n_click_7d"), r.getAs[Long]("n_view_7d"),
            r.getAs[Long]("n_signup_7d"), r.getAs[Long]("n_error_7d"),
            r.getAs[Long]("recency_us"))).toSet
      } finally q.stop()
    }
    assert(run("pit_one", Seq(events)) == batch,
      "one-shot stream != batch backfill (training/serving skew)")
    assert(run("pit_split",
      events.grouped(math.max(1, events.size / 7)).toSeq) == batch,
      "split stream != batch backfill")
  }

  // ---------------------------------------------- st_growth_accounting
  test("st_growth_accounting: streamed ledger == watermark-semantics gold " +
      "under any split; classes match batch semantics; churn never " +
      "precedes its evidence") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val Streams = graft.streaming.Streams
    val events = graft.model.Tables(spark, sf, "events")
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
      .as[Streams.Event].collect().toSeq.sortBy(_.ts)
    val weekUs = 7L * 86400000000L
    val wmUs = events.map(_.ts / 1000).max - 3600000000L
    // gold: per user, finalized weeks classify in order; churn-at-(w+1)
    // emits when a later week finalizes past the gap, or silence is
    // proven (all weeks finalized and wm >= start(last+2))
    val gold = events.groupBy(_.user_id).toSeq.flatMap { case (u, es) =>
      val weeks = es.map(_.ts / 1000 / weekUs).distinct.sorted
      val fin = weeks.filter(_ * weekUs <= wmUs)
      val out = scala.collection.mutable.ArrayBuffer[(Long, Long, String)]()
      var last = Long.MinValue
      fin.foreach { w =>
        if (last != Long.MinValue && w > last + 1)
          out += ((u, last + 1, "churned"))
        val cls = if (last == Long.MinValue) "new"
          else if (w == last + 1) "retained" else "resurrected"
        out += ((u, w, cls)); last = w
      }
      if (last != Long.MinValue && fin.size == weeks.size &&
          wmUs >= (last + 2) * weekUs)
        out += ((u, last + 1, "churned"))
      out
    }.toSet
    def run(name: String, batches: Seq[Seq[Streams.Event]]): Set[(Long, Long, String)] = {
      val mem = MemoryStream[Streams.Event]
      val q = Streams.growthAccountingStream(mem.toDS())
        .toDF().writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
        spark.table(name).collect()
          .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("week"),
            r.getAs[String]("cls"))).toSet
      } finally q.stop()
    }
    val oneShot = run("ga_one", Seq(events))
    val split = run("ga_split",
      events.grouped(math.max(1, events.size / 7)).toSeq)
    assert(oneShot == gold, "one-shot != watermark-semantics gold")
    assert(split == gold, "split != gold (emission not split-invariant)")
    // batch-semantics agreement: active-class rows (new/retained/
    // resurrected) never depend on the horizon, so on finalized weeks
    // they must equal the batch classification exactly; churn rows are
    // a prefix (evidence-gated subset) of batch churn
    val batchCls = events.groupBy(_.user_id).toSeq.flatMap { case (u, es) =>
      val weeks = es.map(_.ts / 1000 / weekUs).distinct.sorted
      weeks.zipWithIndex.map { case (w, i) =>
        (u, w, if (i == 0) "new"
          else if (weeks(i - 1) == w - 1) "retained" else "resurrected")
      }
    }.toSet
    val streamedActive = gold.filter(_._3 != "churned")
    assert(streamedActive.subsetOf(batchCls),
      "streamed active class contradicts batch classification")
    val batchChurn = events.groupBy(_.user_id).toSeq.flatMap { case (u, es) =>
      val ws = es.map(_.ts / 1000 / weekUs).distinct.toSet
      ws.filterNot(w => ws(w + 1)).map(w => (u, w + 1, "churned"))
    }.toSet
    assert(gold.filter(_._3 == "churned").subsetOf(batchChurn),
      "streamed churn row the batch twin would not emit")
  }

  // ------------------------------------------------- q_growth_accounting
  test("q_growth_accounting: classes partition the WAU and the ledger " +
      "identity WAU(w) = WAU(w-1) + new + resurrected - churned holds") {
    val Relational = graft.operators.Relational
    val rows = Relational.qGrowthAccounting(spark, sf).collect()
      .map(r => r.getAs[Long]("week") ->
        (r.getAs[Long]("n_new"), r.getAs[Long]("n_retained"),
         r.getAs[Long]("n_resurrected"), r.getAs[Long]("n_churned")))
      .toMap
    // brute force the active sets per week
    val ev = graft.model.Tables(spark, sf, "events")
      .selectExpr("user_id", "((ts div 1000) div 86400000000) div 7 AS week")
      .distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byWeek = ev.groupBy(_._2).map { case (w, xs) => w -> xs.map(_._1).toSet }
    val weeks = byWeek.keys.toSeq.sorted
    weeks.foreach { w =>
      val act = byWeek(w)
      val prev = byWeek.getOrElse(w - 1, Set.empty[Long])
      val before = byWeek.filter(_._1 < w).values.flatten.toSet
      val (nNew, nRet, nRes, _) = rows(w)
      assert(nNew == (act -- before).size, s"week $w new")
      assert(nRet == (act & prev).size, s"week $w retained")
      assert(nRes == ((act & before) -- prev).size, s"week $w resurrected")
      // the three classes partition the week's active set exactly
      assert(nNew + nRet + nRes == act.size, s"week $w classes don't sum")
      // ledger identity (only checkable where w-1 exists in the output)
      if (byWeek.contains(w - 1)) {
        val churn = rows.get(w).map(_._4).getOrElse(0L)
        assert(act.size.toLong ==
          prev.size + nNew + nRes - churn, s"week $w WAU identity")
      }
    }
    // churn is censored at the horizon: no output week past max(week)+0
    assert(rows.keys.max <= weeks.max, "churn claimed past the horizon")
  }

  // --------------------------------------------------------------- g_mis
  test("g_mis is independent (no MIS edge) and maximal (every non-MIS " +
      "node has a MIS neighbor) on the cleared graph") {
    val out = graft.operators.Analytics.mis(spark, sf).collect()
    val inMis = out.filter(_.getAs[Long]("in_mis") == 1L)
      .map(r => (r.getAs[String]("label"), r.getAs[Long]("key"))).toSet
    assert(inMis.nonEmpty, "empty MIS")
    val undecidedLeft = out.count(r => r.getAs[Long]("in_mis") == 0L &&
      r.getAs[Long]("round_joined") != 0L)
    assert(undecidedLeft == 0, "round_joined set on non-MIS rows")
    val edges = graft.model.PropertyGraph.load(spark, sf).edges
      .selectExpr("src_label", "src_key", "dst_label", "dst_key").collect()
      .map(r => ((r.getString(0), r.getLong(1)), (r.getString(2), r.getLong(3))))
    // independence: no edge inside the set
    edges.foreach { case (a, b) =>
      assert(!(inMis(a) && inMis(b) && a != b), s"MIS edge $a -- $b")
    }
    // maximality: every node outside the set is adjacent to the set
    // (holds when 8 rounds cleared the graph — assert they did via the
    // adjacency itself)
    val nbrs = (edges ++ edges.map(_.swap)).groupBy(_._1)
      .map { case (k, vs) => k -> vs.map(_._2).toSet }
    out.filter(_.getAs[Long]("in_mis") == 0L).foreach { r =>
      val v = (r.getAs[String]("label"), r.getAs[Long]("key"))
      assert(nbrs.getOrElse(v, Set.empty).exists(inMis),
        s"non-MIS node $v has no MIS neighbor — not maximal (uncleared?)")
    }
  }

  // -------------------------------------------------- t_template_detect
  test("t_template_detect finds the planted shared-prefix clusters and " +
      "every cluster is consistent with brute force") {
    val out = graft.operators.TextOps.templateDetect(spark, sf).collect()
    assert(out.nonEmpty, "no template clusters on a corpus with planted near-dups")
    val docs = graft.model.Tables(spark, sf, "documents")
      .selectExpr("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val brute = docs.groupBy(d => d._3.split(" ", -1).take(8).mkString(" "))
      .filter(_._2.length >= 2)
    assert(out.length == brute.size, "cluster count != brute force")
    out.foreach { r =>
      val cl = brute(r.getAs[String]("prefix"))
      assert(r.getAs[Long]("n_docs") == cl.length)
      assert(r.getAs[Long]("n_sources") == cl.map(_._2).distinct.length)
      assert(r.getAs[Long]("n_distinct_texts") == cl.map(_._3).distinct.length)
      assert(r.getAs[Long]("first_doc") == cl.map(_._1).min)
    }
  }

  // -------------------------------------------------- t_term_burstiness
  test("t_term_burstiness closed form equals the dense zero-padded VMR") {
    val out = graft.operators.TextOps.termBurstiness(spark, sf).collect()
    assert(out.nonEmpty)
    val docs = graft.model.Tables(spark, sf, "documents")
      .selectExpr("text").collect().map(_.getString(0))
    val n = docs.length.toLong
    out.foreach { r =>
      val term = r.getAs[String]("term")
      // dense per-doc counts INCLUDING zeros
      val xs = docs.map(_.split(" ", -1).count(_ == term).toLong)
      val cf = xs.sum; val sx2 = xs.map(x => x * x).sum
      assert(r.getAs[Long]("df") == xs.count(_ > 0).toLong, s"$term df")
      assert(r.getAs[Long]("cf") == cf, s"$term cf")
      assert(r.getAs[Long]("sum_x2") == sx2, s"$term sum_x2")
      val vmr = (BigInt(n) * sx2 - BigInt(cf) * cf) * 1000000 /
        (BigInt(n) * cf)
      assert(r.getAs[Long]("vmr_ppm") == vmr.toLong, s"$term vmr")
    }
    // content words should be burstier than the corpus floor: at least
    // one term with VMR meaningfully above Poisson (1e6 ppm)
    assert(out.exists(_.getAs[Long]("vmr_ppm") > 1100000L),
      "no bursty term found — VMR degenerate")
  }
}
