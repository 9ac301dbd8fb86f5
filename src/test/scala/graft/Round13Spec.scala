package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 operators: the true KLL compactor (error-class statement
  * measured against the equal-space sample + the deterministic bound)
  * and streaming incremental connected components (per-version
  * equality against an independent union-find gold).
  */
class Round13Spec extends AnyFunSuite {
  import TestSession._

  // ------------------------------------------------------ q_kll_compactor
  test("q_kll_compactor: compactor-class error beats the equal-space " +
      "sample in aggregate and respects the deterministic bound") {
    val rows = graft.operators.Relational.qKllCompactor(spark, sf).collect()
    assert(rows.length == 5)
    val S = graft.operators.Relational.kllShards
    var kllSum = 0L; var sampleSum = 0L
    rows.foreach { r =>
      val n = r.getAs[Long]("n")
      // deterministic compactor bound: the bias-corrected merged
      // estimate is off by ≤ 15.5·S ranks (per-shard count rounding)
      // + 16 (target-to-position rounding) + 32 (position-to-value) —
      // 176 ranks at S=8; sampling-class error CANNOT promise this
      val boundPpm = (16L * S + 48L) * 1000000L / n + 1
      Seq("err50_kll_ppm", "err90_kll_ppm", "err99_kll_ppm").foreach { c =>
        val e = r.getAs[Long](c)
        assert(e >= 0 && e <= boundPpm,
          s"${r.getString(0)} $c = $e exceeds deterministic bound $boundPpm")
        kllSum += e
      }
      Seq("err50_sample_ppm", "err90_sample_ppm", "err99_sample_ppm")
        .foreach(c => sampleSum += r.getAs[Long](c))
      assert(r.getAs[Long]("m_kll") > 0 && r.getAs[Long]("m_sample") > 0)
    }
    // the compactor-beats-sampling statement, measured on this corpus
    // (aggregate: a single lucky sample cell may win, the class does not)
    assert(kllSum < sampleSum,
      s"compactor aggregate error $kllSum !< sample aggregate $sampleSum")
  }

  test("q_kll_compactor: per-shard survivors are exactly the closed-form " +
      "arithmetic progression (count check, independent of the op)") {
    val Relational = graft.operators.Relational
    val S = Relational.kllShards
    val w = Relational.kllWeight
    // group sizes per (pri, shard) from the raw table
    val sizes = graft.model.Tables(spark, sf, "orders")
      .groupBy(col("o_orderpriority").as("pri"),
        (col("o_orderkey") % S).as("shard"))
      .agg(count(lit(1)).as("ns"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    // survivor counts per (pri, shard) re-derived the way the op does
    val base = graft.model.Tables(spark, sf, "orders")
      .select(col("o_orderpriority").as("pri"),
        (col("o_totalprice").cast("decimal(12,2)") * 100)
          .cast("long").as("cents"),
        col("o_orderkey"), (col("o_orderkey") % S).as("shard"))
    val wsh = org.apache.spark.sql.expressions.Window
      .partitionBy("pri", "shard").orderBy(col("cents"), col("o_orderkey"))
    val offCase = Relational.kllShardOffsets.zipWithIndex
      .map { case (a, i) => s"WHEN $i THEN $a" }
      .mkString("CASE shard ", " ", " END")
    val got = base.withColumn("rs", row_number().over(wsh))
      .withColumn("a", expr(offCase))
      .filter(expr(s"(rs - a) % $w = 0"))
      .groupBy("pri", "shard").agg(count(lit(1)).as("m"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    // closed form: local ranks A_s, A_s+32, ... ≤ n_s ⇒ count =
    // ⌊(n_s − A_s)/32⌋ + 1 (0 when n_s < A_s) — survivors ARE the
    // L=5 full-buffer compaction of the shard's sorted run
    sizes.foreach { case ((pri, sh), ns) =>
      val a = Relational.kllShardOffsets(sh.toInt)
      val expect = if (ns < a) 0L else (ns - a) / w + 1
      assert(got.getOrElse((pri, sh), 0L) == expect,
        s"($pri, $sh): got ${got.getOrElse((pri, sh), 0L)}, expect $expect")
    }
  }

  // -------------------------------------------------- g_louvain_hierarchy
  test("g_louvain_hierarchy: in-memory replay agrees; modularity is " +
      "monotone level over level; the loop converges within the cap") {
    val labelCode = Map("region" -> 0L, "nation" -> 1L, "customer" -> 2L,
      "supplier" -> 3L, "part" -> 4L, "order" -> 5L)
    def nid(l: String, k: Long) = labelCode(l) * 10000000000000L + k
    val g = graft.model.PropertyGraph.load(spark, sf)
    val kin = scala.collection.mutable.Map[(Long, Long), Long]()
      .withDefaultValue(0L)
    g.edges.collect().foreach { r =>
      val a = nid(r.getAs[String]("src_label"), r.getAs[Long]("src_key"))
      val b = nid(r.getAs[String]("dst_label"), r.getAs[Long]("dst_key"))
      val w = r.getAs[Long]("weight")
      kin((a, b)) += w; kin((b, a)) += w
    }
    val nodes = g.nodes.collect().map(r =>
      nid(r.getAs[String]("label"), r.getAs[Long]("key")))
    val k0 = kin.toSeq.groupBy(_._1._1)
      .map { case (i, es) => i -> es.map(_._2).sum }.withDefaultValue(0L)
    val m2 = kin.values.sum

    // one hierarchy level on an (a,b)->w adjacency (self rows feed k,
    // never candidates) — the louvainLevel recurrence (Round7Spec's
    // level(), reused for the looped hierarchy)
    def level(adj: collection.Map[(Long, Long), Long],
              ids: Seq[Long]): (Map[Long, Long], Boolean) = {
      val kk = adj.toSeq.groupBy(_._1._1)
        .map { case (i, es) => i -> es.map(_._2).sum }.withDefaultValue(0L)
      var any = false
      val hook = ids.map { i =>
        val cands = adj.collect { case ((a, c), w) if a == i && c != i =>
          c -> (BigInt(m2) * w - BigInt(kk(i)) * kk(c)) }.filter(_._2 > 0)
        val c =
          if (cands.isEmpty) i
          else { any = true
            cands.toSeq.sortBy { case (cc, gain) => (-gain, cc) }.head._1 }
        i -> c
      }.toMap
      var ptr = hook.map { case (i, p) =>
        i -> (if (hook(p) == i) math.min(i, p) else p) }
      for (_ <- 1 to graft.operators.Analytics.louvainJumps)
        ptr = ptr.map { case (i, p) => i -> ptr(p) }
      (ptr, any)
    }
    def qScaled(comm: Map[Long, Long]): BigInt = {
      val in = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
      kin.foreach { case ((a, b), w) =>
        if (comm(a) == comm(b)) in(comm(a)) += w }
      val tot = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
      nodes.foreach(i => tot(comm(i)) += k0(i))
      BigInt(m2) * in.values.map(BigInt(_)).sum -
        tot.values.map(t => BigInt(t) * t).sum
    }

    // the full loop: contract the ORIGINAL adjacency through the
    // composed map each level, stop when a level proposes no move
    var comm = nodes.map(i => i -> i).toMap
    var qs = List(qScaled(comm))
    var moved = true
    var levels = 0
    while (moved && levels < graft.operators.Analytics.louvainMaxLevels) {
      levels += 1
      val adj = scala.collection.mutable.Map[(Long, Long), Long]()
        .withDefaultValue(0L)
      kin.foreach { case ((a, b), w) => adj((comm(a), comm(b))) += w }
      val (roots, any) = level(adj, comm.values.toSeq.distinct)
      if (!any) { moved = false; levels -= 1 }
      else {
        comm = comm.map { case (i, c) => i -> roots.getOrElse(c, c) }
        qs ::= qScaled(comm)
      }
    }
    assert(!moved,
      s"replay still moving after ${graft.operators.Analytics.louvainMaxLevels} levels — the op would abort on this graph")
    assert(levels >= 2, "graph converged trivially — test not probative")
    // measured MONOTONE modularity: every level strictly improves
    qs.reverse.sliding(2).foreach { case List(a, b) =>
      assert(b > a, s"modularity not monotone: $a -> $b")
    }
    // final partition equality with the operator
    val rows = graft.operators.Analytics.louvainHierarchy(spark, sf).collect()
    assert(rows.length == nodes.length)
    rows.foreach { r =>
      val i = nid(r.getAs[String]("label"), r.getAs[Long]("key"))
      assert(r.getAs[Long]("comm") == comm(i),
        s"node $i got ${r.getAs[Long]("comm")}, replay says ${comm(i)}")
    }
  }

  // ------------------------------------------------------ st_topk_sketch
  test("st_topk_sketch: MG bounds valid at every version under one-shot " +
      "AND split feeds; state stays <= k per shard; replay is a no-op") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val Streams = graft.streaming.Streams
    // skewed synthetic stream: key 1 very heavy, 2-4 medium, a long
    // tail of singletons that must be absorbed by the decrement
    val items: Seq[Streams.HHItem] =
      (Seq.fill(60)(1L) ++ Seq.fill(25)(2L) ++ Seq.fill(20)(3L) ++
        Seq.fill(15)(4L) ++ (100L to 180L)).map(Streams.HHItem)
    def exactAt(fed: Seq[Streams.HHItem]): Map[(Long, Long), Long] =
      fed.groupBy(i => (i.k % Streams.mgShards, i.k))
        .map { case (sk, xs) => sk -> xs.size.toLong }
    def validate(dir: String, version: Long, fed: Seq[Streams.HHItem]): Unit = {
      val rows = Streams.topkSketchRead(spark, dir, version).collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          ((r.getAs[Long]("lo"), r.getAs[Long]("hi")))).toMap
      val exact = exactAt(fed)
      // ≤ k counters per shard — the bounded-state contract
      rows.keys.groupBy(_._1).foreach { case (sh, ks) =>
        assert(ks.size <= Streams.mgK, s"v$version shard $sh holds ${ks.size} > k")
      }
      val decOf = rows.toSeq.groupBy(_._1._1)
        .map { case (sh, xs) => sh -> (xs.head._2._2 - xs.head._2._1) }
        .withDefaultValue(0L)
      exact.foreach { case ((sh, k), ex) =>
        rows.get((sh, k)) match {
          case Some((lo, hi)) => assert(lo <= ex && ex <= hi,
            s"v$version key $k: exact $ex outside [$lo, $hi]")
          case None => assert(ex <= decOf(sh),
            s"v$version absent key $k: exact $ex > shard decrement ${decOf(sh)}")
        }
      }
      // the heavy hitter must SURVIVE every fold
      assert(rows.contains((1L % Streams.mgShards, 1L)),
        s"v$version lost the heavy hitter")
    }
    def feed(dir: String, batches: Seq[Seq[Streams.HHItem]]): Unit = {
      val mem = MemoryStream[Streams.HHItem]
      val q = mem.toDF().writeStream
        .foreachBatch(Streams.topkSketchSink(dir) _)
        .outputMode("append").start()
      try batches.zipWithIndex.foreach { case (b, i) =>
        mem.addData(b: _*); q.processAllAvailable()
        validate(dir, i.toLong, batches.take(i + 1).flatten)
      } finally q.stop()
    }
    val d1 = java.nio.file.Files.createTempDirectory("hh1").toString
    feed(d1, Seq(items)) // one shot
    val d2 = java.nio.file.Files.createTempDirectory("hh2").toString
    val splits = items.grouped(math.max(1, items.size / 3)).toSeq
    feed(d2, splits) // split feed — values may differ, the GUARANTEE may not
    // replay no-op: manifest is the commit marker
    val m1 = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$d2/manifest-1")), "UTF-8")
    Streams.topkSketchSink(d2)(splits(1).toDF(), 1L)
    assert(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$d2/manifest-1")), "UTF-8") == m1,
      "replay changed the published manifest")
  }

  // --------------------------------------------------- st_running_moments
  test("st_running_moments: last emission per key == exact batch moment " +
      "aggregate under ordered AND shuffled splits") {
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
      // the batch twin (shared transform, integer-cents contract)
      val want = Streams.runningMomentsBatch(events.toDF())
        .collect().map(r => r.getString(0) ->
          ((r.getAs[Long]("n"), r.getAs[Long]("mean_c"),
            r.getAs[Long]("var_c2")))).toMap
      // independent gold: BigInt arithmetic straight from the rows
      val gold = events.groupBy(_.event_type).map { case (t, es) =>
        val cs = es.map(e => math.round(e.value * 100))
        val n = BigInt(cs.size); val s1 = cs.map(BigInt(_)).sum
        val s2 = cs.map(c => BigInt(c) * c).sum
        t -> ((cs.size.toLong, (s1 / n).toLong,
          ((n * s2 - s1 * s1) / (n * n)).toLong))
      }
      assert(want == gold.toMap, "shared batch twin != BigInt gold")
      def run(name: String, batches: Seq[Seq[Streams.Event]]): Map[String, (Long, Long, Long)] = {
        val mem = MemoryStream[Streams.Event]
        val q = Streams.runningMoments(mem.toDS())
          .toDF().writeStream.format("memory").queryName(name)
          .outputMode("update").start()
        try {
          batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
          spark.table(name).collect()
            .zipWithIndex.groupBy(_._1.getAs[String]("event_type"))
            .map { case (t, rs) =>
              val last = rs.maxBy(_._2)._1
              t -> ((last.getAs[Long]("n"), last.getAs[Long]("mean_c"),
                last.getAs[Long]("var_c2")))
            }
        } finally q.stop()
      }
      val oneShot = run("rm_one", Seq(events))
      val ordered = run("rm_ord", events.grouped(
        math.max(1, events.size / 3)).toSeq)
      val shuffled = run("rm_shuf",
        events.sortBy(_.event_id.hashCode()).grouped(
          math.max(1, events.size / 4)).toSeq)
      assert(oneShot == want, "single-batch run != batch twin")
      assert(ordered == want, "ordered split != batch twin")
      assert(shuffled == want, "shuffled split != batch twin (state not a pure function of the set)")
    } finally spark.conf.set(
      "spark.sql.streaming.stateStore.providerClass", saved)
  }

  // ---------------------------------------------------- st_cc_incremental
  test("st_cc_incremental: labels at each version == union-find gold; " +
      "versions isolate; replay is a no-op") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val Streams = graft.streaming.Streams
    val dir = java.nio.file.Files.createTempDirectory("ccinc").toString
    val mem = MemoryStream[Streams.CcEdge]
    val q = mem.toDF().writeStream
      .foreachBatch(Streams.ccIncSink(dir) _)
      .outputMode("append").start()
    def e(a: Long, b: Long) = Streams.CcEdge(a, b)
    // batch 2's (4,10) + (21,1) chain forces a MULTI-ROUND super-graph
    // fixpoint (three prior components merge through two super-edges)
    val batches = Seq(
      Seq(e(1, 2), e(3, 4), e(10, 11)),
      Seq(e(2, 3), e(20, 21)),
      Seq(e(4, 10), e(21, 1), e(40, 41)))
    // independent gold: union-find over all edges fed so far, label =
    // component minimum (the min-label fixpoint contract)
    def gold(upTo: Int): Set[(Long, Long)] = {
      val es = batches.take(upTo + 1).flatten
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      es.foreach { ed =>
        val (ra, rb) = (find(ed.a), find(ed.b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      parent.keys.map(x => x -> find(x)).toSet
    }
    def labelsAt(v: Long): Set[(Long, Long)] =
      Streams.ccLabelsRead(spark, dir, v).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    try {
      batches.zipWithIndex.foreach { case (b, i) =>
        mem.addData(b: _*); q.processAllAvailable()
        assert(labelsAt(i.toLong) == gold(i),
          s"version $i: ${labelsAt(i.toLong)} != ${gold(i)}")
      }
      // ISOLATION: version 0 re-read after batch 2 landed — unchanged
      assert(labelsAt(0) == gold(0),
        "a later batch leaked into a pinned label version")
      // the decisive row: 41 (new in batch 2) must share component 1
      // with node 11 (merged through the super-chain)? no — 40/41 are
      // their own component; 11 must have been relabeled 10 → 1
      assert(labelsAt(2).contains((11L, 1L)) &&
        labelsAt(2).contains((21L, 1L)) && labelsAt(2).contains((41L, 40L)))
      // at-least-once REPLAY of batch 1: manifest is the commit marker
      val m1 = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"$dir/manifest-1")), "UTF-8")
      val v2 = labelsAt(2)
      Streams.ccIncSink(dir)(batches(1).toDF(), 1L)
      assert(new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"$dir/manifest-1")), "UTF-8") == m1,
        "replay changed the published manifest")
      assert(labelsAt(1) == gold(1) && labelsAt(2) == v2,
        "replay changed a reader-visible label version")
    } finally q.stop()
  }
}
