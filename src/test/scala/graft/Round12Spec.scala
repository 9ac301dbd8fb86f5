package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-12 operators. q_quantile_kll gets the t_kmv_merge treatment:
  * mergeability is PROVEN hash-for-hash on real shards (union of
  * per-shard sketches == corpus sketch, exactly — the property that
  * lets 1000 executors sketch locally and merge map-side), not argued
  * from the construction.
  */
class Round12Spec extends AnyFunSuite {
  import TestSession._

  // -------------------------------------------------------- q_quantile_kll
  test("q_quantile_kll: shard sketches union to the corpus sketch " +
      "hash-for-hash; compactor cascade decays ~2x per level") {
    val Relational = graft.operators.Relational
    val base = graft.model.Tables(spark, sf, "orders")
      .selectExpr("o_orderpriority AS pri",
        "CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents",
        "o_orderkey")
      .withColumn("h", graft.functions.VectorExprs.hexSlice(
        md5(col("o_orderkey").cast("string")), 1, 10))
    def sketch(df: DataFrame): Set[(String, Long, Long)] =
      df.filter(col("h") % Relational.kllWeight === 0)
        .select("pri", "cents", "o_orderkey").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // three disjoint shards (as an executor fleet would see the table);
    // the sketch is a pure function of the input SET, so the shard
    // sketches are disjoint and their plain union IS the corpus sketch
    val corpus = sketch(base)
    val shards = (0 until 3).map(i =>
      sketch(base.filter(pmod(col("o_orderkey"), lit(3)) === i)))
    assert(corpus.nonEmpty, "empty corpus sketch — test data too small")
    assert(shards.map(_.size).sum == corpus.size,
      "shard sketches overlap or drop rows")
    assert(shards.reduce(_ ++ _) == corpus,
      "union of shard sketches != corpus sketch (merge is not hash-for-hash)")
    // the compactor cascade: each level halves the previous buffer in
    // expectation (the md5-parity coin) — deterministic on this data,
    // banded generously
    val lv = base.agg(
      sum(when(col("h") % 8 === 0, 1L).otherwise(0L)),
      sum(when(col("h") % 16 === 0, 1L).otherwise(0L)),
      sum(when(col("h") % 32 === 0, 1L).otherwise(0L))).head
    val (l3, l4, l5) = (lv.getLong(0), lv.getLong(1), lv.getLong(2))
    assert(l3 > l4 && l4 > l5, s"cascade not decreasing: $l3 / $l4 / $l5")
    assert(l3.toDouble / l4 > 1.4 && l3.toDouble / l4 < 2.8,
      s"level-3→4 decay off the 2x coin: $l3 / $l4")
    assert(l4.toDouble / l5 > 1.4 && l4.toDouble / l5 < 2.8,
      s"level-4→5 decay off the 2x coin: $l4 / $l5")
    // the registered op's self-adjudication stays inside the sketch's
    // own error budget even at this tiny SF (buffer ≈ 9/group ⇒ rank
    // err O(1/√9) ≈ 33%): every estimate lands within 45% of its rank
    val out = Relational.qQuantileKll(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      Seq("err50_ppm", "err90_ppm", "err99_ppm").foreach { c =>
        val e = r.getAs[Long](c)
        assert(e >= 0 && e <= 450000L, s"${r.getString(0)} $c = $e")
      }
      assert(r.getAs[Long]("m_sketch") > 0)
    }
  }

  // -------------------------------------------------------- q_bootstrap_ci
  test("q_bootstrap_ci: the interval brackets the mean at sane width") {
    val r = graft.operators.Relational.qBootstrapCi(spark, sf).head()
    val (mean, lo, hi) = (r.getAs[Long]("mean_mc"),
      r.getAs[Long]("ci_lo_mc"), r.getAs[Long]("ci_hi_mc"))
    assert(lo <= mean && mean <= hi,
      s"CI [$lo, $hi] does not bracket the point estimate $mean")
    // at n ≈ 1.5k the 95% halfwidth is ~2·sd/√n ≈ 3% of the mean —
    // a zero width (degenerate replicas) or >20% (broken multiplier)
    // both fail
    assert(hi > lo, "degenerate zero-width interval")
    assert(hi - lo < mean / 5, s"implausibly wide CI: ${hi - lo} vs $mean")
  }

  // ----------------------------------------------------------- st_ivm_join
  test("st_ivm_join: view at each version == batch recompute from all " +
      "deltas fed; versions isolate; replay is a no-op") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val Streams = graft.streaming.Streams
    val dir = java.nio.file.Files.createTempDirectory("ivm").toString
    val mem = MemoryStream[Streams.IvmDelta]
    val q = mem.toDF().writeStream
      .foreachBatch(Streams.ivmJoinSink(dir) _)
      .outputMode("append").start()
    def o(k: Long, p: String) = Streams.IvmDelta("o", k, p, 0L)
    def l(k: Long, c: Long) = Streams.IvmDelta("l", k, "", c)
    // adversarial interleave exercising all three delta-join terms:
    // l(4, 99) arrives BEFORE its order (paired later by ΔA⋈B₀ when
    // o(4) lands), o(2)+l(2,7) share a batch (ΔA⋈ΔB), l(2,3)/l(4,1)
    // arrive after their orders (A₀⋈ΔB)
    val batches = Seq(
      Seq(o(1, "A"), l(1, 10), l(4, 99)),
      Seq(o(2, "B"), l(1, 5), l(2, 7), o(4, "A")),
      Seq(l(2, 3), o(3, "B"), l(4, 1)))
    def viewAt(v: Long): Set[(String, Long, Long)] =
      Streams.ivmViewRead(spark, dir, v).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    var fed = Seq.empty[Streams.IvmDelta]
    try {
      batches.zipWithIndex.foreach { case (b, i) =>
        mem.addData(b: _*); q.processAllAvailable()
        fed ++= b
        // from-scratch recompute over EVERYTHING fed so far — the
        // equality proves the per-batch delta algebra loses nothing
        val os = fed.filter(_.side == "o").map(d => d.key -> d.pri).toMap
        val expect = fed.filter(_.side == "l")
          .flatMap(d => os.get(d.key).map(p => p -> d.cents))
          .groupBy(_._1)
          .map { case (p, xs) => (p, xs.map(_._2).sum, xs.size.toLong) }
          .toSet
        assert(viewAt(i.toLong) == expect,
          s"version $i: ${viewAt(i.toLong)} != $expect")
      }
      // ISOLATION: version 0 re-read after batch 2 landed — unchanged
      assert(viewAt(0) == Set(("A", 10L, 1L)),
        "a later batch leaked into a pinned view version")
      // at-least-once REPLAY of batch 1: manifest is the commit marker
      // — byte-identical manifest, every version's view unchanged (a
      // re-applied delta would double-count into rev_cents)
      val m1 = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"$dir/manifest-1")), "UTF-8")
      val v2 = viewAt(2)
      Streams.ivmJoinSink(dir)(batches(1).toDF(), 1L)
      assert(new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"$dir/manifest-1")), "UTF-8") == m1,
        "replay changed the published manifest")
      assert(viewAt(1) == Set(("A", 114L, 3L), ("B", 7L, 1L)) &&
        viewAt(2) == v2, "replay changed a reader-visible view version")
    } finally q.stop()
  }

  // ---------------------------------------------------------- st_ivm_signed
  test("st_ivm_signed: retractions maintain the view under any interleave; " +
      "delete-before-insert annihilates; retract-to-empty drops the group") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val Streams = graft.streaming.Streams
    val dir = java.nio.file.Files.createTempDirectory("ivms").toString
    val mem = MemoryStream[Streams.IvmSDelta]
    val q = mem.toDF().writeStream
      .foreachBatch(Streams.ivmSignedSink(dir) _)
      .outputMode("append").start()
    def o(k: Long, p: String, sg: Long) = Streams.IvmSDelta("o", k, p, 0L, sg)
    def l(k: Long, c: Long, sg: Long) = Streams.IvmSDelta("l", k, "", c, sg)
    // b0 carries a PENDING retraction (l(2,7,−1) before any insert);
    // b1's insert annihilates it (net 0 ⇒ group B never appears);
    // b2 deletes a joined lineitem; b3 deletes order 1 itself and the
    // last lineitem — the whole view retracts to empty
    val batches = Seq(
      Seq(o(1, "A", 1), l(1, 10, 1), l(2, 7, -1)),
      Seq(o(2, "B", 1), l(2, 7, 1), l(1, 5, 1)),
      Seq(l(1, 10, -1), o(3, "A", 1), l(3, 4, 1)),
      Seq(o(1, "A", -1), l(3, 4, -1)))
    def viewAt(v: Long): Set[(String, Long, Long)] =
      Streams.ivmViewRead(spark, dir, v).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    var fed = Seq.empty[Streams.IvmSDelta]
    try {
      batches.zipWithIndex.foreach { case (b, i) =>
        mem.addData(b: _*); q.processAllAvailable()
        fed ++= b
        // net-multiplicity recompute from scratch: every (order row ×
        // lineitem row) pair contributes sign(a)·sign(b)
        val as = fed.filter(_.side == "o")
        val bs = fed.filter(_.side == "l")
        val expect = (for {
          a <- as; bb <- bs if a.key == bb.key
        } yield (a.pri, a.sign * bb.sign, bb.cents))
          .groupBy(_._1)
          .map { case (p, xs) =>
            (p, xs.map(x => x._2 * x._3).sum, xs.map(_._2).sum) }
          .filter { case (_, rev, n) => rev != 0L || n != 0L }
          .toSet
        assert(viewAt(i.toLong) == expect,
          s"version $i: ${viewAt(i.toLong)} != $expect")
      }
      assert(viewAt(3).isEmpty, "retract-to-empty left view rows behind")
      // replay of batch 2 is a no-op (a re-applied signed delta would
      // double-retract)
      val m2 = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"$dir/manifest-2")), "UTF-8")
      val v2 = viewAt(2)
      Streams.ivmSignedSink(dir)(batches(2).toDF(), 2L)
      assert(new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"$dir/manifest-2")), "UTF-8") == m2,
        "replay changed the published manifest")
      assert(viewAt(2) == v2 && viewAt(3).isEmpty,
        "replay changed a reader-visible view version")
    } finally q.stop()
  }

  // ------------------------------------------------------- st_quantile_kll
  test("st_quantile_kll: streaming buffer estimates == batch twin under " +
      "any split") {
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
      val want = Streams.kllSketchBatch(events.toDF()).collect()
        .map(r => r.getAs[String]("event_type") ->
          ((r.getAs[Long]("n_events"), r.getAs[Long]("m_sketch"),
            r.getAs[Long]("p50_est"), r.getAs[Long]("p90_est"),
            r.getAs[Long]("p99_est")))).toMap
      def run(name: String,
          batches: Seq[Seq[Streams.Event]]): Map[String, (Long, Long, Long, Long, Long)] = {
        val mem = MemoryStream[Streams.Event]
        val q = Streams.kllStream(mem.toDS())
          .toDF().writeStream.format("memory").queryName(name)
          .outputMode("update").start()
        try {
          batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
          spark.table(name).collect().zipWithIndex
            .groupBy(_._1.getAs[String]("event_type"))
            .map { case (k, rs) =>
              val last = rs.maxBy(_._2)._1
              k -> ((last.getAs[Long]("n_events"), last.getAs[Long]("m_sketch"),
                last.getAs[Long]("p50_est"), last.getAs[Long]("p90_est"),
                last.getAs[Long]("p99_est")))
            }
        } finally q.stop()
      }
      val oneShot = run("kll_one", Seq(events))
      val split = run("kll_split",
        events.grouped(math.max(1, events.size / 7)).toSeq)
      assert(want.values.exists(_._2 > 0), "no survivors at this SF")
      assert(oneShot == want, "one-shot stream != batch twin")
      assert(split == want, "split stream != batch twin (buffer not split-invariant?)")
    } finally spark.conf.set(
      "spark.sql.streaming.stateStore.providerClass", saved)
  }

  // ------------------------------------------------------------ st_bootstrap
  test("st_bootstrap: streaming replica sums == batch twin under any split") {
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
      val want = Streams.bootstrapRepsBatch(events.toDF()).collect()
        .map(r => r.getAs[Int]("b") ->
          ((r.getAs[Long]("rsum"), r.getAs[Long]("rn")))).toMap
      def run(name: String,
          batches: Seq[Seq[Streams.Event]]): Map[Int, (Long, Long)] = {
        val mem = MemoryStream[Streams.Event]
        val q = Streams.bootstrapStream(mem.toDS())
          .toDF().writeStream.format("memory").queryName(name)
          .outputMode("update").start()
        try {
          batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
          spark.table(name).collect().zipWithIndex
            .groupBy(_._1.getAs[Int]("b"))
            .map { case (k, rs) =>
              val last = rs.maxBy(_._2)._1
              k -> ((last.getAs[Long]("rsum"), last.getAs[Long]("rn")))
            }
        } finally q.stop()
      }
      val oneShot = run("boot_one", Seq(events))
      val split = run("boot_split",
        events.grouped(math.max(1, events.size / 5)).toSeq)
      assert(want.size == graft.operators.Relational.bootB,
        s"batch twin produced ${want.size} replicas")
      assert(oneShot == want, "one-shot stream != batch twin")
      assert(split == want, "split stream != batch twin (sums not split-invariant?)")
    } finally spark.conf.set(
      "spark.sql.streaming.stateStore.providerClass", saved)
  }

  // ----------------------------------------------------------------- st_cms
  test("st_cms: streamed counter table == in-memory sketch under any " +
      "split; probe estimates match q_count_min row for row") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val Streams = graft.streaming.Streams
    val Relational = graft.operators.Relational
    val saved = spark.conf.get("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val events = graft.model.Tables(spark, sf, "events")
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"))
        .as[Streams.Event].collect().toSeq
      // in-memory gold standard: the d×w table from first principles
      val w = Relational.cmW.toInt
      val gold = Array.fill(Relational.cmD, w)(0L)
      events.foreach { e =>
        (0 until Relational.cmD).foreach { r =>
          gold(r)(Streams.cmsBucket(r, e.user_id)) += 1L
        }
      }
      def run(name: String,
          batches: Seq[Seq[Streams.Event]]): Map[Int, Seq[Long]] = {
        val mem = MemoryStream[Streams.Event]
        val q = Streams.cmsStream(mem.toDS())
          .toDF().writeStream.format("memory").queryName(name)
          .outputMode("update").start()
        try {
          batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
          spark.table(name).collect().zipWithIndex
            .groupBy(_._1.getAs[Int]("row"))
            .map { case (r, rs) =>
              val last = rs.maxBy(_._2)._1
              r -> last.getSeq[Long](last.fieldIndex("counters")).toSeq }
        } finally q.stop()
      }
      val oneShot = run("cms_one", Seq(events))
      val split = run("cms_split",
        events.grouped(math.max(1, events.size / 7)).toSeq)
      (0 until Relational.cmD).foreach { r =>
        assert(oneShot(r) == gold(r).toSeq, s"one-shot row $r != gold")
        assert(split(r) == gold(r).toSeq,
          s"split row $r != gold (counter merge not split-invariant?)")
      }
      // probe parity: min-over-rows from the STREAMED table must equal
      // the driver-checked q_count_min estimates, row for row
      Relational.qCountMin(spark, sf).collect().foreach { row =>
        val u = row.getAs[Long]("user_id")
        val est = (0 until Relational.cmD)
          .map(r => oneShot(r)(Streams.cmsBucket(r, u))).min
        assert(est == row.getAs[Long]("n_est"),
          s"user $u: streamed est $est != batch ${row.getAs[Long]("n_est")}")
      }
    } finally spark.conf.set(
      "spark.sql.streaming.stateStore.providerClass", saved)
  }
}
