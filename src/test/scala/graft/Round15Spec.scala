package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-15 scale-posture specs: the streaming CC view's BATCH-TIME
  * read must be delta-bounded like its write (the r14 verdict weak —
  * label rows entering any exchange ≤ f(|Δ| · compaction period),
  * never f(|V|)), and the reader plan must stream the snapshot
  * through broadcast joins with no shuffle over it.
  */
class Round15Spec extends AnyFunSuite {
  import TestSession._

  // ---------------------------------------------------- st_cc_incremental
  test("st_cc_incremental: batch-time label composition is delta-bounded " +
      "(window input = post-snapshot delta files only, never the store); " +
      "reader plan never shuffles the snapshot; labels stay gold-exact") {
    val Streams = graft.streaming.Streams
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ccinc15").toString
    assert(Streams.ccIncCompactEvery == 4L,
      "test assumes the compaction period is 4 — update the batch plan")
    def e(a: Long, b: Long) = Streams.CcEdge(a, b)
    // v0 lands a BIG component (120-leaf star, 121 nodes — diameter 2,
    // so the super-fixpoint converges well inside its round cap) — the
    // store the per-batch read must NOT re-window; later batches tiny
    val chain = (1001L to 1120L).map(i => e(1000L, i))
    val batches: Seq[Seq[Streams.CcEdge]] = Seq(
      chain,                        // v0: 121 first-seen
      Seq(e(1, 2)),                 // v1: 2 first-seen
      Seq(e(3, 4), e(4, 5)),        // v2: 3 first-seen
      Seq(e(2, 3)),                 // v3: merge {1,2}+{3,4,5}
      Seq(e(10, 11)),               // v4: COMPACTION (snapshot, |V|=128)
      Seq(e(20, 21)),               // v5: 2 first-seen
      Seq(e(21, 10)),               // v6: merge {20,21}+{10,11}
      Seq(e(30, 31)))               // v7: 2 first-seen
    def gold(upTo: Int): Map[Long, Long] = {
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
      parent.keys.map(x => x -> find(x)).toMap
    }
    def manifestFiles(v: Long, section: String): Seq[String] = {
      val p = java.nio.file.Paths.get(s"$dir/manifest-$v")
      if (!java.nio.file.Files.exists(p)) Seq.empty
      else new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
        .split("\n").filter(_.startsWith(s"$section|"))
        .map(_.substring(section.length + 1)).toSeq
    }
    batches.zipWithIndex.foreach { case (b, i) =>
      // what composeLabels will shuffle AT this batch = the delta
      // files the PREVIOUS manifest lists — count them before the
      // batch runs (the batch itself then proves the labels correct)
      val windowRows =
        manifestFiles(i - 1L, "labels").map(f =>
          spark.read.parquet(f).count()).sum
      Streams.ccIncSink(dir)(b.toDF(), i.toLong)
      val labels = Streams.ccLabelsRead(spark, dir, i.toLong).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(labels == gold(i), s"version $i labels != gold")
      // delta-bounded READ: the window input is EXACTLY the sum of the
      // label diffs written since the last compaction — never the
      // store size. (Before any compaction the v0 bulk is itself a
      // delta; after one, the window never re-reads it.)
      def diffSize(v: Int): Long = {
        val prev = if (v == 0) Map.empty[Long, Long] else gold(v - 1)
        gold(v).count { case (id, c) => prev.get(id) != Some(c) }.toLong
      }
      val deltaVersions: Seq[Int] =
        (1 to i - 1).reverse.find(v =>
            v % Streams.ccIncCompactEvery == 0) match {
          case Some(c) => ((c + 1) until i)
          case None    => (0 until i)
        }
      assert(windowRows == deltaVersions.map(diffSize).sum,
        s"v$i windowed $windowRows label rows, expected the " +
          s"${deltaVersions.mkString(",")} diffs = " +
          s"${deltaVersions.map(diffSize).sum}")
      // the decisive post-compaction case: with the 121-node chain in
      // the snapshot, tiny batches must window only tiny deltas
      if (i >= 5)
        assert(windowRows < 20,
          s"v$i (post-compaction) windowed $windowRows rows — the " +
            "batch-time read is composing the full store again")
    }
    // reader plan shape at the final version: the snapshot scan must
    // appear ONLY below broadcast joins — no ShuffleExchange subtree
    // may contain it (snapshot rows never enter an exchange)
    val qe = Streams.ccLabelsRead(spark, dir, 7L).queryExecution
    val plan = qe.sparkPlan
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    val shuffledSnap = plan.collect {
      case sh: ShuffleExchangeLike if sh.toString.contains("labsnap") => sh
    }
    assert(plan.toString.contains("labsnap"),
      "reader plan lost the snapshot scan — layout changed?")
    assert(shuffledSnap.isEmpty,
      s"snapshot rows enter a shuffle:\n${shuffledSnap.headOption}")
    // and the sink's own lookup prunes snapshot partitions: re-read the
    // snapshot the way the sink does and check the pushed filter
    val probe = spark.read
      .option("basePath", manifestFiles(7L, "labsnap").head)
      .parquet(manifestFiles(7L, "labsnap").head)
      .filter(col("bkt").isInCollection(Seq(1, 2, 3)))
    val scan = probe.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scan.nonEmpty && scan.head.toString.contains("PartitionFilters"),
      "snapshot probe does not partition-prune on bkt")
    assert(scan.head.inputRDDs().map(_.getNumPartitions).sum >= 0) // force plan
  }

  // ------------------------------------------- changelog duplicate-guard
  test("incremental edge sinks: the duplicate-guard probe is bloom-" +
      "fronted and bucket-pruned — all-new batches scan ZERO changelog " +
      "rows as history grows; a dup batch confirms against a pruned " +
      "slice, not the full history; census stays gold-exact") {
    val Streams = graft.streaming.Streams
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("triinc15").toString
    def e(a: Long, b: Long) = Streams.CcEdge(a, b)
    val batches: Seq[Seq[Streams.CcEdge]] = Seq(
      Seq(e(1, 2), e(2, 3), e(3, 1), e(4, 5)), // v0: triangle + dangle
      Seq(e(6, 7), e(7, 8)),                   // v1: all new
      Seq(e(9, 10)),                           // v2: all new
      Seq(e(11, 12), e(12, 13), e(13, 11)),    // v3: all new (triangle)
      Seq(e(14, 15)),                          // v4: all new (bloom compaction)
      Seq(e(1, 2), e(16, 17)),                 // v5: one DUP + one new
      Seq(e(18, 19)))                          // v6: all new, post-dup
    def goldCount(upTo: Int): Long = {
      val es = batches.take(upTo + 1).flatten
        .map(ed => (math.min(ed.a, ed.b), math.max(ed.a, ed.b)))
        .filter(p => p._1 != p._2).toSet
      val adj = es.flatMap(p => Seq(p._1 -> p._2, p._2 -> p._1))
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
      es.toSeq.map { case (a, b) =>
        adj.getOrElse(a, Set.empty[Long]).toSet
          .intersect(adj.getOrElse(b, Set.empty[Long]).toSet)
          .count(w => w != a && w != b)
      }.sum / 3L
    }
    def probeStats(v: Int): (Long, Long, Long) = {
      val r = spark.read.parquet(s"$dir/batch_id=$v/probe")
        .select("n_pairs", "n_maybe_dup", "n_log_rows_scanned")
        .collect().head
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    batches.zipWithIndex.foreach { case (b, i) =>
      Streams.triIncSink(dir)(b.toDF(), i.toLong)
      val census = Streams.triCensusRead(spark, dir, i.toLong)
        .collect().head.getLong(0)
      assert(census == goldCount(i), s"v$i census $census != ${goldCount(i)}")
      val (nPairs, nMaybe, nScanned) = probeStats(i)
      assert(nPairs == b.map(ed =>
          (math.min(ed.a, ed.b), math.max(ed.a, ed.b))).distinct.size,
        s"v$i probe n_pairs")
      if (i != 5) {
        // all-new batch: the bloom proves every pair new — the exact
        // confirm never touches the changelog, however large history is
        assert(nMaybe == 0 && nScanned == 0,
          s"v$i (all-new) probed $nMaybe candidates / scanned $nScanned " +
            "changelog rows — the bloom front is not filtering")
      } else {
        // the dup batch confirms against ONLY the candidate's bucket
        val historyRows = (0 until i).map(v =>
          batches(v).map(ed =>
            (math.min(ed.a, ed.b), math.max(ed.a, ed.b))).distinct.size)
          .sum.toLong
        assert(nMaybe == 1, s"v5 expected exactly the (1,2) dup candidate")
        assert(nScanned > 0 && nScanned < historyRows,
          s"v5 scanned $nScanned of $historyRows history rows — " +
            "bucket pruning is not happening")
      }
    }
  }

  // ----------------------------------------------------- st_hll_incremental
  test("st_hll_incremental: registers at every version == from-scratch " +
      "register table over keys-so-far (independent md5 gold); delta " +
      "files carry only raised registers; MAX-merge is split-invariant; " +
      "replay is a no-op") {
    val Streams = graft.streaming.Streams
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("hllinc15").toString
    assert(Streams.ccIncCompactEvery == 4L)
    // independent gold: Scala MessageDigest md5, the q_hll_distinct
    // j/rho recurrence re-derived outside Spark (the Round14 gold fn)
    def regsOf(users: Seq[Long]): Map[Long, Long] = {
      def md5hex(s: String): String = java.security.MessageDigest
        .getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      users.distinct.map { u =>
        val h = md5hex(u.toString)
        val j = java.lang.Long.parseLong(h.substring(0, 2), 16) % 64
        val w = java.lang.Long.parseLong(h.substring(2, 12), 16)
        val rho = if (w == 0) 41L
          else 41L - java.lang.Long.toBinaryString(w).length
        (j, rho)
      }.groupBy(_._1).map { case (j, v) => j -> v.map(_._2).max }
    }
    val batches: Seq[Seq[Long]] = Seq(
      (1L to 300L),             // v0
      (200L to 450L),           // v1: overlap — only some registers rise
      (1L to 100L),             // v2: pure replayed CONTENT → empty delta
      (451L to 500L),           // v3
      (50L to 60L))             // v4: COMPACTION (full merged table)
      .map(_.toSeq)
    def readRegs(d: String, v: Long): Map[Long, Long] =
      Streams.hllRegsRead(spark, d, v).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    batches.zipWithIndex.foreach { case (ks, i) =>
      Streams.hllIncSink(dir)(ks.toDF("key"), i.toLong)
      val gold = regsOf(batches.take(i + 1).flatten)
      assert(readRegs(dir, i.toLong) == gold, s"v$i registers != gold")
      val written = spark.read.parquet(s"$dir/batch_id=$i/regs")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val prev = if (i == 0) Map.empty[Long, Long]
        else regsOf(batches.take(i).flatten)
      if (i > 0 && i.toLong % Streams.ccIncCompactEvery == 0L)
        assert(written == gold, s"compaction v$i != full merged table")
      else
        assert(written == gold.filter { case (j, m) => prev.get(j) != Some(m) },
          s"v$i delta is not exactly the raised registers")
    }
    // v2 made the no-news case concrete: zero delta rows
    assert(spark.read.parquet(s"$dir/batch_id=2/regs").count() == 0,
      "a batch with no new information wrote register rows")
    // replay: manifest is the commit marker; content is also
    // harmless-by-algebra (MAX is idempotent)
    val m1 = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/manifest-1")), "UTF-8")
    Streams.hllIncSink(dir)(batches(1).toDF("key"), 1L)
    assert(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/manifest-1")), "UTF-8") == m1 &&
      readRegs(dir, 4L) == regsOf(batches.flatten),
      "replay changed a published version")
    // split invariance: the same keys in ONE batch give the same table
    val dir2 = java.nio.file.Files.createTempDirectory("hllinc15b").toString
    Streams.hllIncSink(dir2)(batches.flatten.toDF("key"), 0L)
    assert(readRegs(dir2, 0L) == regsOf(batches.flatten),
      "one-shot != split feed (MAX-merge broke)")
  }

  // ------------------------------------------------ st_changelog_compact
  test("st_changelog_compact: the changelog folds log-structured — " +
      "segment count == popcount(batches), counts are merged powers of " +
      "two, every version's files hold the accumulated set exactly once " +
      "(multiset), pinned versions keep reading, bloom + probe pruning " +
      "survive the merges; census stays gold") {
    val Streams = graft.streaming.Streams
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("clog15").toString
    def e(a: Long, b: Long) = Streams.CcEdge(a, b)
    val batches: Seq[Seq[Streams.CcEdge]] =
      (0 until 8).map(i => Seq(e(10 * i + 1, 10 * i + 2))) ++
        Seq(Seq(e(1, 2), e(90, 91))) // v8: one DUP + one new
    def manifestLines(v: Long, section: String): Seq[String] = {
      val p = java.nio.file.Paths.get(s"$dir/manifest-$v")
      new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
        .split("\n").filter(_.startsWith(s"$section|")).toSeq
    }
    def accumulated(upTo: Int): Seq[(Long, Long)] = batches.take(upTo + 1)
      .flatten.map(ed => (math.min(ed.a, ed.b), math.max(ed.a, ed.b)))
      .distinct
    batches.zipWithIndex.foreach { case (b, i) =>
      Streams.triIncSink(dir)(b.toDF(), i.toLong)
      // Bentley–Saxe invariant: #segments == popcount(#batches), the
      // per-segment batch-counts are the binary decomposition
      val segs = manifestLines(i.toLong, "edgesseg")
        .map(_.split("\\|").last.toLong)
      assert(segs.size == java.lang.Long.bitCount(i + 1L),
        s"v$i: ${segs.size} segments, expected popcount(${i + 1})")
      assert(segs.sum == i + 1L && segs.forall(c => (c & (c - 1)) == 0),
        s"v$i segment counts $segs are not the binary decomposition")
      // content: the section's files hold the accumulated set EXACTLY
      // once (multiset equality — a row duplicated across segments
      // would double-count in any reader that unions the files)
      val rows = spark.read
        .parquet(manifestLines(i.toLong, "edges").map(_.substring(6)): _*)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      assert(rows == accumulated(i).sorted,
        s"v$i section files != accumulated set (as a multiset)")
    }
    // pinned versions: merges write NEW dirs, so v7's file list (the
    // 8-batch merged segment landed at v7) still resolves after v8
    assert(spark.read
      .parquet(manifestLines(7, "edges").map(_.substring(6)): _*)
      .count() == 8, "a pinned version lost files after later merges")
    // the v8 DUP added zero (census still counts no triangles) and the
    // probe confirmed it against a pruned slice of the merged segment
    assert(Streams.triCensusRead(spark, dir, 8L).collect().head.getLong(0)
      == 0L, "a duplicate edge changed the census")
    val probe8 = spark.read.parquet(s"$dir/batch_id=8/probe")
      .select("n_maybe_dup", "n_log_rows_scanned").collect().head
    assert(probe8.getLong(0) == 1 && probe8.getLong(1) < 8,
      s"v8 probe scanned ${probe8.getLong(1)} rows — pruning lost")
    // an all-new batch after the merges still scans zero changelog rows
    Streams.triIncSink(dir)(Seq(e(95, 96)).toDF(), 9L)
    val probe9 = spark.read.parquet(s"$dir/batch_id=9/probe")
      .select("n_maybe_dup", "n_log_rows_scanned").collect().head
    assert(probe9.getLong(0) == 0 && probe9.getLong(1) == 0,
      "bloom did not survive the merges")
  }

  // ------------------------------------------------- g_resolution_sweep
  test("g_resolution_sweep: the gamma=1 rung IS g_louvain_move's " +
      "partition; community count is non-increasing in gamma's " +
      "coarsening direction; q_ppm peaks where the ladder says") {
    val A = graft.operators.Analytics
    val sweep = A.queries("g_resolution_sweep")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(sweep.map(_._1).toSeq ==
      A.resolutionLadder.map { case (n, d) => n * 1000000L / d },
      "ladder rows missing or misordered")
    // gamma = 1: the rung's partition is g_louvain_move's move table
    // RESOLVED by the hook + 2-cycle + pointer-jump recurrence —
    // replay that recurrence in plain Scala over the published move
    // table and the community counts must agree exactly
    val (nodes0, _) = A.numericGraph(spark, sf)
    val idOf0 = nodes0.select("label", "key", "id").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val hook = A.queries("g_louvain_move")(spark, sf)
      .select("label", "key", "comm").collect()
      .map(r => idOf0((r.getString(0), r.getLong(1))) -> r.getLong(2)).toMap
    val r1 = hook.map { case (id, p) =>
      id -> (if (hook.get(p).contains(id)) math.min(id, p) else p)
    }
    var ptr = r1
    for (_ <- 1 to A.louvainJumps) ptr = ptr.map { case (id, p) => id -> ptr(p) }
    val g1 = sweep.find(_._1 == 1000000L).get
    assert(g1._2 == ptr.values.toSet.size,
      s"gamma=1 n_communities ${g1._2} != resolved move-table's " +
        s"${ptr.values.toSet.size}")
    // a LOWER gamma can only make moving easier (the k_i·k_c penalty
    // shrinks): every node that moved at gamma=1 still moves, targets
    // may differ, but the community count cannot exceed the singleton
    // count and must not increase as gamma decreases on this graph
    val byGamma = sweep.sortBy(_._1).map(_._2)
    assert(byGamma.zip(byGamma.tail).forall { case (lo, hi) => lo <= hi },
      s"community count not monotone along the ladder: ${byGamma.toSeq}")
  }

  // ---------------------------------------------------- g_leiden_refine
  test("g_leiden_refine: Q(refined) >= Q(input) (exact integer Q, " +
      "independent recomputation); every refined community is " +
      "CONNECTED (union-find gold); refinement stays within original " +
      "communities") {
    val A = graft.operators.Analytics
    val out = A.queries("g_leiden_refine")(spark, sf)
      .select("label", "key", "comm", "rcomm").collect()
      .map(r => ((r.getString(0), r.getLong(1)), (r.getLong(2), r.getLong(3))))
      .toMap
    val (nodes, undW) = A.numericGraph(spark, sf)
    val idOf = nodes.select("label", "key", "id").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val edges = undW.select("a", "b", "w").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val commOf = out.map { case (k, v) => idOf(k) -> v._1 }
    val rcommOf = out.map { case (k, v) => idOf(k) -> v._2 }
    // refinement never crosses original communities: rcomm refines comm
    val rcToC = rcommOf.toSeq.groupBy(_._2)
      .map { case (rc, ms) => rc -> ms.map(m => commOf(m._1)).toSet }
    assert(rcToC.values.forall(_.size == 1),
      "a refined community spans two original communities")
    // exact integer Q in the two-level div convention, recomputed here
    def qOf(part: Map[Long, Long]): Long = {
      val wt = edges.map(_._3).sum
      val stats = edges.groupBy(e => part(e._1)).map { case (_, es) =>
        val dSum = es.map(_._3).sum
        val e2in = es.filter(e => part(e._1) == part(e._2)).map(_._3).sum
        (dSum, e2in)
      }
      val e2s = stats.map(_._2).sum
      val dmix = stats.map { case (d, _) => d * ((d * 1000000L) / wt) }.sum
      (e2s * 1000000L) / wt - dmix / wt
    }
    val (qIn, qOut) = (qOf(commOf), qOf(rcommOf))
    assert(qOut >= qIn, s"refinement LOWERED Q: $qIn -> $qOut")
    // connectivity: per refined community, union-find over its induced
    // edges must yield one component
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b, _) =>
      if (rcommOf(a) == rcommOf(b)) {
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
    }
    val comps = rcommOf.keys.groupBy(rcommOf)
      .map { case (rc, ms) => rc -> ms.map(find).toSet.size }
    val disconnected = comps.filter(_._2 > 1)
    assert(disconnected.isEmpty,
      s"refined communities with >1 induced component: $disconnected")
  }
}
