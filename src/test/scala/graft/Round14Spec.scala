package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-14 operators: delta-bounded publication for the streaming CC
  * view (the r13 verdict's decisive ask — written rows per version must
  * track the LABEL DIFF, never the node count) and the streaming
  * incremental triangle census (the second streaming-graph
  * materialized view, gold = brute-force census over edges-so-far).
  */
class Round14Spec extends AnyFunSuite {
  import TestSession._

  // ---------------------------------------------------- st_cc_incremental
  test("st_cc_incremental: published label rows per version == the " +
      "version-over-version label diff (delta-bounded, never |V|); " +
      "compaction resets the manifest and preserves every equality") {
    val Streams = graft.streaming.Streams
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ccinc14").toString
    // ccIncCompactEvery = 4, so version 4 is a compaction version
    assert(Streams.ccIncCompactEvery == 4L,
      "test assumes the compaction period is 4 — update the batch plan")
    def e(a: Long, b: Long) = Streams.CcEdge(a, b)
    val batches = Seq(
      Seq(e(1, 2), e(3, 4), e(10, 11)), // v0: 6 first-seen
      Seq(e(2, 3)),                     // v1: merge {1,2}+{3,4} → 3,4 change
      Seq(e(20, 21)),                   // v2: 2 first-seen
      Seq(e(4, 10)),                    // v3: 10,11 relabel → 1
      Seq(e(30, 31)),                   // v4: COMPACTION (full snapshot)
      Seq(e(21, 1)))                    // v5: 20,21 relabel → 1 (post-compaction delta)
    // independent gold: union-find over all edges fed so far, label =
    // component minimum
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
    def labelsAt(v: Long): Map[Long, Long] =
      Streams.ccLabelsRead(spark, dir, v).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    batches.zipWithIndex.foreach { case (b, i) =>
      Streams.ccIncSink(dir)(b.toDF(), i.toLong)
      // composed read == full-recompute gold at EVERY version
      assert(labelsAt(i.toLong) == gold(i), s"version $i labels != gold")
      // the delta-boundedness contract: rows WRITTEN this version are
      // exactly the label diff (first-seen + component-changed nodes)
      val prev = if (i == 0) Map.empty[Long, Long] else gold(i - 1)
      val diff = gold(i).filter { case (id, c) => prev.get(id) != Some(c) }
      if (i.toLong % Streams.ccIncCompactEvery == 0L && i > 0) {
        // compaction version: the FULL snapshot (bucket-partitioned
        // under labsnap/), and the manifest's label store lists ONLY
        // this version's snapshot — no pre-compaction delta files
        val written = spark.read.parquet(s"$dir/batch_id=$i/labsnap")
          .select("id", "comp")
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(written == gold(i), s"compaction v$i snapshot != gold")
        val manifest = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(s"$dir/manifest-$i")), "UTF-8")
        val labelLines = manifest.split("\n")
          .filter(l => l.startsWith("labels|") || l.startsWith("labsnap|"))
        assert(labelLines.nonEmpty &&
          labelLines.forall(l => l.startsWith("labsnap|") &&
            l.contains(s"batch_id=$i/")),
          s"compaction v$i manifest still references pre-compaction label files")
      } else {
        val written = spark.read.parquet(s"$dir/batch_id=$i/labels")
          .select("id", "comp")
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(written == diff,
          s"v$i wrote ${written.size} label rows, expected the " +
            s"${diff.size}-row diff: written=$written diff=$diff")
      }
    }
    // version isolation across the compaction boundary: v3 (delta
    // composition) re-read after v5 landed — unchanged
    assert(labelsAt(3) == gold(3), "a later batch leaked into pinned v3")
    // replay of a pre-compaction batch after compaction: no-op
    val m3 = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/manifest-3")), "UTF-8")
    Streams.ccIncSink(dir)(batches(3).toDF(), 3L)
    assert(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/manifest-3")), "UTF-8") == m3 &&
      labelsAt(5) == gold(5), "replay changed a published version")
  }

  // ----------------------------------------------- st_triangle_incremental
  test("st_triangle_incremental: census at every version == brute-force " +
      "gold over edges-so-far; duplicate edges add zero; replay is a no-op") {
    val Streams = graft.streaming.Streams
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("triinc14").toString
    def e(a: Long, b: Long) = Streams.CcEdge(a, b)
    val batches = Seq(
      // v0: one triangle entirely WITHIN the first batch (the
      // pair/triple within-batch case) + a dangling edge
      Seq(e(1, 2), e(2, 3), e(3, 1), e(4, 5)),
      // v1: 4-1 and 4-2 close (1,2,4); 5-1 closes (1,4,5) through the
      // STORED 4-5 (the cross-batch wedge case)
      Seq(e(4, 1), e(4, 2), e(5, 1)),
      // v2: duplicate edge (replayed content) + reversed duplicate +
      // a self-loop — must all add ZERO; plus a fresh triangle
      // entirely among new nodes (+1 exactly)
      Seq(e(1, 2), e(3, 2), e(6, 6), e(20, 21), e(21, 22), e(20, 22)),
      // v3: two new edges sharing a node, closing two triangles that
      // share edge (2,3): (2,3,6) via 6-2 and 6-3
      Seq(e(6, 2), e(6, 3)))
    def goldCount(upTo: Int): Long = {
      val es = batches.take(upTo + 1).flatten
        .map(ed => (math.min(ed.a, ed.b), math.max(ed.a, ed.b)))
        .filter(p => p._1 != p._2).toSet
      val nodes = es.flatMap(p => Seq(p._1, p._2)).toSeq.sorted
      // simple O(n^3) over the small node set
      val eset = es
      var n = 0L
      for (i <- nodes.indices; j <- i + 1 until nodes.size;
           k <- j + 1 until nodes.size) {
        val (a, b, c) = (nodes(i), nodes(j), nodes(k))
        if (eset((a, b)) && eset((b, c)) && eset((a, c))) n += 1
      }
      n
    }
    def censusAt(v: Long): Long =
      Streams.triCensusRead(spark, dir, v).collect()(0).getLong(0)
    batches.zipWithIndex.foreach { case (b, i) =>
      Streams.triIncSink(dir)(b.toDF(), i.toLong)
      assert(censusAt(i.toLong) == goldCount(i),
        s"version $i census ${censusAt(i.toLong)} != gold ${goldCount(i)}")
    }
    // the duplicate-edge batch specifically added exactly ONE triangle
    assert(censusAt(2) == censusAt(1) + 1,
      "duplicate/reversed/self-loop edges contributed to the census")
    // version isolation: v1 census re-read after v3 landed
    assert(censusAt(1) == goldCount(1), "later batch leaked into pinned v1")
    // at-least-once replay: manifest is the commit marker
    val m2 = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/manifest-2")), "UTF-8")
    Streams.triIncSink(dir)(batches(2).toDF(), 2L)
    assert(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/manifest-2")), "UTF-8") == m2 &&
      censusAt(3) == goldCount(3), "replay changed a published version")
  }

  // ------------------------------------------------------ g_hierarchy_curve
  test("g_hierarchy_curve: 6 levels, communities non-increasing, " +
      "converged tail constant, final Q above the singleton baseline") {
    val rows = SparkEntry.queries("g_hierarchy_curve")(spark, sf).collect()
    assert(rows.length == graft.operators.Analytics.louvainMaxLevels + 1)
    val nc = rows.map(_.getLong(1))
    val q = rows.map(_.getLong(2))
    assert(nc.zip(nc.tail).forall { case (a, b) => b <= a },
      s"community count increased across a level: ${nc.mkString(",")}")
    // once converged (n_communities stops changing at the tail), Q is
    // constant — padding levels are provable no-ops
    assert(q.last > q.head,
      s"final Q ${q.last} not above the singleton baseline ${q.head}")
    // NOTE deliberately absent: per-level Q monotonicity — the curve
    // EXISTS because the synchronous resolution can overshoot (the
    // measured sf0.01 level-3 dip); asserting monotone here would
    // enshrine the sf0.001 coincidence Round13Spec measured.
  }

  // ------------------------------------------------------- hll mergeability
  test("hll register-max fold == registers computed directly from the " +
      "union set (the mergeability claim q_hll_algebra/q_hll_rollup make)") {
    import org.apache.spark.sql.functions._
    // gold: registers from scratch for arbitrary user sets
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
    val a = (1L to 400L)
    val b = (250L to 700L)
    val merged = (regsOf(a).toSeq ++ regsOf(b).toSeq)
      .groupBy(_._1).map { case (j, v) => j -> v.map(_._2).max }
    assert(merged == regsOf((a ++ b)),
      "register-wise max is not the union set's register table")
    // and the SPARK hash arithmetic matches this gold (the hex_slice
    // slices are the same j/w the scala md5 computes)
    val df = spark.range(1, 401).toDF("u")
    val h = md5(col("u").cast("string"))
    val got = df.select(
        (graft.functions.VectorExprs.hexSlice(h, 1, 2) % 64).as("j"),
        graft.functions.VectorExprs.hexSlice(h, 3, 10).as("w"))
      .select(col("j"),
        expr("CAST(CASE WHEN w = 0 THEN 41 ELSE 41 - length(bin(w)) END" +
          " AS BIGINT)").as("rho"))
      .groupBy("j").agg(max("rho").as("mr")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == regsOf(a), "Spark register table != independent md5 gold")
  }

  // ------------------------------------------------ st_degree_incremental
  test("st_degree_incremental: degrees at every version == brute gold; " +
      "delta rows == touched endpoints; compaction pre-aggregates; " +
      "replay is a no-op") {
    val Streams = graft.streaming.Streams
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("deginc14").toString
    def e(a: Long, b: Long) = Streams.CcEdge(a, b)
    val batches = Seq(
      Seq(e(1, 2), e(2, 3), e(4, 5)),
      Seq(e(1, 2), e(3, 2), e(6, 6), e(1, 3)), // dupes + self-loop add 0
      Seq(e(5, 1), e(5, 2)),
      Seq(e(7, 1)),
      Seq(e(8, 1), e(2, 4)),                   // v4: COMPACTION
      Seq(e(9, 2), e(1, 2)))                   // post-compaction delta
    def gold(upTo: Int): Map[Long, Long] = {
      val es = batches.take(upTo + 1).flatten
        .map(ed => (math.min(ed.a, ed.b), math.max(ed.a, ed.b)))
        .filter(p => p._1 != p._2).toSet
      es.toSeq.flatMap(p => Seq(p._1, p._2))
        .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    }
    def degAt(v: Long): Map[Long, Long] =
      Streams.degreesRead(spark, dir, v).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    batches.zipWithIndex.foreach { case (b, i) =>
      Streams.degIncSink(dir)(b.toDF(), i.toLong)
      assert(degAt(i.toLong) == gold(i), s"version $i degrees != gold")
      val written = spark.read.parquet(s"$dir/batch_id=$i/deg")
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1))).collect()(0).getLong(0)
      if (i.toLong % Streams.ccIncCompactEvery == 0L && i > 0)
        assert(written == gold(i).size, s"compaction v$i != full summed table")
      else {
        val touched = gold(i).keySet.filter(k =>
          gold(i)(k) != gold(math.max(i - 1, 0)).getOrElse(k, 0L) || i == 0)
        assert(written == touched.size,
          s"v$i wrote $written delta rows, expected ${touched.size}")
      }
    }
    // version isolation + replay-no-op
    assert(degAt(2) == gold(2), "later batch leaked into pinned v2")
    val m1 = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/manifest-1")), "UTF-8")
    Streams.degIncSink(dir)(batches(1).toDF(), 1L)
    assert(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/manifest-1")), "UTF-8") == m1 &&
      degAt(5) == gold(5), "replay changed a published version")
  }

  // --------------------------------------------------- src_manifest_branch
  test("src_manifest_branch: main@2 references no branch file; " +
      "fast-forwarded main@3 == branch tip as a file set; branch rows " +
      "invisible to main@2 readers") {
    val F = graft.sources.Formats
    // run the op (it builds the chains deterministically)
    val rows = SparkEntry.queries("src_manifest_branch")(spark, sf).collect()
    assert(rows.length == 4)
    val path = new java.io.File(
      System.getProperty("java.io.tmpdir") + "/graft_sources/" +
        spark.sparkContext.applicationId +
        s"/${Integer.toHexString(sf.hashCode)}/manifest_branch").getPath
    val main2 = F.readManifestFiles(path, 2).toSet
    val main3 = F.readManifestFiles(path, 3).toSet
    val branch = new String(java.nio.file.Files.readAllBytes(
      F.branchManifestPath(path, "audit", 1)), "UTF-8")
      .split("\n").filter(_.nonEmpty).toSet
    assert(main2.forall(!_.contains("/gen3/")),
      "main v2 references a branch-landed file")
    assert(branch.exists(_.contains("/gen3/")) && (main2 -- branch).isEmpty,
      "branch tip does not extend main v2")
    assert(main3 == branch,
      "fast-forwarded main v3 != branch tip as a file set")
    // data-level isolation: main@2 readers see no doc_id ≡ 3 (mod 4)
    // even though gen3's files sit in the same tree
    val m2 = spark.read.parquet(main2.toSeq: _*)
    assert(m2.filter(col("doc_id") % 4 === 3).count() == 0,
      "branch rows leaked into the pinned main version")
  }

  // ------------------------------------------------------- q_topk_sketch
  test("q_topk_sketch: the [lo, hi] bound is REAL under data-partition " +
      "sharding (lo < exact occurs) and valid on every published row") {
    val rows = graft.operators.Relational.qTopkSketch(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (lo, hi, exact, inB) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(lo <= exact && exact <= hi && inB == 1L,
        s"bound violated: lo=$lo exact=$exact hi=$hi")
    }
    // the r13 advisor finding: under key-hash sharding lo == exact
    // ALWAYS (each key whole in one shard) — the falsifiable half of
    // the TA bound must actually engage under data-partition sharding
    assert(rows.exists(r => r.getLong(1) < r.getLong(3)),
      "lo == exact on every row — the merge bound is vacuous again")
  }

  // ---------------------------------------------- g_community_connectivity
  test("g_community_connectivity: component counts == independent " +
      "union-find over the induced intra-community edges; covers every " +
      "hierarchy community exactly once") {
    val rows = SparkEntry.queries("g_community_connectivity")(spark, sf)
      .collect()
    val byComm = rows.map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(byComm.size == rows.length, "duplicate community rows")
    // independent gold: hierarchy labels + raw edges → per-community
    // union-find over the induced subgraph
    val hl = graft.operators.Analytics.louvainHierarchy(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    val g = graft.model.PropertyGraph.load(spark, sf)
    val edges = g.edges
      .select("src_label", "src_key", "dst_label", "dst_key").collect()
      .map(r => ((r.getString(0), r.getLong(1)), (r.getString(2), r.getLong(3))))
    val parent = scala.collection.mutable.Map.empty[(String, Long), (String, Long)]
    def find(x: (String, Long)): (String, Long) = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (u, v) =>
      if (hl(u) == hl(v)) { // induced: intra-community only
        val (ru, rv) = (find(u), find(v))
        if (ru != rv) parent(ru) = rv
      }
    }
    val goldComponents = hl.keys.toSeq
      .groupBy(hl)
      .map { case (comm, members) =>
        comm -> (members.size.toLong, members.map(find).toSet.size.toLong)
      }
    assert(byComm.keySet == goldComponents.keySet,
      "op communities != hierarchy communities")
    goldComponents.foreach { case (comm, (nN, nC)) =>
      val (n, c, flag) = byComm(comm)
      assert(n == nN && c == nC && flag == (if (nC == 1) 1L else 0L),
        s"comm $comm: op ($n, $c, $flag) != gold ($nN, $nC)")
    }
    // worst offenders lead the report
    val comps = rows.map(_.getLong(2))
    assert(comps.zip(comps.tail).forall { case (a, b) => a >= b },
      "rows not ordered by n_components desc")
  }
}
