package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Analytics, Dedup, Multimodal, Similarity, TextOps}

/** Round-5 batch 4: algorithm-level invariants for the new operators
  * (the oracle proves cross-engine parity; these prove each op
  * computes what its contract claims) plus the bucketed-join
  * no-Exchange plan audit its doc comment promises. */
class Round5dSpec extends AnyFunSuite {
  import TestSession._

  test("s_mmr: k distinct picks per probe, first pick is the top-rel candidate") {
    val rows = Similarity.mmr(spark, sf).collect()
    val byProbe = rows.groupBy(_.getAs[Long]("probe_id"))
    assert(byProbe.size == 10)
    byProbe.foreach { case (p, rs) =>
      assert(rs.map(_.getAs[Int]("rn")).sorted.toSeq == (1 to Similarity.mmrK),
        s"probe $p selection rounds")
      val cands = rs.map(_.getAs[Long]("cand_id"))
      assert(cands.distinct.length == cands.length, s"probe $p repeated a pick")
    }
    // rn=1 must equal the relevance argmax == s_ann_topk's rank-1 row
    val top1 = Similarity.annTopk(spark, sf)
      .filter(col("rn") === 1).collect()
      .map(r => r.getAs[Long]("probe_id") -> r.getAs[Long]("cand_id")).toMap
    rows.filter(_.getAs[Int]("rn") == 1).foreach { r =>
      assert(top1(r.getAs[Long]("probe_id")) == r.getAs[Long]("cand_id"),
        s"probe ${r.getAs[Long]("probe_id")} first pick != relevance top-1")
    }
    // diversity must bind: some probe's later picks deviate from the
    // pure relevance ranking (otherwise the sim term did nothing)
    val topk = Similarity.annTopk(spark, sf).collect()
      .groupBy(_.getAs[Long]("probe_id"))
      .map { case (p, rs) => p -> rs.sortBy(_.getAs[Int]("rn"))
        .map(_.getAs[Long]("cand_id")).toSeq }
    val deviates = byProbe.exists { case (p, rs) =>
      rs.sortBy(_.getAs[Int]("rn")).map(_.getAs[Long]("cand_id")).toSeq !=
        topk(p)
    }
    assert(deviates, "MMR never deviated from pure relevance order")
  }

  test("s_scalar_quant: per-dim error bounded by the 256-level grid step") {
    val rows = Similarity.scalarQuant(spark, sf).collect()
    assert(rows.length == 500)
    // grid span ≤ 2·1024 ⇒ step ≤ ⌈2048/255⌉ = 9 ⇒ per-dim err² ≤ 81
    rows.foreach { r =>
      val mx = r.getAs[Long]("max_dim_err")
      assert(mx >= 0 && mx <= 81, s"vec ${r.getAs[Long]("vec_id")}: $mx")
      assert(r.getAs[Long]("qerr") >= mx)
    }
  }

  test("d_soft_dedup: weights are exactly 1e6 div cluster size, mass conserved") {
    val rows = Dedup.softDedup(spark, sf).collect()
    assert(rows.length == 500)
    val byCluster = rows.groupBy(_.getAs[Long]("canon_id"))
    byCluster.foreach { case (c, rs) =>
      val n = rs.length.toLong
      rs.foreach { r =>
        assert(r.getAs[Long]("n_members") == n, s"cluster $c size")
        assert(r.getAs[Long]("w_ppm") == 1000000L / n, s"cluster $c weight")
      }
    }
    // matches the cluster op's assignment exactly
    val canon = Dedup.dedupCluster(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("canon_id")).toMap
    rows.foreach(r => assert(
      canon(r.getAs[Long]("doc_id")) == r.getAs[Long]("canon_id")))
  }

  test("t_gopher_quality: keep iff reason ok; rules fire in fixed order") {
    val rows = TextOps.gopherQuality(spark, sf).collect()
    assert(rows.length == 500)
    val valid = Set("ok", "word_count", "word_len", "top_word", "stopword")
    rows.foreach { r =>
      val reason = r.getAs[String]("reason")
      assert(valid(reason))
      assert(r.getAs[Boolean]("keep") == (reason == "ok"))
      val nw = r.getAs[Long]("n_words")
      if (reason != "word_count") assert(nw >= 30 && nw <= 50000)
    }
    assert(rows.exists(_.getAs[String]("reason") != "ok"), "gate never fired")
    assert(rows.exists(_.getAs[Boolean]("keep")), "gate dropped everything")
  }

  test("m_shard_pack: every item packed once, shards are writer-contiguous") {
    val rows = Multimodal.shardPack(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("n_items")).sum == 500)
    // within a writer, shard ordinals start at 0 and doc ranges never
    // overlap (first_doc of shard k+1 past last_doc of shard k)
    rows.groupBy(r => r.getAs[Long]("shard_id") / 1000000L).foreach {
      case (w, shards) =>
        val sorted = shards.sortBy(_.getAs[Long]("shard_id"))
        assert(sorted.head.getAs[Long]("shard_id") == w * 1000000L)
        sorted.sliding(2).foreach {
          case Array(a, b) =>
            assert(a.getAs[Long]("last_doc") < b.getAs[Long]("first_doc"),
              s"writer $w shard ranges overlap")
          case _ =>
        }
    }
  }

  test("g_degree_dist: node and degree mass conserved across buckets") {
    val g = graft.model.PropertyGraph.load(spark, sf)
    val rows = Analytics.degreeDist(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("n_nodes")).sum == g.nodes.count())
    assert(rows.map(_.getAs[Long]("sum_deg")).sum == 2 * g.edges.count())
    rows.foreach { r =>
      val b = r.getAs[Int]("bucket")
      val lo = if (b == 0) 0L else 1L << b
      assert(r.getAs[Long]("min_deg") >= lo)
      assert(r.getAs[Long]("max_deg") < (1L << (b + 1)),
        s"bucket $b max ${r.getAs[Long]("max_deg")}")
    }
  }

  test("src_bucketed_join: co-bucketed tables join with no Exchange") {
    // run once so the tables exist, then audit the executed join plan
    graft.sources.Formats.bucketedJoin(spark, sf).collect()
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table("graft_orders_b").join(
        spark.table("graft_customer_b"),
        col("o_custkey") === col("c_custkey"))
      j.collect()
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
    }
  }

  test("events.ts normalizes to BIGINT nanos whatever the parquet physical type") {
    // The driver has regenerated testdata with ts as TIMESTAMP(NANOS)
    // in one generation and TIMESTAMP(MICROS) in another; every events
    // consumer does integer time arithmetic, so Tables() must always
    // surface BIGINT nanos. Guard the contract, not the generation.
    val ts = graft.model.Tables(spark, sf, "events").schema("ts")
    assert(ts.dataType == org.apache.spark.sql.types.LongType,
      s"events.ts surfaced as ${ts.dataType}")
    // values are plausible epoch NANOS (post-2000: > 9.4e17), not
    // micros/millis — a unit slip here silently shifts every window op
    val mn = graft.model.Tables(spark, sf, "events")
      .agg(min("ts")).head.getLong(0)
    assert(mn > 946684800L * 1000000000L, s"min ts $mn is not epoch nanos")
  }

  test("g_ktruss: full peeling replayed in memory — identical edges and supports") {
    val rows = Analytics.ktruss(spark, sf).collect()
      .map(r => (r.getAs[Long]("p1"), r.getAs[Long]("p2")) -> r.getAs[Long]("support")).toMap
    // independent replay: naive triangle enumeration + peel loop
    val hp = graft.model.Tables(spark, sf, "lineitem")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    var edges = hp.groupBy(_._1).values.flatMap { g =>
      val ps = g.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.toSet
    var sup = Map.empty[(Long, Long), Int]
    var dropped = 1
    var round = 0
    while (round < Analytics.trussIters && dropped > 0) {
      round += 1
      val nbrs = edges.toSeq.flatMap(e => Seq(e._1 -> e._2, e._2 -> e._1))
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
      sup = edges.toSeq.map { case (a, b) =>
        (a, b) -> (nbrs(a) & nbrs(b)).size
      }.toMap
      val kept = edges.filter(e => sup(e) >= Analytics.trussK - 2)
      dropped = edges.size - kept.size
      edges = kept
    }
    assert(rows.keySet == edges, s"edge sets differ: ${rows.size} vs ${edges.size}")
    rows.foreach { case (e, s0) => assert(s0 == sup(e).toLong, s"support of $e") }
  }

  test("src_compaction: the compacted directory has exactly compactTarget part files") {
    graft.sources.Formats.compaction(spark, sf).collect()
    val root = new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft_sources/${spark.sparkContext.applicationId}")
    def parts(name: String): Int = {
      val dirs = new java.io.File(root, java.lang.Integer.toHexString(sf.hashCode))
      new java.io.File(dirs, name).listFiles()
        .count(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    }
    val frag = parts("frag")
    val compact = parts("compact")
    assert(compact == graft.sources.Formats.compactTarget,
      s"expected ${graft.sources.Formats.compactTarget} compacted files, got $compact")
    assert(frag > compact, s"fragmented dir ($frag files) should exceed compacted ($compact)")
  }
}
