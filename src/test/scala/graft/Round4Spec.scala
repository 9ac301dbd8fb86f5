package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, GraphOps, Relational, Similarity, TextOps}

/** Round-4 features: PQ ANN, decontamination, bag ops, multi-edges,
  * source mix report — semantic invariants the oracle hash can't state
  * directly. */
class Round4Spec extends AnyFunSuite {
  import TestSession._

  test("s_ann_pq: top-k per probe, ADC distances nonnegative and ranked") {
    val out = Similarity.annPq(spark, sf).collect()
    assert(out.nonEmpty)
    out.groupBy(_.getAs[Long]("probe_id")).foreach { case (p, rows) =>
      assert(rows.length <= Similarity.annK, s"probe $p has > k rows")
      val byRn = rows.sortBy(_.getAs[Int]("rn"))
      val dists = byRn.map(_.getAs[Long]("adist"))
      assert(dists.forall(_ >= 0), s"negative ADC distance for probe $p")
      assert(dists.sameElements(dists.sorted),
        s"rank order disagrees with distance order for probe $p")
    }
  }

  test("d_decontaminate: directionality and threshold hold for every pair") {
    val rows = Dedup.decontaminate(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("train_doc") % 97 != 0, s"train side leaked eval: $r")
      assert(r.getAs[Long]("eval_doc") % 97 == 0, s"eval side not eval: $r")
      assert(r.getAs[Long]("inter") >= Dedup.decontMinShared)
      val flagged = r.getAs[Boolean]("contaminated")
      assert(flagged == (4 * r.getAs[Long]("inter") >= 3 * r.getAs[Long]("n_eval")))
    }
  }

  test("q_bag_ops: bag identity |R∩A| + |R\\A| = |R| per key") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .filter(col("l_partkey") % 50 === 0)
    val rCounts = li.filter(col("l_returnflag") === "R")
      .groupBy(col("l_partkey").cast("long").as("part_key"))
      .agg(count(lit(1)).as("n_r")).collect()
      .map(r => r.getAs[Long]("part_key") -> r.getAs[Long]("n_r")).toMap
    val out = Relational.qBagOps(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val k = r.getAs[Long]("part_key")
      assert(r.getAs[Long]("n_inter") + r.getAs[Long]("n_minus") == rCounts.getOrElse(k, 0L),
        s"bag identity broken at part $k: $r")
    }
  }

  test("g_multi_edges: every instance is independently addressable") {
    val rows = GraphOps.multiEdges(spark, sf).collect()
    assert(rows.nonEmpty, "no parallel edges found — discriminator broken?")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_edges") >= 2)
      assert(r.getAs[Long]("n_ids") == r.getAs[Long]("n_edges"),
        s"instance ids collapsed: $r")
    }
  }

  test("m_chunk: chunks tile each payload with the documented overlap") {
    import spark.implicits._
    val media = graft.operators.Multimodal
      .mediaTable(spark, sf).filter(col("doc_id") < 100L)
      .as[graft.operators.Multimodal.MediaRow]
    val lens = media.collect().map(r => r.doc_id -> r.payload.length).toMap
    val rows = graft.operators.Multimodal.chunk(media).collect()
      .groupBy(_.doc_id)
    assert(rows.nonEmpty)
    val W = graft.operators.Multimodal.chunkBytes
    val H = graft.operators.Multimodal.chunkHop
    rows.foreach { case (id, cs) =>
      val sorted = cs.sortBy(_.chunk_idx)
      sorted.zipWithIndex.foreach { case (c, i) =>
        assert(c.chunk_idx == i && c.start == i.toLong * H)
        assert(c.n_bytes == math.min(W, lens(id) - c.start), s"ragged chunk wrong: $c")
      }
      // full coverage: last chunk reaches the payload end
      val last = sorted.last
      assert(last.start + last.n_bytes == lens(id), s"doc $id not covered")
    }
  }

  test("t_ccnet_bucket: per-lang terciles are balanced within 1") {
    val rows = TextOps.ccnetBucket(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("lang")).foreach { case (lang, rs) =>
      val sizes = rs.groupBy(_.getAs[String]("bucket")).view.mapValues(_.length)
      val vals = sizes.values.toSeq
      assert(vals.max - vals.min <= 1, s"$lang buckets unbalanced: $sizes")
    }
  }

  test("q_quantile_sampled: sample is a subset estimate inside the exact range") {
    val r = Relational.qQuantileSampled(spark, sf).collect().head
    assert(r.getAs[Long]("n_sample") > 0)
    assert(r.getAs[Long]("n_sample") < r.getAs[Long]("n_exact"))
    assert(r.getAs[Long]("p50_exact") <= r.getAs[Long]("p90_exact"))
    assert(r.getAs[Long]("p50_sample") <= r.getAs[Long]("p90_sample"))
  }

  test("t_ccnet_bucket_scaled: bucket assignment is monotone in the proxy per lang") {
    val order = Map("head" -> 0, "middle" -> 1, "tail" -> 2)
    val rows = TextOps.ccnetBucketScaled(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("lang")).foreach { case (lang, rs) =>
      // cutoff assignment: a higher proxy can never land in a WORSE
      // bucket than a lower one — the invariant ntile shares
      val sorted = rs.sortBy(r => (-r.getAs[Long]("proxy_ppm"), r.getAs[Long]("doc_id")))
      val ranks = sorted.map(r => order(r.getAs[String]("bucket")))
      assert(ranks.sameElements(ranks.sorted), s"$lang buckets not monotone")
    }
  }

  test("d_pipeline_e2e: final keep is exactly the conjunction of its stages") {
    val rows = Dedup.pipelineE2e(spark, sf).collect()
    assert(rows.nonEmpty)
    var kept = 0
    rows.foreach { r =>
      val expect = r.getAs[Boolean]("quality_ok") && !r.getAs[Boolean]("is_dup") &&
        !r.getAs[Boolean]("is_contaminated") && !r.getAs[Boolean]("is_eval")
      assert(r.getAs[Boolean]("final_keep") == expect, s"gate broken: $r")
      assert(r.getAs[Boolean]("is_eval") == (r.getAs[Long]("doc_id") % 97 == 0))
      if (r.getAs[Boolean]("final_keep")) kept += 1
    }
    assert(kept > 0, "pipeline kept nothing — a stage is over-filtering")
  }

  test("s_ann_recall: hits never exceed k, LSH/PQ recall is positive overall") {
    val rows = Similarity.annRecall(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_exact") <= Similarity.annK)
      assert(r.getAs[Long]("hits_pq") <= r.getAs[Long]("n_exact"))
      assert(r.getAs[Long]("hits_lsh") <= r.getAs[Long]("n_exact"))
    }
    // the indexes must find SOMETHING across the probe set — zero total
    // recall means a broken index, not an unlucky probe
    assert(rows.map(_.getAs[Long]("hits_pq")).sum > 0, "PQ total recall 0")
    assert(rows.map(_.getAs[Long]("hits_lsh")).sum > 0, "LSH total recall 0")
  }

  test("g_modularity: degree masses sum to U, q_ppm consistent with contribs") {
    val rows = graft.operators.Analytics.modularity(spark, sf).collect()
    assert(rows.nonEmpty)
    val dSum = rows.map(_.getAs[Long]("d_sum")).sum
    val e2Sum = rows.map(_.getAs[Long]("e2_in")).sum
    // every undirected edge row contributes one degree endpoint; intra
    // rows are a subset of all rows
    assert(e2Sum <= dSum, s"intra rows $e2Sum exceed edge rows $dSum")
    val num = rows.map(_.getAs[Long]("contrib")).sum
    val q = rows.head.getAs[Long]("q_ppm")
    assert(rows.forall(_.getAs[Long]("q_ppm") == q), "q_ppm not constant")
    assert(q >= -1000000L && q <= 1000000L, s"q_ppm out of range: $q")
    val expect = if (num >= 0) num * 1000000L / (dSum * dSum)
                 else -((-num) * 1000000L / (dSum * dSum))
    assert(q == expect, s"q_ppm $q != recomputed $expect")
  }

  test("GraphX SSSP matches the DataFrame fixed point exactly") {
    val df = graft.operators.Analytics.ssspWeighted(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val gx = graft.operators.GraphXAnalytics.ssspGraphX(spark, sf).collect()
    assert(gx.nonEmpty && gx.length == df.size,
      s"reached sets differ: gx=${gx.length} df=${df.size}")
    gx.foreach { r =>
      val k = (r.getString(0), r.getLong(1))
      assert(df(k) == r.getLong(2), s"distance mismatch at $k")
    }
  }

  test("t_source_stats: shares sum to 1e6 within truncation slack") {
    val rows = TextOps.sourceStats(spark, sf).collect()
    assert(rows.nonEmpty)
    val n = rows.length
    val docShare = rows.map(_.getAs[Long]("doc_share_ppm")).sum
    val tokShare = rows.map(_.getAs[Long]("token_share_ppm")).sum
    assert(docShare <= 1000000L && docShare > 1000000L - n,
      s"doc shares sum $docShare implausible for $n groups")
    assert(tokShare <= 1000000L && tokShare > 1000000L - n,
      s"token shares sum $tokShare implausible for $n groups")
    rows.foreach(r => assert(r.getAs[Long]("pass_ppm") <= 1000000L))
  }
}
