package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, Multimodal, Similarity, TextOps}

class PipelineOpsSpec extends AnyFunSuite {
  import TestSession._

  test("d_dedup_exact: every doc appears once, canon <= doc_id") {
    val df = Dedup.dedupExact(spark, sf)
    val n = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(df.count() == n)
    assert(df.filter(col("canon_id") > col("doc_id")).count() == 0)
  }

  test("d_ngram_jaccard: planted near-dup pairs found, J > 1/2 holds") {
    val rows = Dedup.ngramJaccard(spark, sf).collect()
    assert(rows.nonEmpty, "expected planted near-dup pairs")
    rows.foreach { r =>
      val inter = r.getAs[Long]("inter"); val uni = r.getAs[Long]("uni")
      assert(2 * inter > uni, s"pair with J <= 1/2 leaked: $inter/$uni")
    }
  }

  test("d_dedup_minhash: candidates overlap ngram-jaccard truth") {
    val mh = Dedup.dedupMinhash(spark, sf)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = Dedup.ngramJaccard(spark, sf)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mh.nonEmpty)
    // LSH is probabilistic but 3 bands x 3 rows at J>0.5 should catch most
    assert((mh intersect truth).size * 2 >= truth.size,
      s"minhash recall too low: ${(mh intersect truth).size}/${truth.size}")
  }

  test("d_dedup_simhash: near-dup pairs at low hamming distance") {
    val rows = Dedup.dedupSimhash(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Long]("hamming") <= 12))
  }

  test("s_ann_topk: exactly k neighbors per probe, descending score") {
    val rows = Similarity.annTopk(spark, sf).collect()
    val byProbe = rows.groupBy(_.getAs[Long]("probe_id"))
    assert(byProbe.size == 10)
    byProbe.values.foreach { rs =>
      assert(rs.length == Similarity.annK)
      val scores = rs.sortBy(_.getAs[Int]("rn")).map(_.getAs[Long]("score"))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
  }

  test("ann LSH scale path: bucketed results are a subset ranked identically") {
    val brute = Similarity.annTopk(spark, sf)
      .select("probe_id", "cand_id", "score").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val lsh = Similarity.annTopkLsh(spark, sf).collect()
    assert(lsh.nonEmpty)
    // every LSH hit that brute force also ranked must carry the same score
    lsh.foreach { r =>
      val k = (r.getAs[Long]("probe_id"), r.getAs[Long]("cand_id"))
      brute.get(k).foreach(s => assert(s == r.getAs[Long]("score")))
    }
  }

  test("t_lang_id: every doc classified into a known language") {
    val langs = TextOps.langId(spark, sf).select("pred_lang")
      .distinct().collect().map(_.getString(0)).toSet
    assert(langs.subsetOf(TextOps.langStopwords.map(_._1).toSet))
  }

  test("t_quality_score: ratios in [0,1], quality in [0,1]") {
    val bad = TextOps.qualityScore(spark, sf)
      .filter(col("stop_ratio") < 0 || col("stop_ratio") > 1 ||
        col("rep_ratio") < 0 || col("rep_ratio") > 1 ||
        col("quality") < 0 || col("quality") > 1).count()
    assert(bad == 0)
  }

  test("t_token_count: bpe tokens >= ws tokens on word text") {
    val bad = TextOps.tokenCount(spark, sf)
      .filter(col("n_bpe_tokens") < col("n_ws_tokens")).count()
    assert(bad == 0)
  }

  test("t_fingerprint: content_fp unique iff text unique; bag_fp order-free") {
    val df = TextOps.fingerprint(spark, sf)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    assert(df.select("content_fp").distinct().count() ==
      docs.select("text").distinct().count())
  }

  test("t_heavy_hitters: CMS estimate never undercounts, exact for giants") {
    val rows = TextOps.heavyHitters(spark, sf).collect()
    assert(rows.length == TextOps.hhTopK)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_est") >= r.getAs[Long]("n_exact"),
        s"CMS undercounted: $r") // structurally impossible if cells are right
    }
  }

  test("s_knn_join: probes are label 1, neighbors label 0, ranks bounded") {
    import org.apache.spark.sql.functions.col
    val rows = graft.operators.Similarity.knnJoin(spark, sf).collect()
    assert(rows.nonEmpty)
    val lbl = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    rows.foreach { r =>
      assert(lbl(r.getLong(0)) == 1 && lbl(r.getLong(2)) == 0,
        s"label contract violated: $r")
      assert(r.getInt(1) >= 1 && r.getInt(1) <= graft.operators.Similarity.knnK)
    }
  }

  test("m_multimodal_meta: all docs decoded, positive dimensions") {
    val rows = Multimodal.multimodalMeta(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("n_media")).sum ==
      spark.read.parquet(s"$sf/documents.parquet").count())
    rows.foreach { r =>
      assert(r.getAs[Long]("n_ok") == r.getAs[Long]("n_media"))
      assert(r.getAs[Long]("sum_width") > 0)
    }
  }
}
