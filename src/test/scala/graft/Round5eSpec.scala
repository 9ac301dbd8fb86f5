package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Analytics, Similarity, TextOps}

/** Round-5 final batch: algorithm-level invariants for the last
  * operators (the oracle proves cross-engine parity; these prove each
  * op computes what its contract claims). */
class Round5eSpec extends AnyFunSuite {
  import TestSession._

  test("s_binary_quant: k rows per probe, hamming in [0, 64], rank follows distance") {
    val rows = Similarity.binaryQuant(spark, sf).collect()
    val byProbe = rows.groupBy(_.getAs[Long]("probe_id"))
    assert(byProbe.size == 10)
    byProbe.foreach { case (p, rs) =>
      assert(rs.map(_.getAs[Int]("rn")).sorted.toSeq == (1 to Similarity.bqK),
        s"probe $p ranks")
      rs.foreach { r =>
        val h = r.getAs[Long]("hamming")
        assert(h >= 0 && h <= 64, s"probe $p hamming $h out of range")
      }
      // rank order must be non-decreasing in hamming
      val sorted = rs.sortBy(_.getAs[Int]("rn")).map(_.getAs[Long]("hamming"))
      assert(sorted.zip(sorted.tail).forall { case (a, b) => a <= b },
        s"probe $p rank order violates hamming order: ${sorted.mkString(",")}")
    }
  }

  test("s_quant_eval: hits bounded by n_exact, recall_ppm is the exact floor ratio") {
    val rows = Similarity.quantEval(spark, sf).collect()
    assert(rows.length == 10)
    var total = 0L
    rows.foreach { r =>
      val (n, h, ppm) = (r.getAs[Long]("n_exact"), r.getAs[Long]("hits_bq"),
        r.getAs[Long]("recall_ppm"))
      assert(h <= n, s"hits $h exceed exact $n")
      assert(ppm == h * 1000000L / n, s"ppm $ppm is not floor($h*1e6/$n)")
      total += h
    }
    assert(total > 0, "binary quantization recalled nothing at all")
  }

  test("t_rule_ablation: sole-fails bounded by fails, gate reasons bounded by independent fails") {
    val abl = TextOps.ruleAblation(spark, sf).collect()
      .map(r => r.getAs[String]("rule") ->
        ((r.getAs[Long]("n_fail"), r.getAs[Long]("n_sole_fail")))).toMap
    assert(abl.keySet == Set("1_word_count", "2_word_len", "3_top_word", "4_stopword"))
    abl.foreach { case (rule, (f, sole)) =>
      assert(sole <= f, s"$rule sole-fails $sole exceed fails $f")
    }
    // the gate's first-fail census: docs with reason=r all fail rule r
    // independently, so each reason count is bounded by the ablation fails
    val reasons = TextOps.gopherQuality(spark, sf).groupBy("reason").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val ruleOf = Map("word_count" -> "1_word_count", "word_len" -> "2_word_len",
      "top_word" -> "3_top_word", "stopword" -> "4_stopword")
    ruleOf.foreach { case (reason, rule) =>
      assert(reasons.getOrElse(reason, 0L) <= abl(rule)._1,
        s"gate reason '$reason' count exceeds independent failures of $rule")
    }
  }

  test("g_edge_type_stats: edge mass conserved, fan ratios at least one edge per endpoint") {
    val rows = Analytics.edgeTypeStats(spark, sf).collect()
    val g = graft.model.PropertyGraph.load(spark, sf)
    assert(rows.map(_.getAs[Long]("n_edges")).sum == g.edges.count(),
      "per-triple edge counts must cover every edge exactly once")
    rows.foreach { r =>
      assert(r.getAs[Long]("out_ppm") >= 1000000L, s"out fan < 1: $r")
      assert(r.getAs[Long]("in_ppm") >= 1000000L, s"in fan < 1: $r")
      assert(r.getAs[Long]("n_src") <= r.getAs[Long]("n_edges"))
      assert(r.getAs[Long]("n_dst") <= r.getAs[Long]("n_edges"))
    }
  }

  test("s_range_search: every returned pair satisfies the integer radius inequality") {
    val rows = Similarity.rangeSearch(spark, sf).collect()
    rows.foreach { r =>
      val (dp, na, nb) = (r.getAs[Long]("dp"), r.getAs[Long]("na"),
        r.getAs[Long]("nb"))
      assert(dp > 0, s"non-positive dp in result: $r")
      assert(100L * dp * dp > 9L * na * nb, s"pair below radius: $r")
      assert(r.getAs[Long]("probe_id") < 10)
    }
  }
}
