package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Analytics, GraphXAnalytics, TextOps}

/** Round-3 features: GraphX alternative paths, sketch properties. */
class Round3Spec extends AnyFunSuite {
  import TestSession._

  test("GraphX pagerank matches the DataFrame fixed point exactly") {
    val df = Analytics.pagerank(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val gx = GraphXAnalytics.pagerankGraphX(spark, sf).collect()
    assert(gx.nonEmpty && gx.length == df.size)
    gx.foreach { r =>
      val k = (r.getString(0), r.getLong(1))
      assert(df(k) == r.getLong(2), s"rank mismatch at $k")
    }
  }

  test("bloom filter has NO false negatives and bounded positions") {
    val rows = TextOps.bloomFilter(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // actual ⇒ maybe: a bloom filter can overreport, never underreport
      assert(r.getAs[Long]("maybe") >= r.getAs[Long]("actual"),
        s"false negative for shingle ${r.getAs[String]("sh")}")
    }
  }

  test("winnowing guarantee: every full window contributes a fingerprint") {
    // density bound: n_fp ≤ number of full windows (n_sh - winW + 1),
    // and ≥ 1 for any doc that appears at all
    val rows = TextOps.winnowing(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nSh = r.getAs[Long]("n_sh")
      val nFp = r.getAs[Long]("n_fp")
      assert(nFp >= 1 && nFp <= nSh - TextOps.winW + 1,
        s"fingerprint count $nFp out of bounds for $nSh shingles")
    }
  }
}
