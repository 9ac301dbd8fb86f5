package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** CROSS-OPERATOR consistency: independently-implemented (and
  * independently oracle-checked) operators that share a marginal must
  * agree on it exactly. Each assertion here ties two separate code
  * paths together, so a regression in either one's shared semantics
  * (week arithmetic, hash grouping, label sets, moment math) fails
  * loudly even if both ops still match their own oracles — the class
  * of bug where an op and its oracle drift together. */
class CrossOpConsistencySpec extends AnyFunSuite {
  import TestSession._

  private val Relational = graft.operators.Relational

  test("growth accounting's new-user column is q_retention's cohort size " +
      "and sums to the distinct user count") {
    val ga = Relational.qGrowthAccounting(spark, sf).collect()
      .map(r => r.getAs[Long]("week") -> r.getAs[Long]("n_new")).toMap
    // q_retention's cohort sizes: users by min(week) — an independent path
    val cohorts = Relational.qRetention(spark, sf).collect()
      .filter(_.getAs[Long]("week_offset") == 0L)
      .map(r => r.getAs[Long]("cohort_week") -> r.getAs[Long]("cohort_size"))
      .toMap
    cohorts.foreach { case (w, size) =>
      assert(ga.getOrElse(w, 0L) == size,
        s"week $w: growth n_new ${ga.get(w)} != retention cohort $size")
    }
    val nUsers = graft.model.Tables(spark, sf, "events")
      .select("user_id").distinct().count()
    assert(ga.values.sum == nUsers,
      "sum of n_new != distinct users (every user is new exactly once)")
  }

  test("attribution credits every purchase exactly once per model; " +
      "pit-features has exactly one row per purchase") {
    val nPurchases = graft.model.Tables(spark, sf, "events")
      .filter(col("event_type") === "purchase").count()
    val attr = Relational.qAttribution(spark, sf).collect()
    Seq("first", "last").foreach { m =>
      val n = attr.filter(_.getAs[String]("model") == m)
        .map(_.getAs[Long]("n_conversions")).sum
      assert(n == nPurchases, s"$m-touch credits $n != $nPurchases purchases")
    }
    assert(Relational.qPitFeatures(spark, sf).count() == nPurchases,
      "feature matrix rows != labels")
    // both models credit the same total revenue (it's the same purchases)
    val rev = attr.groupBy(_.getAs[String]("model"))
      .map { case (m, rs) => m -> rs.map(_.getAs[Long]("rev_cents")).sum }
    assert(rev("first") == rev("last"),
      "first- and last-touch credited different total revenue")
  }

  test("q_corr_matrix's (price, qty) cell equals q_corr") {
    val single = Relational.qCorr(spark, sf).collect().head
      .getAs[Double]("corr_qty_price")
    val cell = Relational.qCorrMatrix(spark, sf).collect()
      .find(r => r.getAs[String]("var_a") == "price" &&
        r.getAs[String]("var_b") == "qty" ||
        r.getAs[String]("var_a") == "qty" &&
        r.getAs[String]("var_b") == "price")
      .get.getAs[Double]("corr6")
    assert(cell == single,
      s"matrix cell $cell != q_corr $single (moment math drifted)")
  }

  test("q_cuped and q_did agree on panel sizes and post-period group means") {
    val cuped = Relational.qCuped(spark, sf).collect().head
    val did = Relational.qDid(spark, sf).collect().head
    assert(cuped.getAs[Long]("n_users") == did.getAs[Long]("n_users"))
    assert(cuped.getAs[Long]("n_a") == did.getAs[Long]("n_a"))
    assert(cuped.getAs[Long]("n_b") == did.getAs[Long]("n_b"))
    // cuped's unadjusted post means ARE did's post cells (same split,
    // same groups, same metric — two implementations of one quantity)
    assert(cuped.getAs[Double]("mean_y_a") == did.getAs[Double]("post_a"),
      "group-A post mean differs between cuped and did")
    assert(cuped.getAs[Double]("mean_y_b") == did.getAs[Double]("post_b"),
      "group-B post mean differs between cuped and did")
  }

  test("calendar coverage sums to the corpus day span; bipartite census " +
      "accounts every classified edge") {
    val cg = Relational.qCalendarGaps(spark, sf).collect()
    val dayFrame = graft.model.Tables(spark, sf, "events")
      .selectExpr("ts div 86400000000000 AS day", "event_type")
    cg.foreach { r =>
      val et = r.getAs[String]("event_type")
      val expect = dayFrame.filter(col("event_type") === et)
        .select("day").distinct().count()
      assert(r.getAs[Long]("n_days_present") == expect, s"$et day count")
      assert(r.getAs[Long]("n_days_missing") ==
        r.getAs[Long]("last_day") - r.getAs[Long]("first_day") + 1 - expect,
        s"$et missing-day identity")
    }
    val bc = graft.operators.Analytics.bipartiteCheck(spark, sf)
      .collect().head
    assert(bc.getAs[Long]("n_even") + bc.getAs[Long]("n_odd") ==
      bc.getAs[Long]("n_reached"), "parity classes don't partition the ball")
    assert(bc.getAs[Long]("n_conflict_edges") <=
      bc.getAs[Long]("n_edges_classified"), "more conflicts than edges")
  }
}
