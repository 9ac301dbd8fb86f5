package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object TestSession {
  lazy val spark: SparkSession = GraftSession.local(cpus = 4, appName = "graft-test")
  val sf: String = "/root/testdata/sf0.001"
}

class RelationalSpec extends AnyFunSuite {
  import TestSession._

  test("every query has an oracle and runs non-empty on sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.count() > 0, s"$name returned 0 rows")
    }
  }

  test("entry() smoke") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q1_agg groups and aggregates correctly") {
    val rows = SparkEntry.queries("q1_agg")(spark, sf).collect()
    assert(rows.length == 6) // 3 returnflags x 2 linestatus
    val r = rows.map(r => (r.getString(0), r.getString(1))).toSet
    assert(r.contains(("A", "F")) && r.contains(("N", "O")))
    rows.foreach { row =>
      assert(row.getDouble(row.fieldIndex("sum_disc_price")) <=
             row.getDouble(row.fieldIndex("sum_base_price")))
    }
  }

  test("q_topk returns exactly 20 rows in descending price order") {
    val prices = SparkEntry.queries("q_topk")(spark, sf)
      .collect().map(_.getDouble(2))
    assert(prices.length == 20)
    assert(prices.sameElements(prices.sorted.reverse))
  }

  test("q_events_sessionize: session durations are non-negative") {
    val df = SparkEntry.queries("q_events_sessionize")(spark, sf)
    assert(df.filter(org.apache.spark.sql.functions.col("dur_us") < 0).count() == 0)
  }
}
