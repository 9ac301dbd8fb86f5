package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.Streams
import graft.streaming.Streams.Event

/** E-block specs: drive the streaming transformations through
  * MemoryStream micro-batches — watermark advance, state expiry, and
  * agreement with the batch twins. */
class StreamsSpec extends AnyFunSuite {
  import TestSession._

  private val hourUs = 3600L * 1000 * 1000
  private def ev(id: Long, us: Long, user: Long = 1L,
                 typ: String = "click", v: Double = 1.0): Event =
    Event(id, us * 1000, user, typ, v) // Event.ts is nanos

  test("st_tumbling_agg: windows close when the watermark passes") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = Streams.tumblingAgg(mem.toDF())
      .writeStream.format("memory").queryName("tumbling")
      .outputMode("append").start()
    try {
      mem.addData(ev(1, 10), ev(2, 20), ev(3, hourUs + 5))
      q.processAllAvailable()
      // watermark still inside hour 0+1h horizon -> nothing final yet
      mem.addData(ev(4, 3 * hourUs)) // advances watermark past hour 0
      q.processAllAvailable()
      val out = spark.table("tumbling").collect()
      assert(out.exists(r => r.getAs[Long]("n_events") == 2), // hour 0
        s"hour-0 window should have closed with 2 events: ${out.mkString(";")}")
    } finally q.stop()
  }

  test("st_stateful_dedup: duplicate ids dropped within watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = Streams.statefulDedup(mem.toDF())
      .writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()
    try {
      mem.addData(ev(1, 10), ev(1, 20), ev(2, 30))
      q.processAllAvailable()
      mem.addData(ev(1, 40), ev(3, 50))
      q.processAllAvailable()
      val ids = spark.table("dedup").select("event_id")
        .collect().map(_.getLong(0))
      assert(ids.sorted.sameElements(Array(1L, 2L, 3L)),
        s"expected each id once, got ${ids.mkString(",")}")
    } finally q.stop()
  }

  test("st_sessionize: 30-min gap splits sessions, emitted on gap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = Streams.sessionize(mem.toDS())
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      // base offset off epoch 0: rows with ets <= the initial watermark
      // (0) are dropped by the stateful-op late filter
      val base = 86400L * 1000 * 1000
      // session 1: two events 10 min apart; then a 40-min gap
      mem.addData(ev(1, base), ev(2, base + 600L * 1000 * 1000))
      q.processAllAvailable()
      mem.addData(ev(3, base + 3000L * 1000 * 1000)) // 40 min after last
      q.processAllAvailable()
      val out = spark.table("sessions").collect()
      assert(out.length == 1, s"one closed session expected: ${out.mkString(";")}")
      val s0 = out.head
      assert(s0.getAs[Long]("n_events") == 2)
      assert(s0.getAs[Long]("session_end_us") == base + 600L * 1000 * 1000)
    } finally q.stop()
  }

  test("st_stream_join: purchase pairs with click inside the hour") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = Streams.streamJoin(mem.toDF())
      .writeStream.format("memory").queryName("funnel")
      .outputMode("append").start()
    try {
      val base = 86400L * 1000 * 1000
      mem.addData(
        ev(1, base, typ = "click"),
        ev(2, base + 600L * 1000 * 1000, typ = "purchase"), // +10 min: pairs
        ev(3, base + 2 * hourUs, typ = "purchase"))         // +2 h: too late
      q.processAllAvailable()
      val out = spark.table("funnel").collect()
      assert(out.length == 1, s"one pair expected: ${out.mkString(";")}")
      assert(out.head.getAs[Long]("click_id") == 1L &&
        out.head.getAs[Long]("purchase_id") == 2L &&
        out.head.getAs[Long]("delay_us") == 600L * 1000 * 1000)
    } finally q.stop()
  }

  test("st_stream_asof: purchases match the latest prior click") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = Streams.streamAsof(mem.toDS())
      .writeStream.format("memory").queryName("asof")
      .outputMode("append").start()
    try {
      val base = 86400L * 1000 * 1000
      val min10 = 600L * 1000 * 1000
      // batch 1: click, purchase (matches), newer click
      mem.addData(
        ev(1, base, typ = "click"),
        ev(2, base + min10, typ = "purchase"),
        ev(3, base + 2 * min10, typ = "click"))
      q.processAllAvailable()
      // batch 2: purchase must match click 3 (latest), not click 1
      mem.addData(ev(4, base + 3 * min10, typ = "purchase"))
      q.processAllAvailable()
      // watermark-correct semantics: events finalize only once the
      // watermark passes them — push it past everything with a
      // sentinel click from an unrelated user (clicks emit nothing)
      mem.addData(ev(99, base + 10 * hourUs, user = 999L, typ = "click"))
      q.processAllAvailable()
      val out = spark.table("asof").collect()
        .map(r => r.getAs[Long]("purchase_id") -> r.getAs[Long]("click_us")).toMap
      assert(out == Map(2L -> base, 4L -> (base + 2 * min10)),
        s"unexpected matches: $out")
    } finally q.stop()
  }

  test("st_stream_asof: in-watermark late click IS retro-matched") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = Streams.streamAsof(mem.toDS())
      .writeStream.format("memory").queryName("asof_late")
      .outputMode("append").start()
    try {
      val base = 86400L * 1000 * 1000
      val min10 = 600L * 1000 * 1000
      // batch 1: a purchase arrives first
      mem.addData(ev(2, base + 2 * min10, typ = "purchase"))
      q.processAllAvailable()
      // batch 2: a click with an EARLIER event time arrives late but
      // well inside the 1 h watermark — the round-2 eager-emit version
      // missed this match (the divergence the advisor flagged)
      mem.addData(ev(1, base + min10, typ = "click"))
      q.processAllAvailable()
      mem.addData(ev(99, base + 10 * hourUs, user = 999L, typ = "click"))
      q.processAllAvailable()
      val out = spark.table("asof_late").collect()
        .map(r => r.getAs[Long]("purchase_id") -> r.getAs[Long]("click_us")).toMap
      assert(out == Map(2L -> (base + min10)),
        s"late click not retro-matched: $out")
    } finally q.stop()
  }

  test("st_stream_asof: click survives a finalize-wake — purchase inside the horizon still matches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = Streams.streamAsof(mem.toDS())
      .writeStream.format("memory").queryName("asof_wake")
      .outputMode("append").start()
    try {
      val base = 86400L * 1000 * 1000
      val min10 = 600L * 1000 * 1000
      // batch 1: user 1 clicks
      mem.addData(ev(1, base, typ = "click"))
      q.processAllAvailable()
      // batch 2: sentinel user advances the watermark to base+10min —
      // the finalize-wake for user 1 fires with empty rows, drains the
      // buffer (lastClick := base). The pre-fix code removed state here.
      mem.addData(ev(99, base + hourUs + min10, user = 999L, typ = "click"))
      q.processAllAvailable()
      // batch 3: purchase 30 min after the click — inside the 1 h
      // horizon and above the watermark, so the batch twin matches it
      mem.addData(ev(2, base + 3 * min10, typ = "purchase"))
      q.processAllAvailable()
      // flush: advance the watermark past the purchase to finalize it
      mem.addData(ev(98, base + 3 * hourUs, user = 999L, typ = "click"))
      q.processAllAvailable()
      val out = spark.table("asof_wake").collect()
        .map(r => r.getAs[Long]("purchase_id") -> r.getAs[Long]("click_us")).toMap
      assert(out == Map(2L -> base),
        s"click forgotten by finalize-wake, purchase unmatched: $out")
    } finally q.stop()
  }

  test("batch twin equivalence: streamAsof over one batch matches q_events_asof") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = Streams.streamAsof(mem.toDS())
      .writeStream.format("memory").queryName("asof_twin")
      .outputMode("append").start()
    try {
      val events = graft.model.Tables(spark, sf, "events")
        .select("event_id", "ts", "user_id", "event_type", "value")
        .as[Event].collect()
      mem.addData(events.toIndexedSeq)
      q.processAllAvailable()
      // flush: a sentinel click (unrelated user, emits nothing) far
      // past the max event time finalizes every buffered event
      val maxUs = events.map(_.ts / 1000).max
      mem.addData(ev(-1, maxUs + 10 * hourUs, user = -999L, typ = "click"))
      q.processAllAvailable()
      val streamed = spark.table("asof_twin")
        .select("user_id", "purchase_id", "purchase_us", "click_us", "delay_us")
      val twin = SparkEntry.queries("q_events_asof")(spark, sf)
      assert(streamed.except(twin).count() == 0)
      assert(twin.except(streamed).count() == 0)
    } finally q.stop()
  }

  test("st_new_vs_returning: out-of-order day arrival classified like the batch twin, exactly once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = Streams.newVsReturningStream(mem.toDS())
      .writeStream.format("memory").queryName("nvr")
      .outputMode("append").start()
    try {
      val dayUs = 86400L * 1000 * 1000
      // batch 1: user 1 active on day 4 (00:20)
      mem.addData(ev(1, 4 * dayUs + 20 * 60 * 1000000L, user = 1))
      q.processAllAvailable()
      // batch 2: user 1's day-3 event arrives LATE but inside the 1-h
      // watermark (23:50 vs the 00:20 that set wm to 23:20) — the
      // batch twin calls day 3 the NEW day; the stream must agree
      mem.addData(ev(2, 4 * dayUs - 10 * 60 * 1000000L, user = 1))
      q.processAllAvailable()
      // the watermark (day-3 23:20, set by batch 1) already covers
      // day 3's START, so day 3 finalizes right here — as NEW, even
      // though day 4 arrived first; day 4 must still be pending (its
      // start is past the watermark)
      val mid = spark.table("nvr").collect()
        .map(r => (r.getAs[Long]("day"), r.getAs[Boolean]("is_new")))
      assert(mid.sameElements(Array((3L, true))),
        s"expected only day 3 (new) finalized: ${mid.mkString(",")}")
      // advance the watermark far past both days, then flush timeouts
      mem.addData(ev(3, 40 * dayUs, user = 9))
      q.processAllAvailable()
      mem.addData(ev(4, 41 * dayUs, user = 9))
      q.processAllAvailable()
      val u1 = spark.table("nvr").filter(col("user_id") === 1L).collect()
        .map(r => (r.getAs[Long]("day"), r.getAs[Boolean]("is_new"))).sorted
      assert(u1.sameElements(Array((3L, true), (4L, false))),
        s"expected day 3 new / day 4 returning: ${u1.mkString(",")}")
      // exactly-once: a re-arrival of an already-finalized day (same
      // day as the watermark frontier) must not re-emit
      mem.addData(ev(5, 41 * dayUs + 1000000L, user = 9))
      q.processAllAvailable()
      assert(spark.table("nvr").filter(col("user_id") === 1L).count() == 2)
    } finally q.stop()
  }

  test("batch twin equivalence: newVsReturningStream replay matches q_new_vs_returning") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = graft.model.Tables(spark, sf, "events")
      .selectExpr("event_id", "ts", "user_id", "event_type", "value")
      .as[Streams.Event].collect()
    val maxUs = events.map(_.ts / 1000).max
    val mem = MemoryStream[Streams.Event]
    val q = Streams.newVsReturningStream(mem.toDS())
      .writeStream.format("memory").queryName("nvr_twin")
      .outputMode("append").start()
    try {
      mem.addData(events.toIndexedSeq: _*)
      q.processAllAvailable()
      // sentinel pushes the watermark past every corpus day start,
      // then one more batch flushes the armed timeouts
      mem.addData(Streams.Event(-1, (maxUs + 40L * 86400000000L) * 1000,
        -999L, "click", 0.0))
      q.processAllAvailable()
      mem.addData(Streams.Event(-2, (maxUs + 41L * 86400000000L) * 1000,
        -999L, "click", 0.0))
      q.processAllAvailable()
      val streamed = spark.table("nvr_twin")
        .filter(col("user_id") >= 0)
        .groupBy("day")
        .agg(count(when(col("is_new"), 1)).as("n_new"),
          count(when(!col("is_new"), 1)).as("n_returning"))
      val twin = SparkEntry.queries("q_new_vs_returning")(spark, sf)
      assert(streamed.except(twin).count() == 0)
      assert(twin.except(streamed).count() == 0)
    } finally q.stop()
  }

  test("st_histogram: per-window buckets, watermark-closed, exactly-once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = Streams.histogramStream(mem.toDF())
      .writeStream.format("memory").queryName("ev_hist")
      .outputMode("append").start()
    try {
      // hour 0: $3.00 and $4.99 → bucket 0 ($5 bins), $7.50 → bucket 1
      mem.addData(ev(1, 10, v = 3.00), ev(2, 20, v = 4.99),
        ev(3, 30, v = 7.50))
      q.processAllAvailable()
      assert(spark.table("ev_hist").isEmpty,
        "nothing may emit before the watermark closes the window")
      mem.addData(ev(4, 3 * hourUs, v = 1.0)) // pushes watermark past hour 0
      q.processAllAvailable()
      val out = spark.table("ev_hist").filter(col("hour_start") === 0L)
        .collect().sortBy(_.getAs[Long]("bucket"))
      assert(out.map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("n_events"),
        r.getAs[Double]("total_value")))
        .sameElements(Array((0L, 2L, 7.99), (1L, 1L, 7.5))),
        s"hour-0 histogram wrong: ${out.mkString(";")}")
    } finally q.stop()
  }

  test("batch twin equivalence: histogramStream on static frame matches q_events_histogram") {
    val events = graft.model.Tables(spark, sf, "events")
    val streamShaped = Streams.histogramStream(events)
      .select("hour_start", "bucket", "n_events", "total_value")
    val twin = SparkEntry.queries("q_events_histogram")(spark, sf)
      .select("hour_start", "bucket", "n_events", "total_value")
    assert(streamShaped.except(twin).count() == 0)
    assert(twin.except(streamShaped).count() == 0)
  }

  test("st_outer_join: unmatched click null-pads exactly once when the watermark closes its window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = Streams.streamOuterJoin(mem.toDF())
      .writeStream.format("memory").queryName("outer_funnel")
      .outputMode("append").start()
    try {
      val base = 86400L * 1000 * 1000
      mem.addData(
        ev(1, base, user = 1, typ = "click"),
        ev(2, base + 600L * 1000 * 1000, user = 1, typ = "purchase"), // pairs
        ev(3, base, user = 2, typ = "click"))                         // never converts
      q.processAllAvailable()
      // matched pair emits in-stream; the unmatched click must NOT
      // have null-padded yet (its window is still open)
      val early = spark.table("outer_funnel").collect()
      assert(early.count(_.getAs[Any]("purchase_id") == null) == 0,
        s"null-padded before the watermark closed the window: ${early.mkString(";")}")
      // advance BOTH sides' watermarks far past base+1h+1h (the global
      // watermark is their min), then one more batch to flush eviction;
      // clicks and purchases ride DIFFERENT users so the advancing
      // events can never pair with anything
      mem.addData(ev(4, base + 6 * hourUs, user = 8, typ = "click"),
        ev(5, base + 6 * hourUs, user = 9, typ = "purchase"))
      q.processAllAvailable()
      mem.addData(ev(6, base + 7 * hourUs, user = 8, typ = "click"),
        ev(7, base + 7 * hourUs, user = 9, typ = "purchase"))
      q.processAllAvailable()
      val out = spark.table("outer_funnel").collect()
      val matched = out.filter(_.getAs[Any]("purchase_id") != null)
      assert(matched.length == 1 &&
        matched.head.getAs[Long]("click_id") == 1L &&
        matched.head.getAs[Long]("purchase_id") == 2L &&
        matched.head.getAs[Long]("delay_us") == 600L * 1000 * 1000,
        s"matched pair wrong: ${out.mkString(";")}")
      val padded = out.filter(_.getAs[Any]("purchase_id") == null)
        .filter(_.getAs[Long]("user_id") == 2L)
      assert(padded.length == 1 &&
        padded.head.getAs[Long]("click_id") == 3L &&
        padded.head.getAs[Any]("delay_us") == null,
        s"expected exactly one null-padded row for click 3: ${out.mkString(";")}")
      // the matched click must never ALSO null-pad
      assert(!out.exists(r => r.getAs[Long]("click_id") == 1L &&
        r.getAs[Any]("purchase_id") == null),
        "matched click also emitted a null-padded row")
      // exactly-once: a further watermark advance must not re-emit
      mem.addData(ev(8, base + 9 * hourUs, user = 9, typ = "purchase"))
      q.processAllAvailable()
      assert(spark.table("outer_funnel").collect()
        .count(r => r.getAs[Any]("purchase_id") == null &&
          r.getAs[Long]("user_id") == 2L) == 1,
        "unmatched click re-emitted after a later watermark advance")
    } finally q.stop()
  }

  test("batch twin equivalence: streamOuterJoin on static frame matches q_events_funnel_outer") {
    val events = graft.model.Tables(spark, sf, "events")
    val streamShaped = Streams.streamOuterJoin(events)
      .select("user_id", "click_id", "purchase_id", "delay_us")
    val twin = SparkEntry.queries("q_events_funnel_outer")(spark, sf)
      .select("user_id", "click_id", "purchase_id", "delay_us")
    assert(streamShaped.except(twin).count() == 0)
    assert(twin.except(streamShaped).count() == 0)
  }

  test("batch twin equivalence: streamJoin on static frame matches q_events_funnel") {
    val events = graft.model.Tables(spark, sf, "events")
    val streamShaped = Streams.streamJoin(events)
      .select("user_id", "click_id", "purchase_id", "delay_us")
    val twin = SparkEntry.queries("q_events_funnel")(spark, sf)
      .select("user_id", "click_id", "purchase_id", "delay_us")
    assert(streamShaped.except(twin).count() == 0)
    assert(twin.except(streamShaped).count() == 0)
  }

  test("st_heavy_hitters: ranked top-k per window, late events counted, exactly-once emission") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = Streams.heavyHittersStream(mem.toDS())
      .writeStream.format("memory").queryName("hh")
      .outputMode("append").start()
    try {
      // hour 0: user 1 ×2, user 2 ×1, user 3 ×1; hour 1: one event
      mem.addData(ev(1, 10, user = 1), ev(2, 20, user = 1),
        ev(3, 30, user = 2), ev(4, 40, user = 3), ev(5, hourUs + 5, user = 9))
      q.processAllAvailable()
      assert(spark.table("hh").isEmpty, "nothing may emit before the window closes")
      // LATE hour-0 event (inside the 1h watermark) must still count...
      mem.addData(ev(6, 50, user = 2))
      q.processAllAvailable()
      // ...then far-future event pushes the watermark past hour-0's end
      mem.addData(ev(7, 4 * hourUs, user = 9))
      q.processAllAvailable()
      val out = spark.table("hh")
        .filter(col("win_start_us") === 0L).collect()
        .sortBy(_.getAs[Int]("rank"))
      assert(out.length == Streams.hhK, s"expected top-${Streams.hhK}: ${out.mkString(";")}")
      // users 1 and 2 tie at n=2 — rank breaks by user id; user 3 has 1
      assert(out.map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n"), r.getAs[Int]("rank")))
        .sameElements(Array((1L, 2L, 1), (2L, 2L, 2), (3L, 1L, 3))), out.mkString(";"))
      // exactly-once: closing more windows must not re-emit hour 0
      mem.addData(ev(8, 8 * hourUs, user = 9))
      q.processAllAvailable()
      assert(spark.table("hh").filter(col("win_start_us") === 0L).count() == Streams.hhK)
    } finally q.stop()
  }

  test("st_embed_batch: streamed micro-batches match the batch embedding op") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = graft.operators.Multimodal.embedRows(mem.toDS())
      .writeStream.format("memory").queryName("embed_stream")
      .outputMode("append").start()
    try {
      val docRows = spark.read.parquet(s"$sf/documents.parquet")
        .select("doc_id", "text").as[(Long, String)].collect()
      // two micro-batches — batch composition differs from the batch op
      val (b1, b2) = docRows.splitAt(docRows.length / 2)
      mem.addData(b1.toIndexedSeq); mem.addData(b2.toIndexedSeq)
      q.processAllAvailable()
      val streamed = spark.table("embed_stream")
      val twin = SparkEntry.queries("m_embed_batch")(spark, sf)
      assert(streamed.except(twin).count() == 0)
      assert(twin.except(streamed).count() == 0)
    } finally q.stop()
  }

  test("st_chunk: streamed micro-batches match the batch chunking op") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[graft.operators.Multimodal.MediaRow]
    val q = graft.operators.Multimodal.chunk(mem.toDS())
      .writeStream.format("memory").queryName("chunk_stream")
      .outputMode("append").start()
    try {
      val rows = graft.operators.Multimodal.mediaTable(spark, sf)
        .filter(col("doc_id") < 100L)
        .as[graft.operators.Multimodal.MediaRow].collect()
      // micro-batch composition differs from the batch op's partitioning
      val (b1, b2) = rows.splitAt(rows.length / 3)
      mem.addData(b1.toIndexedSeq); mem.addData(b2.toIndexedSeq)
      q.processAllAvailable()
      val streamed = spark.table("chunk_stream")
      val twin = SparkEntry.queries("m_chunk")(spark, sf)
      assert(streamed.except(twin).count() == 0)
      assert(twin.except(streamed).count() == 0)
    } finally q.stop()
  }

  test("st_scene_detect: streamed micro-batches match the batch scene op") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[graft.operators.Multimodal.MediaRow]
    // the SAME transform as m_scene_detect — per-doc scene census is
    // stateless (frames never cross rows), so any micro-batch split
    // must reproduce the batch op exactly
    val q = graft.operators.Multimodal.sceneDetect(mem.toDS())
      .writeStream.format("memory").queryName("scene_stream")
      .outputMode("append").start()
    try {
      val rows = graft.operators.Multimodal.mediaTable(spark, sf)
        .as[graft.operators.Multimodal.MediaRow].collect()
      val (b1, b2) = rows.splitAt(rows.length / 4)
      mem.addData(b1.toIndexedSeq); mem.addData(b2.toIndexedSeq)
      q.processAllAvailable()
      val streamed = spark.table("scene_stream")
      val twin = SparkEntry.queries("m_scene_detect")(spark, sf)
      assert(streamed.except(twin).count() == 0)
      assert(twin.except(streamed).count() == 0)
    } finally q.stop()
  }

  test("st_sliding_agg: slidingAgg on static frame matches q_events_sliding") {
    val events = graft.model.Tables(spark, sf, "events")
    val streamShaped = Streams.slidingAgg(events)
      .select(unix_timestamp(col("win_start")).as("win_start"),
        col("event_type"), col("n_events"), col("total_value"))
    val twin = SparkEntry.queries("q_events_sliding")(spark, sf)
    assert(streamShaped.except(twin).count() == 0)
    assert(twin.except(streamShaped).count() == 0)
  }

  test("batch twin equivalence: sessionizeNative matches q_events_sessionize") {
    val events = graft.model.Tables(spark, sf, "events")
    val streamShaped = Streams.sessionizeNative(events)
      .select(col("user_id"), col("session_start_us"), col("n_events"))
    val twin = SparkEntry.queries("q_events_sessionize")(spark, sf)
      .select(col("user_id"), col("start_us").as("session_start_us"),
        col("n_events"))
    assert(streamShaped.except(twin).count() == 0,
      "native session_window produced sessions the lag/cumsum twin lacks")
    assert(twin.except(streamShaped).count() == 0,
      "lag/cumsum twin produced sessions native session_window lacks")
  }

  test("st_session_native: sessions merge across micro-batches, close at watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = Streams.sessionizeNative(mem.toDF())
      .writeStream.format("memory").queryName("sess_native")
      .outputMode("append").start()
    try {
      val m15 = 15L * 60 * 1000 * 1000
      // two fragments 15 min apart arrive in DIFFERENT micro-batches —
      // the state store must merge them into one session
      mem.addData(ev(1, 0, user = 7), ev(2, 1, user = 7))
      q.processAllAvailable()
      mem.addData(ev(3, m15, user = 7))
      q.processAllAvailable()
      // EXACT-gap boundary: both twins keep an event exactly gapUs
      // after the previous one in the SAME session (strict-greater
      // split) — the +1µs session_window gap must match that
      mem.addData(ev(4, m15 + Streams.gapUs, user = 7))
      q.processAllAvailable()
      mem.addData(ev(5, 10 * hourUs, user = 7)) // watermark closes it
      q.processAllAvailable()
      val out = spark.table("sess_native")
        .filter(col("session_start_us") === 0L).collect()
      assert(out.length == 1,
        s"fragments did not merge (exact-gap event split?): ${out.mkString(";")}")
      assert(out(0).getAs[Long]("n_events") == 4, out(0).toString)
    } finally q.stop()
  }

  test("batch twin equivalence: tumblingAgg on static frame matches q_events_window") {
    val events = graft.model.Tables(spark, sf, "events")
    // total_value included: both sides sum DECIMAL, so the comparison is
    // exact — raw double sums would be merge-order-dependent
    val streamShaped = Streams.tumblingAgg(events)
      .select((unix_timestamp(col("hour_start"))).as("hour_start"),
        col("event_type"), col("n_events"), col("total_value"))
    val twin = SparkEntry.queries("q_events_window")(spark, sf)
      .select(col("hour_start"), col("event_type"), col("n_events"),
        col("total_value"))
    assert(streamShaped.except(twin).count() == 0)
    assert(twin.except(streamShaped).count() == 0)
  }

  test("file-source ingestion: explicit schema, incremental discovery across runs") {
    // the production ingestion path (readStream over a landing
    // directory) — MemoryStream covers the transform specs; this
    // proves the FILE source end: explicit schema (an inference pass
    // is an extra full scan at 100 TB), and checkpointed file
    // discovery (a restarted query picks up only NEW files)
    val dir = java.nio.file.Files.createTempDirectory("fsrc").toString
    val ck = java.nio.file.Files.createTempDirectory("fsrc_ck").toString
    val out = java.nio.file.Files.createTempDirectory("fsrc_out").toString
    val ev = graft.model.Tables(spark, sf, "events")
      .orderBy("event_id").limit(30).cache()
    val schema = ev.schema
    ev.filter(col("event_id") <= 20).write.mode("append").parquet(dir)
    def runOnce(): Unit = {
      val q = spark.readStream.schema(schema).parquet(dir)
        .select("event_id", "user_id")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
    }
    runOnce()
    def sunk(): Set[Long] = spark.read.parquet(out).select("event_id")
      .collect().map(_.getLong(0)).toSet
    assert(sunk() == ev.filter(col("event_id") <= 20)
      .collect().map(_.getLong(0)).toSet)
    // new file lands; the RESTARTED query must pick up only that file —
    // the checkpointed discovery log plus the file sink's commit log
    // make the whole chain exactly-once across restarts
    ev.filter(col("event_id") > 20).write.mode("append").parquet(dir)
    runOnce()
    assert(sunk() == ev.collect().map(_.getLong(0)).toSet,
      "restart duplicated old files or missed the new one")
  }

  test("st_exactly_once_sink: batch replay leaves the table unchanged") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("eos").toString
    val mem = MemoryStream[Event]
    val q = mem.toDF().writeStream
      .foreachBatch(Streams.exactlyOnceSink(dir) _)
      .outputMode("update").start()
    try {
      mem.addData(ev(1, 10, user = 1), ev(2, 20, user = 2))
      q.processAllAvailable()
      mem.addData(ev(3, 30, user = 1))
      q.processAllAvailable()
      def snapshot() = spark.read.parquet(dir)
        .groupBy("user_id")
        .agg(sum("n_events").as("n"), sum("sum_value").as("v"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
        .sortBy(_._1).toSeq
      val before = snapshot()
      assert(before.map(_._2).sum == 3, s"expected 3 events, got $before")
      // simulate an at-least-once REPLAY of batch 1: the idempotent
      // sink must overwrite its own partition, not append duplicates
      Streams.exactlyOnceSink(dir)(
        Seq(ev(3, 30, user = 1)).toDF(), 1L)
      assert(snapshot() == before,
        s"replay changed the table: $before -> ${snapshot()}")
    } finally q.stop()
  }

  test("st_manifest_commit: versions isolate readers; replay republishes identically") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("mfc").toString
    val mem = MemoryStream[Event]
    val q = mem.toDF().writeStream
      .foreachBatch(Streams.manifestCommitSink(dir) _)
      .outputMode("append").start()
    try {
      mem.addData(ev(1, 10, user = 1), ev(2, 20, user = 2))
      q.processAllAvailable()
      mem.addData(ev(3, 30, user = 1))
      q.processAllAvailable()
      mem.addData(ev(4, 40, user = 3))
      q.processAllAvailable()
      def idsAt(v: Long) = Streams.manifestVersionRead(spark, dir, v)
        .select("event_id").collect().map(_.getLong(0)).toSet
      // each version is the cumulative table as of its batch
      assert(idsAt(0) == Set(1L, 2L))
      assert(idsAt(1) == Set(1L, 2L, 3L))
      assert(idsAt(2) == Set(1L, 2L, 3L, 4L))
      // ISOLATION: version 1 read again AFTER batch 2 landed — same rows
      assert(idsAt(1) == Set(1L, 2L, 3L),
        "a later batch leaked into a pinned manifest version")
      // at-least-once REPLAY of batch 1: the published manifest is the
      // commit marker, so the replay is a NO-OP — data files and
      // manifest untouched (rewriting would orphan later manifests
      // that list the old UUID'd part names)
      val m1 = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"$dir/manifest-1")), "UTF-8")
      val f1 = new java.io.File(s"$dir/batch_id=1").listFiles()
        .map(f => f.getName -> f.lastModified).toMap
      Streams.manifestCommitSink(dir)(Seq(ev(3, 30, user = 1)).toDF(), 1L)
      assert(new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"$dir/manifest-1")), "UTF-8") == m1,
        "replay changed the published manifest")
      assert(new java.io.File(s"$dir/batch_id=1").listFiles()
        .map(f => f.getName -> f.lastModified).toMap == f1,
        "replay touched already-committed data files")
      assert(idsAt(1) == Set(1L, 2L, 3L) && idsAt(2) == Set(1L, 2L, 3L, 4L),
        "replay changed a reader-visible version")
    } finally q.stop()
  }

  test("st_dedup_probe: hits equal the batch incremental new-old pairs; no state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val Dedup = graft.operators.Dedup
    // frozen index = old-corpus band rows; the bucket cap is computed
    // over the FULL corpus, matching the incremental op's discipline
    val corpus = Dedup.corpusBandIndex(spark, sf)
      .filter(col("doc_id") % 5 =!= 0)
    val newDocs = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("doc_id") % 5 === 0)
      .select("doc_id", "text").as[(Long, String)].collect()
    val mem = MemoryStream[(Long, String)]
    val q = Streams.dedupProbe(
        mem.toDF().toDF("doc_id", "text"), corpus)
      .writeStream.format("memory").queryName("probe")
      .outputMode("append").start()
    try {
      val (b1, b2) = newDocs.splitAt(newDocs.length / 2)
      mem.addData(b1.toIndexedSeq: _*); q.processAllAvailable()
      mem.addData(b2.toIndexedSeq: _*); q.processAllAvailable()
      val hits = spark.table("probe").collect()
        .map(r => (math.min(r.getLong(0), r.getLong(2)),
          math.max(r.getLong(0), r.getLong(2)))).toSet
      val batch = Dedup.dedupIncremental(spark, sf)
        .filter(col("pair_kind") === "new-old")
        .select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(hits.nonEmpty)
      assert(hits == batch,
        s"stream ${hits.size} pairs vs batch ${batch.size}")
      // statelessness: replaying batch 1 re-emits exactly its own hit
      // rows (the same transform run as BATCH input predicts the count)
      val rowsAfterTwo = spark.table("probe").count()
      val b1BatchRows = Streams.dedupProbe(
        b1.toIndexedSeq.toDF("doc_id", "text"), corpus).count()
      assert(b1BatchRows > 0)
      mem.addData(b1.toIndexedSeq: _*); q.processAllAvailable()
      assert(spark.table("probe").count() == rowsAfterTwo + b1BatchRows,
        "probe is not stateless across micro-batches")
    } finally q.stop()
  }

  test("st_band_index: streamed index equals the batch band rows; replay is idempotent") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("bandidx").toString
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("doc_id") % 5 === 0)
      .select("doc_id", "text").as[(Long, String)].collect()
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch(Streams.bandIndexSink(dir) _)
      .outputMode("append").start()
    try {
      val (b1, b2) = docs.splitAt(docs.length / 2)
      mem.addData(b1.toIndexedSeq: _*); q.processAllAvailable()
      mem.addData(b2.toIndexedSeq: _*); q.processAllAvailable()
      def index(): Set[(Long, Int, Long, Long, Long)] =
        spark.read.parquet(dir).collect().map(r =>
          (r.getAs[Long]("doc_id"), r.getAs[Int]("c"), r.getAs[Long]("k0"),
            r.getAs[Long]("k1"), r.getAs[Long]("k2"))).toSet
      // the assembled index == the same transform run as one batch —
      // micro-batch composition can't change the index contents
      val want = Streams.streamBandRows(docs.toIndexedSeq.toDF("doc_id", "text"))
        .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("c"),
          r.getAs[Long]("k0"), r.getAs[Long]("k1"), r.getAs[Long]("k2"))).toSet
      val before = index()
      assert(before.nonEmpty && before == want,
        s"streamed index ${before.size} rows != batch ${want.size}")
      // at-least-once replay of batch 0: partition-dir overwrite must
      // leave the assembled index unchanged
      Streams.bandIndexSink(dir)(b1.toIndexedSeq.toDF("doc_id", "text"), 0L)
      assert(index() == before, "batch replay changed the index")
    } finally q.stop()
  }

  test("st_corpus_filter: the shared quality gate streams; verdicts == batch under any split") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect()
    val mem = MemoryStream[(Long, String)]
    val q = graft.operators.TextOps
      .corpusFilterOn(mem.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("cfilter")
      .outputMode("append").start()
    try {
      val (b1, rest) = docs.splitAt(docs.length / 3)
      val (b2, b3) = rest.splitAt(rest.length / 2)
      Seq(b1, b2, b3).foreach { b =>
        mem.addData(b.toIndexedSeq: _*); q.processAllAvailable()
      }
      def asTuple(r: org.apache.spark.sql.Row) =
        (r.getAs[Long]("doc_id"), r.getAs[Long]("n_words"),
          r.getAs[Long]("n_distinct"), r.getAs[Long]("n_stop"),
          r.getAs[String]("reason"), r.getAs[Boolean]("keep"))
      val streamed = spark.table("cfilter").collect().map(asTuple).toSet
      val batch = graft.operators.TextOps.corpusFilter(spark, sf)
        .collect().map(asTuple).toSet
      assert(streamed.nonEmpty && streamed == batch,
        s"streamed ${streamed.size} verdicts != batch ${batch.size}")
    } finally q.stop()
  }

  test("st_pii_redact: the shared scrubber streams; redacted rows == batch under any split") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = graft.model.Tables(spark, sf, "events")
      .select("event_type", "props").as[(String, String)].collect()
    val mem = MemoryStream[(String, String)]
    val q = graft.operators.TextOps
      .piiRedactRows(mem.toDF().toDF("event_type", "props"))
      .writeStream.format("memory").queryName("pii")
      .outputMode("append").start()
    try {
      val (b1, rest) = events.splitAt(events.length / 4)
      val (b2, b3) = rest.splitAt(rest.length / 2)
      Seq(b1, b2, b3).foreach { b =>
        mem.addData(b.toIndexedSeq: _*); q.processAllAvailable()
      }
      def counts(rows: Array[org.apache.spark.sql.Row]) = rows
        .map(r => (r.getAs[String]("event_type"), r.getAs[String]("props"),
          r.getAs[String]("red")))
        .groupBy(identity).map { case (k, g) => k -> g.length }
      val streamed = counts(spark.table("pii").collect())
      val batch = counts(graft.operators.TextOps
        .piiRedactRows(graft.model.Tables(spark, sf, "events")).collect())
      assert(streamed.nonEmpty && streamed == batch,
        "streamed redaction multiset != batch")
      // and every digit run is actually gone from the redacted column
      assert(spark.table("pii").filter(col("red").rlike("[0-9]")).count() == 0)
    } finally q.stop()
  }

  test("st_idle_timeout: event-time timers finalize sessions exactly once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val saved = spark.conf.get("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[Streams.TimedEvent]
      val q = Streams.idleTimeout(mem.toDS())
        .toDF().writeStream.format("memory").queryName("idle")
        .outputMode("append").start()
      // base offset off epoch 0: a row with etime <= the initial
      // watermark (0) is dropped by the stateful-op late filter (the
      // st_sessionize gotcha); processAllAvailable also DRAINS
      // follow-up batches, so a batch's own max event time reaches the
      // watermark (and can fire timers) within the same call
      val baseMin = 24L * 60L
      def te(user: Long, minute: Long, v: Double) =
        Streams.TimedEvent(user,
          new java.sql.Timestamp((baseMin + minute) * 60000L), v)
      def endMs(minute: Long) = (baseMin + minute) * 60000L
      try {
        // batch 1: user 1 active at 0 and 10 min; user 2 at 5 min —
        // watermark drains to +10 min, below every armed expiry
        mem.addData(te(1, 0, 1.25), te(1, 10, 2.50), te(2, 5, 4.00))
        q.processAllAvailable()
        assert(spark.table("idle").isEmpty,
          "nothing may finalize before the watermark passes an idle gap")
        // batch 2: user 2 again at 50 min re-arms its timer to 80 min;
        // the drained watermark (50) passes user 1's 10+30 expiry —
        // user 1 finalizes with BOTH events, exactly once
        mem.addData(te(2, 50, 1.00))
        q.processAllAvailable()
        val after2 = spark.table("idle").collect()
        assert(after2.map(_.getAs[Long]("user_id")).toSeq == Seq(1L),
          s"only user 1 may finalize here: ${after2.mkString(";")}")
        assert(after2.head.getAs[Long]("n_events") == 2L)
        assert(after2.head.getAs[Long]("sum_cents") == 375L)
        assert(after2.head.getAs[Long]("session_end_ms") == endMs(10))
        // batch 3: heartbeat at 200 min drains the watermark past user
        // 2's re-armed 80 — ONE session containing both its events (the
        // re-arm extended the session instead of splitting it)
        mem.addData(te(9, 200, 0.0))
        q.processAllAvailable()
        val u2 = spark.table("idle").filter(col("user_id") === 2L).collect()
        assert(u2.length == 1, s"user 2 must finalize exactly once: ${u2.mkString(";")}")
        assert(u2.head.getAs[Long]("n_events") == 2L)
        assert(u2.head.getAs[Long]("sum_cents") == 500L)
        assert(u2.head.getAs[Long]("session_end_ms") == endMs(50))
        // exactly-once overall: user 1 did not re-emit; the heartbeat
        // user's own timer (200+30) is beyond the watermark — still live
        assert(spark.table("idle").count() == 2L)
      } finally q.stop()
    } finally spark.conf.set(
      "spark.sql.streaming.stateStore.providerClass", saved)
  }

  test("st_user_counters: transformWithState running counters == batch aggregate under any split") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val saved = spark.conf.get("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val events = graft.model.Tables(spark, sf, "events")
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"))
        .as[Streams.Event].collect().toSeq
      // reference #1: in-memory aggregate in the integer-cents contract
      val want = events.groupBy(_.user_id).map { case (u, es) =>
        val cents = es.map(e => math.round(e.value * 100))
        u -> ((es.size.toLong, cents.sum, cents.max))
      }
      // reference #2: the SHARED batch transform behind the driver-
      // checked q_user_counters row — proving the streaming emissions
      // equal the same frame DuckDB oracles, not just a spec-local re-
      // implementation
      val wantDriver = Streams.userCountersBatch(events.toDF())
        .collect().map(r => r.getAs[Long]("user_id") ->
          ((r.getAs[Long]("n_events"), r.getAs[Long]("sum_cents"),
            r.getAs[Long]("max_cents")))).toMap
      assert(wantDriver == want.toMap,
        "shared q_user_counters transform != in-memory cents contract")
      def run(name: String, batches: Seq[Seq[Streams.Event]]): Map[Long, (Long, Long, Long)] = {
        val mem = MemoryStream[Streams.Event]
        val q = Streams.userCounters(mem.toDS())
          .toDF().writeStream.format("memory").queryName(name)
          .outputMode("update").start()
        try {
          batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
          // LAST emission per user carries the running totals
          spark.table(name).collect()
            .zipWithIndex.groupBy(_._1.getAs[Long]("user_id"))
            .map { case (u, rs) =>
              val last = rs.maxBy(_._2)._1
              u -> ((last.getAs[Long]("n_events"),
                last.getAs[Long]("sum_cents"), last.getAs[Long]("max_cents")))
            }
        } finally q.stop()
      }
      val oneShot = run("uc_one", Seq(events))
      val split = run("uc_split", events.grouped(
        math.max(1, events.size / 3)).toSeq)
      assert(oneShot == want.toMap, "single-batch run != batch aggregate")
      assert(split == want.toMap, "multi-batch run != batch aggregate")
    } finally spark.conf.set(
      "spark.sql.streaming.stateStore.providerClass", saved)
  }

  test("st_topk_mapstate: MapState top-k standings == batch rank twin under any split") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val saved = spark.conf.get("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val events = graft.model.Tables(spark, sf, "events")
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"))
        .as[Streams.Event].collect().toSeq
      // the frame the final standings must equal: the batch twin
      val want = Streams.topkBatch(events.toDF()).collect()
        .map(r => (r.getAs[String]("event_type"), r.getAs[Int]("rank")) ->
          ((r.getAs[Long]("user_id"), r.getAs[Long]("n")))).toMap
      assert(want.nonEmpty)
      def run(name: String, batches: Seq[Seq[Streams.Event]]): Map[(String, Int), (Long, Long)] = {
        val mem = MemoryStream[Streams.Event]
        val q = Streams.topkStream(mem.toDS())
          .toDF().writeStream.format("memory").queryName(name)
          .outputMode("update").start()
        try {
          batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
          // FINAL standings per key = the emission at max n_total
          val rows = spark.table(name).collect()
          val lastTotal = rows.groupBy(_.getAs[String]("event_type"))
            .map { case (k, rs) => k -> rs.map(_.getAs[Long]("n_total")).max }
          rows.filter(r => r.getAs[Long]("n_total") ==
              lastTotal(r.getAs[String]("event_type")))
            .map(r => (r.getAs[String]("event_type"), r.getAs[Int]("rank")) ->
              ((r.getAs[Long]("user_id"), r.getAs[Long]("n")))).toMap
        } finally q.stop()
      }
      val oneShot = run("tk_one", Seq(events))
      val split = run("tk_split",
        events.grouped(math.max(1, events.size / 3)).toSeq)
      assert(oneShot == want, "single-batch standings != batch rank twin")
      assert(split == want, "multi-batch standings != batch rank twin")
    } finally spark.conf.set(
      "spark.sql.streaming.stateStore.providerClass", saved)
  }

  test("st_buffered_enrich: ListState buffers facts until the dim lands; emissions == batch twin") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val saved = spark.conf.get("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // ordered-feeding contract: the global (ts, event_id) order
      val events = graft.model.Tables(spark, sf, "events")
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"))
        .as[Streams.Event].collect().toSeq
        .sortBy(e => (e.ts, e.event_id))
      val want = Streams.bufferedEnrichBatch(events.toDF()).collect()
        .map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("user_id"),
          r.getAs[Long]("cents"), r.getAs[Long]("dim_click_id"),
          r.getAs[Long]("dim_click_ts"))).toSet
      assert(want.nonEmpty, "twin must be non-vacuous at sf0.001")
      def run(name: String, batches: Seq[Seq[Streams.Event]]): Set[(Long, Long, Long, Long, Long)] = {
        val mem = MemoryStream[Streams.Event]
        val q = Streams.bufferedEnrich(mem.toDS())
          .toDF().writeStream.format("memory").queryName(name)
          .outputMode("update").start()
        try {
          batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
          spark.table(name).collect()
            .map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("user_id"),
              r.getAs[Long]("cents"), r.getAs[Long]("dim_click_id"),
              r.getAs[Long]("dim_click_ts"))).toSet
        } finally q.stop()
      }
      val oneShot = run("be_one", Seq(events))
      val split = run("be_split",
        events.grouped(math.max(1, events.size / 3)).toSeq)
      assert(oneShot == want, "single-batch enrichment != batch twin")
      assert(split == want, "ordered-split enrichment != batch twin")

      // the BUFFERING itself, exactly-once: a purchase arriving before
      // its user's first click emits nothing until the click batch,
      // then flushes exactly once with that click's identity
      val mem = MemoryStream[Streams.Event]
      val q = Streams.bufferedEnrich(mem.toDS())
        .toDF().writeStream.format("memory").queryName("be_buf")
        .outputMode("update").start()
      try {
        mem.addData(Streams.Event(10L, 1000L, 77L, "purchase", 2.5))
        q.processAllAvailable()
        assert(spark.table("be_buf").isEmpty,
          "a dim-less purchase must buffer, not emit")
        mem.addData(Streams.Event(11L, 2000L, 77L, "click", 0.0),
          Streams.Event(12L, 3000L, 77L, "purchase", 1.0))
        q.processAllAvailable()
        val out = spark.table("be_buf").collect()
          .map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("cents"),
            r.getAs[Long]("dim_click_id"))).toSet
        assert(out == Set((10L, 250L, 11L), (12L, 100L, 11L)),
          s"buffered flush + pass-through expected: ${out.mkString(";")}")
      } finally q.stop()
    } finally spark.conf.set(
      "spark.sql.streaming.stateStore.providerClass", saved)
  }
}
