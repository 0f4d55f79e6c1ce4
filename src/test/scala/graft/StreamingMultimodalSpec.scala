package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.{Event, EventStreams}
import graft.multimodal.Multimodal

class StreamingMultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int, sec: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 00:$min%02d:$sec%02d")

  test("streaming tumbling window agg matches batch semantics") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val query = EventStreams.tumbling(input.toDF(), "5 minutes", "10 minutes")
      .writeStream.format("memory").queryName("tumbling_out")
      .outputMode("complete").start()
    try {
      input.addData(
        Event(1, ts(0, 10), 1, "click", 1.0),
        Event(2, ts(1, 0), 1, "click", 2.0),
        Event(3, ts(6, 0), 2, "view", 3.0),
        Event(4, ts(7, 0), 2, "click", 4.0))
      query.processAllAvailable()
      val rows = spark.table("tumbling_out")
        .orderBy("bucket", "event_type")
        .as[(Timestamp, String, Long, Double)].collect().toSeq
      assert(rows == Seq(
        (ts(0), "click", 2L, 3.0),
        (ts(5), "click", 1L, 4.0),
        (ts(5), "view", 1L, 3.0)))
    } finally query.stop()
  }

  test("streaming funnel: step progress across batches ≡ the batch funnel " +
    "on an in-order stream; boundaries match") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val steps = Seq("view", "click", "purchase")
    val query = EventStreams.funnelStream(input.toDS(), steps,
        withinSeconds = 300)
      .writeStream.format("memory").queryName("funnel_out")
      .outputMode("append").start()
    val all = Seq(
      Event(1, ts(0), 7, "view", 1.0),
      Event(2, ts(2), 7, "click", 1.0),    // +2 min, inside the 5-min window
      Event(3, ts(0), 8, "view", 1.0),
      Event(4, ts(0), 8, "click", 1.0),    // same instant: strict-after excludes
      Event(5, ts(5), 7, "purchase", 1.0), // +3 min after the click
      Event(6, ts(9), 8, "click", 1.0))    // +9 min > window: excluded
    try {
      input.addData(all.take(4): _*)
      query.processAllAvailable()
      input.addData(all.drop(4): _*)
      query.processAllAvailable()
      val got = spark.table("funnel_out")
        .select("user_id", "step", "step_name", "t_step")
        .as[(Long, Int, String, Timestamp)].collect().toSeq.sorted
      assert(got == Seq(
        (7L, 1, "view", ts(0)), (7L, 2, "click", ts(2)),
        (7L, 3, "purchase", ts(5)), (8L, 1, "view", ts(0))), s"$got")
      // an in-order stream never corrects
      assert(spark.table("funnel_out").filter(col("correction")).count() == 0)
      // in-order parity: max emitted step and step times equal the batch
      // operator's over the union of both micro-batches
      val batch = graft.operators.EventOps.funnel(
          all.toDF("event_id", "ts", "user_id", "event_type", "value"),
          "user_id", "event_type", "ts", steps, 300L)
        .collect().map(r => r.getLong(0) ->
          (r.getInt(4), Seq(1, 2, 3).map(i =>
            Option(r.getTimestamp(i)).map(_.getTime).getOrElse(-1L))))
        .toMap
      val streamed = got.groupBy(_._1).map { case (u, rows) =>
        u -> (rows.map(_._2).max,
          steps.indices.map(i => rows.find(_._2 == i + 1)
            .map(_._4.getTime).getOrElse(-1L)))
      }
      assert(streamed.keySet == batch.keySet)
      for ((u, (reached, times)) <- streamed) {
        assert(batch(u)._1 == reached, s"user $u reached")
        assert(batch(u)._2 == times, s"user $u times")
      }
    } finally query.stop()
    intercept[IllegalArgumentException] {
      EventStreams.funnelStream(input.toDS(), Seq("view"), 300)
    }
  }

  test("streaming funnel: late stragglers emit correction rows that " +
    "tighten step times; anchored chains stay untouched") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val steps = Seq("view", "click", "purchase")
    val query = EventStreams.funnelStream(input.toDS(), steps,
        withinSeconds = 300)
      .writeStream.format("memory").queryName("funnel_corr_out")
      .outputMode("append").start()
    def emitted(): Seq[(Long, Int, Timestamp, Boolean)] =
      spark.table("funnel_corr_out")
        .select("user_id", "step", "t_step", "correction")
        .as[(Long, Int, Timestamp, Boolean)].collect().toSeq.sorted
    try {
      // batch 1: u7 attains step 1 at 00:10; u8 runs the full chain;
      // u9 attains steps 1-2
      input.addData(
        Event(1, ts(10), 7, "view", 1.0),
        Event(2, ts(1), 8, "view", 1.0),
        Event(3, ts(3), 8, "click", 1.0),
        Event(4, ts(4), 8, "purchase", 1.0),
        Event(5, ts(10), 9, "view", 1.0),
        Event(6, ts(12), 9, "click", 1.0))
      query.processAllAvailable()
      val b1 = emitted()
      assert(b1 == Seq(
        (7L, 1, ts(10), false),
        (8L, 1, ts(1), false), (8L, 2, ts(3), false), (8L, 3, ts(4), false),
        (9L, 1, ts(10), false), (9L, 2, ts(12), false)), s"$b1")

      // batch 2, stragglers: u7's earlier view tightens (step 2 unset) →
      // correction; u8's earlier purchase tightens (last step, nothing
      // anchored above) → correction; u9's earlier view does NOT (its
      // click was gated on the old time — the chain above is anchored)
      input.addData(
        Event(7, ts(5), 7, "view", 1.0),
        Event(8, ts(3, 30), 8, "purchase", 1.0),
        Event(9, ts(8), 9, "view", 1.0))
      query.processAllAvailable()
      val b2 = emitted().diff(b1)
      assert(b2 == Seq(
        (7L, 1, ts(5), true),
        (8L, 3, ts(3, 30), true)), s"$b2")

      // batch 3: u7's click at 00:09 qualifies against the TIGHTENED
      // step-1 time (strict-after 00:05, within 5 min) — it would have
      // failed strict-after against the superseded 00:10
      input.addData(Event(10, ts(9), 7, "click", 1.0))
      query.processAllAvailable()
      val b3 = emitted().diff(b1).diff(b2)
      assert(b3 == Seq((7L, 2, ts(9), false)), s"$b3")

      // downstream contract: min t_step per (user, step) is the truth —
      // for u7 step 1 that is the corrected 00:05
      val u7s1 = spark.table("funnel_corr_out")
        .filter(col("user_id") === 7 && col("step") === 1)
        .agg(min("t_step")).as[Timestamp].head()
      assert(u7s1 == ts(5))
    } finally query.stop()
  }

  test("streaming funnel: a correction RE-QUALIFIES an event rejected " +
    "against the stale step time (r17, closing the r16-documented miss)") {
    implicit val sqlCtx = spark.sqlContext
    val steps = Seq("view", "click")
    val all1 = Seq(
      // ts order within the batch: the click at 00:15 is judged BEFORE
      // the view at 00:20 and rejected (no anchor yet) → buffered
      Event(1, ts(15), 7, "click", 1.0),
      Event(2, ts(20), 7, "view", 1.0))
    val straggler = Event(3, ts(12), 7, "view", 1.0)
    def run(maxBuffered: Int, name: String) = {
      val input = MemoryStream[Event]
      val query = EventStreams.funnelStream(input.toDS(), steps,
          withinSeconds = 300, maxBuffered = maxBuffered)
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        input.addData(all1: _*)
        query.processAllAvailable()
        // batch 2: the straggler tightens view 00:20 → 00:12; the
        // buffered click (00:15) now sits strictly inside [12, 17]
        input.addData(straggler)
        query.processAllAvailable()
      } finally query.stop()
      spark.table(name).select("user_id", "step", "t_step", "correction")
        .as[(Long, Int, Timestamp, Boolean)].collect().toSeq.sorted
    }
    val got = run(maxBuffered = 512, "funnel_requal_out")
    assert(got == Seq(
      (7L, 1, ts(12), true), (7L, 1, ts(20), false),
      (7L, 2, ts(15), false)), s"$got")
    // parity: the batch funnel over the full history agrees
    val batch = graft.operators.EventOps.funnel(
        (all1 :+ straggler)
          .toDF("event_id", "ts", "user_id", "event_type", "value"),
        "user_id", "event_type", "ts", steps, 300L)
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2)))
    assert(batch.toSeq == Seq((7L, ts(12), ts(15))), s"${batch.toSeq}")
    // maxBuffered = 0 pins the degradation path: no buffer, no
    // re-qualification — exactly the pre-r17 behavior
    val got0 = run(maxBuffered = 0, "funnel_requal0_out")
    assert(got0 == Seq(
      (7L, 1, ts(12), true), (7L, 1, ts(20), false)), s"$got0")
  }

  test("streaming attribution: per-conversion credits across batches " +
    "aggregate to the batch report; a conversion consumes its touches") {
    implicit val sqlCtx = spark.sqlContext
    val all = Seq(
      // u7: 3 touches then a purchase (linear remainder case), then one
      // touch + a second purchase in the NEXT micro-batch (state carry)
      Event(1, ts(0), 7, "view", 1.0),
      Event(2, ts(2), 7, "click", 1.0),
      Event(3, ts(4), 7, "signup", 1.0),
      Event(4, ts(6), 7, "purchase", 1.0),
      Event(5, ts(8), 7, "click", 1.0),
      // u8: a touch too stale for the 10-min lookback — consumed, not
      // credited
      Event(6, ts(0), 8, "view", 1.0),
      Event(7, ts(20), 8, "purchase", 1.0),
      // batch 2
      Event(8, ts(12), 7, "purchase", 1.0))
    val input = MemoryStream[Event]
    val query = EventStreams.attributionStream(input.toDS(), "purchase",
        Seq("view", "click", "signup"), lookbackSeconds = 600,
        model = "position")
      .writeStream.format("memory").queryName("attr_out")
      .outputMode("append").start()
    try {
      input.addData(all.take(7): _*)
      query.processAllAvailable()
      input.addData(all.drop(7): _*)
      query.processAllAvailable()
      val rows = spark.table("attr_out")
        .select("conv_event_id", "touch_event_id", "touch_type", "credit_ppm")
        .as[(Long, Long, String, Long)].collect().toSet
      // conv 4: three touches 40/20/40; conv 8: the post-conv-4 click
      // alone; conv 7: nothing (the view was stale and consumed)
      assert(rows == Set(
        (4L, 1L, "view", 400000L), (4L, 2L, "click", 200000L),
        (4L, 3L, "signup", 400000L), (8L, 5L, "click", 1000000L)), s"$rows")
      // aggregated ≡ the batch report over the union
      val batch = graft.operators.Attribution.report(
          all.toDF("event_id", "ts", "user_id", "event_type", "value"),
          "user_id", "ts", "event_type", "purchase",
          Seq("view", "click", "signup"), 600L, "position")
        .as[(String, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      val streamed = rows.groupBy(_._3).map { case (t, rs) =>
        t -> ((rs.size.toLong, rs.toSeq.map(_._4).sum)) }
      assert(streamed == batch, s"stream $streamed vs batch $batch")
    } finally query.stop()
    intercept[IllegalArgumentException] {
      EventStreams.attributionStream(input.toDS(), "purchase",
        Seq("purchase"), 600)
    }
  }

  test("streaming rate anomalies: buckets close in watermark order, the " +
    "spike flags against the trailing ring, and rows equal the batch " +
    "report") {
    implicit val sqlCtx = spark.sqlContext
    // aligned base (300 s × 5666667) so minute offsets land in the
    // intended 5-min buckets — the batch spec's fixture
    def at(min: Int, id: Long, typ: String) = Event(id,
      new Timestamp(1700000100000L + min * 60000L), 1, typ, 1.0)
    val steady = (0 until 12).flatMap(b => Seq(
      at(b * 5, b * 2 + 1, "a"), at(b * 5 + 1, b * 2 + 2, "a")))
    val spike = Seq(at(60, 101, "a"), at(61, 102, "a"), at(62, 103, "a"))
    val calm = Seq(at(65, 104, "a"), at(66, 105, "a"))
    val input = MemoryStream[Event]
    val query = EventStreams.rateAnomalyStream(input.toDS(),
        bucketWidthSeconds = 300, trailing = 12, k = 3,
        watermark = "0 seconds")
      .writeStream.format("memory").queryName("rate_out")
      .outputMode("append").start()
    try {
      input.addData(steady ++ spike ++ calm: _*)
      query.processAllAvailable()
      // advance the watermark past the spike bucket's end: the timeout
      // flushes key "a" even though this batch carries no "a" rows
      input.addData(at(200, 900, "z"))
      query.processAllAvailable()
      input.addData(at(300, 901, "z"))
      query.processAllAvailable()
      val got = spark.table("rate_out")
        .select("event_type", "n_events", "trailing_sum")
        .as[(String, Long, Long)].collect().toSeq
      assert(got == Seq(("a", 3L, 24L)), s"$got")
      // batch parity over the union
      val all = steady ++ spike ++ calm ++
        Seq(at(200, 900, "z"), at(300, 901, "z"))
      val batch = graft.operators.EventOps.rateAnomalies(
          all.toDF("event_id", "ts", "user_id", "event_type", "value"),
          "event_type", "ts", "5 minutes", trailing = 12, k = 3)
        .select("event_type", "n_events", "trailing_sum")
        .as[(String, Long, Long)].collect().toSeq
      assert(got == batch, s"stream $got vs batch $batch")
    } finally query.stop()
    intercept[IllegalArgumentException] {
      EventStreams.rateAnomalyStream(input.toDS(), trailing = 1)
    }
  }

  test("streaming SCD2: no-op updates collapse, a status change closes " +
    "the open version; closed rows equal the batch intervals") {
    implicit val sqlCtx = spark.sqlContext
    val all = Seq(
      Event(1, ts(0), 7, "bronze", 1.0),
      Event(2, ts(2), 7, "bronze", 1.0),   // no-op: collapses
      Event(3, ts(5), 7, "silver", 1.0),   // closes v1 [0, 5)
      // batch 2: state carries — v2 closes at 00:09
      Event(4, ts(9), 7, "gold", 1.0),
      Event(5, ts(3), 8, "bronze", 1.0))   // other key, stays open
    val input = MemoryStream[Event]
    val query = EventStreams.scd2Stream(input.toDS())
      .writeStream.format("memory").queryName("scd2_out")
      .outputMode("append").start()
    try {
      input.addData(all.take(3): _*)
      query.processAllAvailable()
      input.addData(all.drop(3): _*)
      query.processAllAvailable()
      val got = spark.table("scd2_out")
        .select("user_id", "status", "valid_from", "valid_to", "version")
        .as[(Long, String, Timestamp, Timestamp, Long)].collect().toSeq.sorted
      assert(got == Seq(
        (7L, "bronze", ts(0), ts(5), 1L),
        (7L, "silver", ts(5), ts(9), 2L)), s"$got")
      // parity: the batch intervals' CLOSED rows over the union
      val batch = graft.operators.Temporal.validityIntervals(
          all.toDF("event_id", "ts", "user_id", "event_type", "value"),
          "user_id", "ts", Seq("event_type"), "event_id")
        .filter(col("is_current") === 0)
        .select(col("user_id"), col("event_type"), col("valid_from"),
          col("valid_to"), col("version"))
        .as[(Long, String, Timestamp, Timestamp, Long)].collect().toSeq.sorted
      assert(got == batch, s"stream $got vs batch $batch")
    } finally query.stop()
  }

  test("streaming per-batch transition matrix equals the batch operator " +
    "on the same rows; batches report independently") {
    implicit val sqlCtx = spark.sqlContext
    val b1 = Seq(
      Event(1, ts(0), 7, "view", 1.0), Event(2, ts(1), 7, "click", 1.0),
      Event(3, ts(2), 7, "purchase", 1.0),
      Event(4, ts(0), 8, "view", 1.0), Event(5, ts(1), 8, "click", 1.0))
    val b2 = Seq(
      Event(6, ts(0), 9, "view", 1.0), Event(7, ts(1), 9, "view", 1.0))
    val input = MemoryStream[Event]
    val got = scala.collection.mutable.ArrayBuffer[(String, String, Long, Long, Long)]()
    val q = EventStreams.transitionsStream(input.toDS()) { out =>
      got ++= out.collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3), r.getLong(4)))
    }
    try {
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    // batch 1: view→click ×2 (1e6 ppm), click→purchase ×1 of 1 click-out;
    // batch 2 reports ITS OWN window: view→view ×1
    assert(got.toSet == Set(
      ("view", "click", 2L, 1000000L, 0L),
      ("click", "purchase", 1L, 1000000L, 0L),
      ("view", "view", 1L, 1000000L, 1L)), got.toString)
    // parity with the batch core on batch 1's rows
    val batch = graft.operators.EventOps.transitionMatrix(
        b1.toDF("event_id", "ts", "user_id", "event_type", "value"),
        "user_id", "event_type", "ts", "event_id")
      .as[(String, String, Long, Long)].collect().toSet
    assert(got.filter(_._5 == 0L).map(t => (t._1, t._2, t._3, t._4)).toSet
      == batch)
  }

  test("streaming per-batch stickiness probe equals the batch operator " +
    "on the same rows") {
    implicit val sqlCtx = spark.sqlContext
    def dts(day: Int): Timestamp = Timestamp.valueOf(f"2024-01-$day%02d 10:00:00")
    val b1 = Seq(
      Event(1, dts(1), 7, "view", 1.0), Event(2, dts(1), 8, "view", 1.0),
      Event(3, dts(2), 7, "click", 1.0))
    val input = MemoryStream[Event]
    val got = scala.collection.mutable.ArrayBuffer[(Timestamp, Long, Long, Long, Long)]()
    val q = EventStreams.stickinessStream(input.toDS()) { out =>
      got ++= out.collect().map(r => (r.getTimestamp(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4)))
    }
    try {
      input.addData(b1: _*); q.processAllAvailable()
    } finally q.stop()
    // day1: dau 2, wau 2 → 1e6; day2: dau 1, wau 2 (both active in the
    // trailing window) → 500000
    val day = (d: Int) => Timestamp.valueOf(f"2024-01-$d%02d 00:00:00")
    assert(got.toSet == Set(
      (day(1), 2L, 2L, 1000000L, 0L),
      (day(2), 1L, 2L, 500000L, 0L)), got.toString)
    val batch = graft.operators.EventOps.stickiness(
        b1.toDF("event_id", "ts", "user_id", "event_type", "value"),
        "user_id", "ts")
      .as[(Timestamp, Long, Long, Long)].collect().toSet
    assert(got.map(t => (t._1, t._2, t._3, t._4)).toSet == batch)
  }

  test("streaming per-batch co-occurrence probe equals the batch " +
    "operator on the same rows") {
    implicit val sqlCtx = spark.sqlContext
    val b1 = Seq(
      Event(1, ts(0), 7, "view", 1.0), Event(2, ts(1), 7, "click", 1.0),
      Event(3, ts(2), 8, "view", 1.0), Event(4, ts(3), 8, "click", 1.0),
      Event(5, ts(4), 9, "view", 1.0))
    val input = MemoryStream[Event]
    val got = scala.collection.mutable.ArrayBuffer[(String, String, Long, Long)]()
    val q = EventStreams.cooccurrenceStream(input.toDS()) { out =>
      got ++= out.collect().map(r =>
        (r.getString(0), r.getString(1), r.getLong(2), r.getLong(9)))
    }
    try {
      input.addData(b1: _*); q.processAllAvailable()
    } finally q.stop()
    // one basket per user-day: u7 {view,click}, u8 {view,click}, u9 {view}
    assert(got.toList == List(("click", "view", 2L, 0L)), got.toString)
    val batch = graft.operators.Cooccurrence.pairs(
        b1.toDF("event_id", "ts", "user_id", "event_type", "value")
          .withColumn("__b", concat_ws(":", col("user_id"),
            col("ts").cast("date"))),
        "__b", "event_type", maxBasket = 4)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.map(t => (t._1, t._2, t._3)).toList == batch.toList)
  }

  test("streaming agg-registry maintenance: snapshots accumulate " +
    "across batches and equal the batch recompute") {
    implicit val sqlCtx = spark.sqlContext
    val table = "aggreg_stream_t"
    graft.sources.Warehouse.dropTableAndLocation(spark, table)
    graft.sources.Warehouse.createAggRegistry(spark, table, buckets = 4)
    val b1 = Seq(Event(1, ts(0), 7, "view", 2.5),
      Event(2, ts(1), 8, "view", 1.25), Event(3, ts(2), 7, "click", -1.0))
    val b2 = Seq(Event(4, ts(3), 9, "view", 4.0))
    val input = MemoryStream[Event]
    val snaps = scala.collection.mutable.ArrayBuffer[
      (Long, Map[String, (Long, Double, Double, Double)])]()
    val q = EventStreams.aggRegistryStream(input.toDS(), table) { out =>
      val rows = out.collect()
      snaps += rows.head.getLong(5) -> rows.map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
        .toMap
    }
    try {
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    assert(snaps.map(_._1).toList == List(0L, 1L))
    assert(snaps(0)._2 == Map(
      "view" -> ((2L, 3.75, 1.25, 2.5)),
      "click" -> ((1L, -1.0, -1.0, -1.0))), snaps(0).toString)
    // after batch 2 the snapshot equals the one-shot recompute over
    // everything ever ingested
    assert(snaps(1)._2 == Map(
      "view" -> ((3L, 7.75, 1.25, 4.0)),
      "click" -> ((1L, -1.0, -1.0, -1.0))), snaps(1).toString)
  }

  test("streaming sessionization closes sessions on gap and keeps state across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val query = EventStreams.sessionize(input.toDS(), gapSec = 60)
      .writeStream.format("memory").queryName("sessions_out")
      .outputMode("append").start()
    try {
      // batch 1: two events 10s apart (same session)
      input.addData(Event(1, ts(0, 0), 7, "click", 1.0), Event(2, ts(0, 10), 7, "view", 1.0))
      query.processAllAvailable()
      // batch 2: 5 minutes later → closes session 1, opens session 2
      input.addData(Event(3, ts(5, 0), 7, "click", 1.0))
      query.processAllAvailable()
      val closed = spark.table("sessions_out")
        .as[(Long, Long, Long, Timestamp, Timestamp)].collect().toSeq
      assert(closed == Seq((7L, 1L, 2L, ts(0, 0), ts(0, 10))))
    } finally query.stop()
  }

  test("streaming sessionization flushes sessions when the watermark passes the gap") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val query = EventStreams.sessionize(input.toDS(), gapSec = 60, watermark = "1 minute")
      .writeStream.format("memory").queryName("sessions_wm_out")
      .outputMode("append").start()
    try {
      // batch 1: user 7 has two events; no later user-7 event ever arrives
      input.addData(Event(1, ts(0, 0), 7, "click", 1.0), Event(2, ts(0, 10), 7, "view", 1.0))
      query.processAllAvailable()
      // batch 2: a different user far in the future advances the watermark
      // past user 7's lastEvent+gap → the open session must flush via the
      // event-time timeout, not linger forever
      input.addData(Event(3, ts(30, 0), 9, "click", 1.0))
      query.processAllAvailable()
      // batch 3: user 7 returns — numbering must continue at session 2
      input.addData(Event(4, ts(31, 0), 7, "click", 1.0))
      query.processAllAvailable()
      input.addData(Event(5, ts(59, 0), 9, "view", 1.0))
      query.processAllAvailable()
      input.addData(Event(6, ts(59, 30), 9, "view", 1.0))
      query.processAllAvailable()
      val closed = spark.table("sessions_wm_out")
        .select("user_id", "session_id", "n_events")
        .as[(Long, Long, Long)].collect().toSet
      assert(closed.contains((7L, 1L, 2L)), s"first session not flushed by timeout: $closed")
      assert(closed.contains((7L, 2L, 1L)), s"session numbering lost after timeout: $closed")
    } finally query.stop()
  }

  test("native session_window sessionization closes sessions via the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val query = EventStreams.sessionizeNative(input.toDF(), gap = "1 minute",
        watermark = "1 minute")
      .writeStream.format("memory").queryName("native_sessions")
      .outputMode("append").start()
    try {
      input.addData(Event(1, ts(0, 0), 7, "click", 1.5), Event(2, ts(0, 30), 7, "view", 2.0))
      query.processAllAvailable()
      // far-future event advances the watermark past the session's close
      input.addData(Event(3, ts(30, 0), 9, "click", 1.0))
      query.processAllAvailable()
      input.addData(Event(4, ts(60, 0), 9, "click", 1.0))
      query.processAllAvailable()
      val rows = spark.table("native_sessions")
        .select("user_id", "n_events", "sum_value")
        .as[(Long, Long, Double)].collect().toSet
      assert(rows.contains((7L, 2L, 3.5)), s"session for user 7 not emitted: $rows")
    } finally query.stop()
  }

  test("streaming near-dup drops simhash-identical docs across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    val docs = input.toDF().toDF("doc_id", "ts", "text")
    val query = EventStreams.dedupeNear(docs, "text", "ts", "1 hour")
      .writeStream.format("memory").queryName("neardup_out")
      .outputMode("append").start()
    try {
      input.addData((1L, ts(0), "the quick brown fox jumps over the lazy dog"))
      query.processAllAvailable()
      // same token multiset, different order → identical simhash → dropped
      input.addData((2L, ts(1), "quick the brown fox jumps the over lazy dog"))
      // genuinely different content → survives
      input.addData((3L, ts(2), "completely different text about query engines"))
      query.processAllAvailable()
      val ids = spark.table("neardup_out").select("doc_id").as[Long].collect().sorted.toSeq
      assert(ids == Seq(1L, 3L), s"got $ids")
    } finally query.stop()
  }

  test("banded streaming near-dedup drops MUTATED near-dups cross-batch, like batch LSH") {
    implicit val sqlCtx = spark.sqlContext
    val base = "the quick brown fox jumps over the lazy dog while the cat sleeps " +
      "on the warm windowsill and the birds sing in the garden every morning"
    // one-token mutation: different simhash AND different full minhash
    // signature (dedupeNear's identity state misses it) but most bands agree
    val mutated = base.replace("windowsill", "doorstep")
    val distinct1 = "completely different text about distributed query engines " +
      "and their optimizers planning joins over columnar storage layouts"
    val distinct2 = "an unrelated recipe for bread with flour water salt and " +
      "patience plus a hot oven and a heavy pan for the crust"
    val input = MemoryStream[(Long, Timestamp, String)]
    val docs = input.toDF().toDF("doc_id", "ts", "text")
    // stage 1 re-emits input rows unchanged, so the conservative
    // fMGWS-feeds-stateful watermark check does not apply (scaladoc)
    spark.conf.set("spark.sql.streaming.statefulOperator.checkCorrectness.enabled", "false")
    val out = EventStreams.dedupeNearBanded(docs, "text", "doc_id", "ts",
      watermark = "10 minutes", windowLen = "1 minute")
      .writeStream.format("memory").queryName("banded_out")
      .outputMode("append").start()
    try {
      // batch 1: base + a same-batch IDENTICAL copy (winner election must
      // keep exactly one) + a distinct doc
      input.addData((1L, ts(0), base), (2L, ts(0), base), (3L, ts(0), distinct1))
      out.processAllAvailable()
      // batch 2: the cross-batch MUTATED near-dup + a fresh distinct doc
      input.addData((4L, ts(1), mutated), (5L, ts(1), distinct2))
      out.processAllAvailable()
      // push the watermark past every window so append emits the verdicts
      input.addData((99L, ts(60, 0), distinct2 + " heartbeat tail"))
      out.processAllAvailable()
      val ids = spark.table("banded_out").select("doc_id").as[Long]
        .collect().sorted.toSeq
      assert(ids == Seq(1L, 3L, 5L), s"got $ids")
      // the mutated pair really is invisible to the identity-signature
      // path: its full signatures differ, so this is banded-only recall
      val sigs = Seq(base, mutated).toDF("text")
        .select(graft.dedup.Dedup.minhashSignatureFromText($"text", 3, 64))
        .collect().map(_.getSeq[Long](0))
      assert(sigs(0) != sigs(1), "mutation did not change the full signature")
      // and the batch LSH candidate stage pairs them (same recall source)
      val cand = graft.dedup.Dedup.minhashCandidates(
        Seq((1L, base), (4L, mutated)).toDF("doc_id", "text"), "text", "doc_id")
        .as[(Long, Long)].collect().toSet
      assert(cand.contains((1L, 4L)), "batch LSH does not even pair the mutation")
    } finally {
      out.stop()
      spark.conf.unset("spark.sql.streaming.statefulOperator.checkCorrectness.enabled")
    }
  }

  test("banded stage-1 state shuffle carries skeletons only — no text payload") {
    // the band-keyed stage is the one skewable partition in the operator:
    // its input schema must stay (id, ts, band, bucket) — 4 narrow columns,
    // never the document text — so a boilerplate flood shuffles ~32-byte
    // rows, not bands × full payloads
    val docs = Seq((1L, ts(0), "some document text", "extra"))
      .toDF("doc_id", "ts", "text", "other")
    val skel = EventStreams.bandSkeletons(docs, "text", "doc_id", "ts",
      shingleK = 3, numHashes = 64, bands = 16)
    assert(skel.columns.toSeq == Seq("doc_id", "ts", "__band", "__bucket"),
      s"stage-1 schema widened: ${skel.columns.toSeq}")
    assert(!skel.columns.contains("text") && !skel.columns.contains("other"))
    // and the types really are narrow fixed-width ones
    import org.apache.spark.sql.types._
    assert(skel.schema("__band").dataType == IntegerType)
    assert(skel.schema("__bucket").dataType == LongType)
    assert(skel.count() == 16)
  }

  test("banded dedup survives a boilerplate flood batch with bounded group input") {
    // 10k identical docs in ONE micro-batch: every copy of every hot band
    // bucket funnels into a single state group — the fold must elect the
    // min-id winner without materializing the group, and exactly one of
    // the 10k survives alongside the distinct doc
    implicit val sqlCtx = spark.sqlContext
    val boiler = "subscribe to our newsletter for daily updates and offers " +
      "terms and conditions apply please read the privacy policy carefully"
    val distinct1 = "a genuinely unique article about the migration patterns " +
      "of arctic birds and the scientists who follow them across the seasons"
    val input = MemoryStream[(Long, Timestamp, String)]
    val docs = input.toDF().toDF("doc_id", "ts", "text")
    spark.conf.set("spark.sql.streaming.statefulOperator.checkCorrectness.enabled", "false")
    val out = EventStreams.dedupeNearBanded(docs, "text", "doc_id", "ts",
      watermark = "10 minutes", windowLen = "1 minute")
      .writeStream.format("memory").queryName("flood_out")
      .outputMode("append").start()
    try {
      input.addData((2L to 10001L).map(i => (i, ts(0), boiler)) :+
        (10002L, ts(0), distinct1): _*)
      out.processAllAvailable()
      input.addData((99999L, ts(60), distinct1 + " watermark heartbeat tail"))
      out.processAllAvailable()
      val ids = spark.table("flood_out").select("doc_id").as[Long]
        .collect().sorted.toSeq
      // min-id election: doc 2 is the flood's deterministic survivor
      assert(ids == Seq(2L, 10002L), s"got ${ids.take(10)}... (${ids.length} rows)")
    } finally {
      out.stop()
      spark.conf.unset("spark.sql.streaming.statefulOperator.checkCorrectness.enabled")
    }
  }

  test("banded dedup retention shorter than the watermark delay does not fail") {
    // retentionSec=0 computes timeout = lastMs, at/behind the watermark —
    // without the clamp GroupStateImpl rejects it and kills the query
    implicit val sqlCtx = spark.sqlContext
    val a = "the quick brown fox jumps over the lazy dog while the cat sleeps"
    val b = "an unrelated recipe for bread with flour water salt and patience"
    val input = MemoryStream[(Long, Timestamp, String)]
    val docs = input.toDF().toDF("doc_id", "ts", "text")
    spark.conf.set("spark.sql.streaming.statefulOperator.checkCorrectness.enabled", "false")
    val out = EventStreams.dedupeNearBanded(docs, "text", "doc_id", "ts",
      watermark = "10 minutes", windowLen = "1 minute", retentionSec = 0L)
      .writeStream.format("memory").queryName("clamp_out")
      .outputMode("append").start()
    try {
      input.addData((1L, ts(0), a), (2L, ts(20), b))
      out.processAllAvailable()
      // watermark is now ts(10); this row is late-but-admitted at ts(11)
      input.addData((3L, ts(11), a + " slightly mutated tail of words"))
      out.processAllAvailable()
      input.addData((9L, ts(59), b + " watermark heartbeat tail"))
      out.processAllAvailable()
      assert(out.exception.isEmpty, s"query failed: ${out.exception}")
      val ids = spark.table("clamp_out").select("doc_id").as[Long]
        .collect().sorted.toSeq
      assert(ids.contains(1L) && ids.contains(2L), s"got $ids")
    } finally {
      out.stop()
      spark.conf.unset("spark.sql.streaming.statefulOperator.checkCorrectness.enabled")
    }
  }

  test("streaming exact dedup drops repeated content across batches") {
    implicit val sqlCtx = spark.sqlContext
    case class Doc(doc_id: Long, ts: Timestamp, text: String)
    val input = MemoryStream[Event]
    val query = graft.streaming.EventStreams
      .dedupeExact(input.toDF(), "event_type", "ts", "1 hour")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      input.addData(Event(1, ts(0), 1, "samecontent", 1.0),
        Event(2, ts(1), 2, "samecontent", 1.0),
        Event(3, ts(2), 3, "other", 1.0))
      query.processAllAvailable()
      input.addData(Event(4, ts(3), 4, "samecontent", 1.0)) // dup in later batch
      query.processAllAvailable()
      val ids = spark.table("dedup_out").select("event_id")
        .as[Long].collect().sorted.toSeq
      assert(ids == Seq(1L, 3L))
    } finally query.stop()
  }

  test("streaming sessionization (closed+open) equals the batch e02 query on real events") {
    implicit val sqlCtx = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val eventsDf = graft.Tables(spark, sf, "events")
    val events = eventsDf.select(
      col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Event]
    val input = MemoryStream[Event]
    val query = graft.streaming.EventStreams.sessionize(input.toDS(), gapSec = 1800)
      .writeStream.format("memory").queryName("real_sessions")
      .outputMode("append").start()
    try {
      // two batches split at the median timestamp to exercise cross-batch state
      val all = events.collect().sortBy(_.ts.getTime)
      val (b1, b2) = all.splitAt(all.length / 2)
      input.addData(b1.toSeq); query.processAllAvailable()
      input.addData(b2.toSeq); query.processAllAvailable()
      val closed = spark.table("real_sessions")
        .select("user_id", "session_id", "n_events").as[(Long, Long, Long)].collect()
      val open = graft.streaming.EventStreams.openSessions(events, gapSec = 1800)
        .map(s => (s.user_id, s.session_id, s.n_events)).collect()
      val streamed = (closed ++ open).toSet
      val batch = graft.queries.Events.queries("e02_sessionize")(spark, sf)
        .select("user_id", "session_id", "n_events").as[(Long, Long, Long)]
        .collect().toSet
      assert(streamed == batch)
    } finally query.stop()
  }

  test("batch sessionization helper reports open sessions") {
    val events = Seq(
      Event(1, ts(0), 9, "click", 1.0),
      Event(2, ts(10), 9, "view", 1.0)).toDS()
    val open = EventStreams.openSessions(events, gapSec = 60).collect().toSeq
    assert(open.map(s => (s.user_id, s.session_id, s.n_events)) == Seq((9L, 2L, 1L)))
  }

  test("streaming tumbling agg over the real events table via file source") {
    // the driver's events parquet consumed as a stream: same transform as
    // e01_tumbling, incremental execution, results equal to the batch run
    val sf = "/root/testdata/sf0.001"
    graft.Tables(spark, sf, "events") // sets the nanosAsLong conf
    val rawSchema = spark.read.parquet(s"$sf/events.parquet").schema
    // file streams take a directory of files
    val dir = java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get("target/tmp/events_stream"))
    java.nio.file.Files.copy(java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    // mirror Tables' ts normalization: nanos-as-long in old testdata
    // generations, TIMESTAMP(MICROS) (read as NTZ) in newer ones
    val raw = spark.readStream.schema(rawSchema).parquet(dir.toString)
    val stream = rawSchema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => raw.withColumn("ts", col("ts").cast("timestamp"))
    }
    val query = graft.streaming.EventStreams.tumbling(stream)
      .writeStream.format("memory").queryName("file_tumbling")
      .outputMode("complete").start()
    try {
      query.processAllAvailable()
      val streamed = spark.table("file_tumbling").count()
      val batch = graft.queries.Events.queries("e01_tumbling")(spark, sf).count()
      assert(streamed == batch && streamed > 0)
    } finally query.stop()
  }

  test("curateDocs line cleanup + caps mirror batch curate's stages") {
    implicit val sqlCtx = spark.sqlContext
    val english = "the quick brown fox jumps over the lazy dog and it was happy for the day " * 3
    val bullets = (1 to 12).map(i => s"- item $i").mkString("\n")
    val input = MemoryStream[(Long, Timestamp, String)]
    val docs = input.toDF().toDF("doc_id", "ts", "text")
    val q = EventStreams.curateDocs(docs, "text", "ts",
      langs = Set("en"), minQuality = 0.3,
      dropRepeatedLines = true, maxBulletFrac = 0.6)
      .writeStream.format("memory").queryName("curate_lines_out")
      .outputMode("append").start()
    try {
      input.addData(
        (1L, ts(0), english + "one\nfooter nav\nfooter nav"),
        (2L, ts(1), english + "one\n" + bullets)) // bullet spam → gated
      q.processAllAvailable()
      // batch 2: the same page refetched with one MORE footer repeat —
      // cleaned text identical, so the exact state must drop it
      input.addData(
        (3L, ts(2), english + "one\nfooter nav\nfooter nav\nfooter nav"),
        (4L, ts(3), english + "two\nfooter nav"))
      q.processAllAvailable()
      val rows = spark.table("curate_lines_out").collect()
      val ids = rows.map(_.getAs[Long]("doc_id")).sorted.toSeq
      assert(ids == Seq(1L, 4L), s"survivors: $ids")
      val t1 = rows.find(_.getAs[Long]("doc_id") == 1L).get.getAs[String]("text")
      assert(t1.endsWith("one\nfooter nav"), t1)
    } finally q.stop()
  }

  test("curateDocs blocklist gates: domain/word/phrase lists drop on arrival") {
    implicit val sqlCtx = spark.sqlContext
    val english = "the quick brown fox jumps over the lazy dog and it was happy for the day " * 3
    val input = MemoryStream[(Long, Timestamp, String, String)]
    val docs = input.toDF().toDF("doc_id", "ts", "text", "url")
    val q = EventStreams.curateDocs(docs, "text", "ts",
      langs = Set("en"), minQuality = 0.1,
      blockedDomains = Seq("bad.example.com"),
      blockedWords = Seq("forbiddenword"),
      blockedPhrases = Seq("secret handshake spans"))
      .writeStream.format("memory").queryName("curate_block_out")
      .outputMode("append").start()
    try {
      input.addData(
        (1L, ts(0), english + "one", "https://ok.example.org/a"),
        (2L, ts(1), english + "two", "https://cdn.bad.example.com/x"), // subdomain
        (3L, ts(2), english + "forbiddenword tail", "https://ok2.example.org/b"),
        (4L, ts(3), english + "the secret handshake spans tokens", "https://ok3.example.org/c"),
        (5L, ts(4), english + "three", null.asInstanceOf[String])) // null URL keeps
      q.processAllAvailable()
      val ids = spark.table("curate_block_out")
        .select("doc_id").as[Long].collect().sorted.toSeq
      assert(ids == Seq(1L, 5L), s"survivors: $ids")
    } finally q.stop()
  }

  test("streaming curateDocs gates, splits, dedups across batches, and redacts") {
    implicit val sqlCtx = spark.sqlContext
    val english = "the quick brown fox jumps over the lazy dog and it was happy for the day " * 3
    val input = MemoryStream[(Long, Timestamp, String)]
    val docs = input.toDF().toDF("doc_id", "ts", "text")
    val query = EventStreams.curateDocs(docs, "text", "ts",
      langs = Set("en"), minQuality = 0.5)
      .writeStream.format("memory").queryName("curate_stream_out")
      .outputMode("append").start()
    try {
      input.addData(
        (1L, ts(0), english + "one contact admin@example.net please"),
        (2L, ts(1), "le chat est dans la maison et il est content et le jour est bon " * 3),
        (3L, ts(2), "x"))
      query.processAllAvailable()
      // batch 2: an exact dup of doc 1 arrives later — state must drop it
      input.addData(
        (4L, ts(3), english + "one contact admin@example.net please"),
        (5L, ts(4), english + "two"))
      query.processAllAvailable()
      val out = spark.table("curate_stream_out")
        .select("doc_id", "lang", "split", "text")
        .as[(Long, String, String, String)].collect().sortBy(_._1).toSeq
      assert(out.map(_._1) == Seq(1L, 5L), s"survivors: ${out.map(_._1)}")
      assert(out.forall(_._2 == "en"))
      assert(out.forall(r => Set("train", "val", "test")(r._3)))
      // PII redacted after dedup, before the sink
      assert(out.head._4.contains("<EMAIL>") && !out.head._4.contains("admin@"))
      // the split hash is taken on RAW text: batch ingestion of the same
      // document must land in the same split
      val batchSplit = Seq(Tuple1(english + "two")).toDF("text")
        .select(graft.text.TextOps.splitAssign($"text")).as[String].head()
      assert(out.find(_._1 == 5L).get._3 == batchSplit)
    } finally query.stop()
  }

  test("curateDocs with nearDedupIdCol drops mutated near-dups in the intake") {
    implicit val sqlCtx = spark.sqlContext
    val base = "the quick brown fox jumps over the lazy dog while the cat sleeps " +
      "on the warm windowsill and the birds sing in the garden every morning " +
      "as the sun rises over the quiet town and the day begins for everyone"
    val mutated = base.replace("windowsill", "doorstep") // different signature
    val distinct1 = "an entirely different english document about the history of " +
      "the spark engine that is long enough to pass the quality gate and it was " +
      "written for this test of the streaming intake path with banded dedup"
    val input = MemoryStream[(Long, Timestamp, String)]
    val docs = input.toDF().toDF("doc_id", "ts", "text")
    spark.conf.set("spark.sql.streaming.statefulOperator.checkCorrectness.enabled", "false")
    val query = EventStreams.curateDocs(docs, "text", "ts",
      langs = Set("en"), minQuality = 0.5,
      watermark = "10 minutes", nearDedupIdCol = Some("doc_id"))
      .writeStream.format("memory").queryName("curate_banded_out")
      .outputMode("append").start()
    try {
      input.addData((1L, ts(0), base), (2L, ts(0), distinct1))
      query.processAllAvailable()
      // batch 2: the cross-batch MUTATED near-dup (invisible to exact dedup)
      input.addData((3L, ts(1), mutated))
      query.processAllAvailable()
      // push the watermark so the per-doc verdicts emit
      input.addData((99L, ts(60, 0), distinct1 + " heartbeat tail of words"))
      query.processAllAvailable()
      val out = spark.table("curate_banded_out")
        .select("doc_id", "lang", "split")
        .as[(Long, String, String)].collect().sortBy(_._1).toSeq
      assert(out.map(_._1) == Seq(1L, 2L), s"survivors: ${out.map(_._1)}")
      assert(out.forall(r => r._2 == "en" && Set("train", "val", "test")(r._3)))
    } finally {
      query.stop()
      spark.conf.unset("spark.sql.streaming.statefulOperator.checkCorrectness.enabled")
    }
  }

  test("curateDocs probes a persisted MinHash index: historical replays dropped, index unmutated") {
    implicit val sqlCtx = spark.sqlContext
    val base = "the quick brown fox jumps over the lazy dog while the cat sleeps " +
      "on the warm windowsill and the birds sing in the garden every morning " +
      "as the sun rises over the quiet town and the day begins for everyone"
    val mutated = base.replace("windowsill", "doorstep") // near-dup of the INDEXED corpus
    val fresh = "an entirely different english document about the history of " +
      "the spark engine that is long enough to pass the quality gate and it was " +
      "written for this test of the streaming intake path with the index probe"
    import graft.dedup.Dedup
    import graft.sources.Warehouse
    for (tb <- Seq("mhprobe_idx", "mhprobe_idx_sigs", "mhprobe_idx_mhspec"))
      Warehouse.dropTableAndLocation(spark, tb)
    // "historical corpus" indexed by a prior batch run
    Dedup.writeMinhashIndex(Seq((100L, base)).toDF("doc_id", "text"),
      "text", "doc_id", "mhprobe_idx", buckets = 2)
    val idxBefore = spark.table("mhprobe_idx").count()
    val sigsBefore = spark.table("mhprobe_idx_sigs").count()
    val input = MemoryStream[(Long, Timestamp, String)]
    val docs = input.toDF().toDF("doc_id", "ts", "text")
    val query = EventStreams.curateDocs(docs, "text", "ts",
      langs = Set("en"), minQuality = 0.5, watermark = "10 minutes",
      nearIndexTable = Some("mhprobe_idx"), nearIndexIdCol = Some("doc_id"))
      .writeStream.format("memory").queryName("curate_probe_out")
      .outputMode("append").start()
    try {
      // batch 1: a MUTATED replay of the indexed doc (invisible to any
      // exact tier) plus a genuinely fresh doc
      input.addData((1L, ts(0), mutated), (2L, ts(1), fresh))
      query.processAllAvailable()
      // advance the watermark so the probe's verdict windows close
      input.addData((99L, ts(60, 0), fresh + " heartbeat tail of words"))
      query.processAllAvailable()
      val out = spark.table("curate_probe_out")
        .select("doc_id").as[Long].collect().sorted.toSeq
      assert(out == Seq(2L), s"survivors: $out")
      // the stream only PROBES: the index is not grown by the micro-batches
      assert(spark.table("mhprobe_idx").count() == idxBefore)
      assert(spark.table("mhprobe_idx_sigs").count() == sigsBefore)
    } finally query.stop()
  }

  test("curateDocs fuses the index probe into banded near-dedup: both tiers drop in one verdict") {
    implicit val sqlCtx = spark.sqlContext
    val base = "the quick brown fox jumps over the lazy dog while the cat sleeps " +
      "on the warm windowsill and the birds sing in the garden every morning " +
      "as the sun rises over the quiet town and the day begins for everyone"
    val mutated = base.replace("windowsill", "doorstep")
    val fresh = "an entirely different english document about the history of " +
      "the spark engine that is long enough to pass the quality gate and it was " +
      "written for this test of the streaming intake path with the fused probe"
    val freshMutated = fresh.replace("history", "story")
    import graft.dedup.Dedup
    import graft.sources.Warehouse
    for (tb <- Seq("mhfuse_idx", "mhfuse_idx_sigs", "mhfuse_idx_mhspec"))
      Warehouse.dropTableAndLocation(spark, tb)
    Dedup.writeMinhashIndex(Seq((100L, base)).toDF("doc_id", "text"),
      "text", "doc_id", "mhfuse_idx", buckets = 2)
    val input = MemoryStream[(Long, Timestamp, String)]
    val docs = input.toDF().toDF("doc_id", "ts", "text")
    spark.conf.set("spark.sql.streaming.statefulOperator.checkCorrectness.enabled", "false")
    val query = EventStreams.curateDocs(docs, "text", "ts",
      langs = Set("en"), minQuality = 0.5, watermark = "10 minutes",
      nearDedupIdCol = Some("doc_id"), nearIndexTable = Some("mhfuse_idx"))
      .writeStream.format("memory").queryName("curate_fused_out")
      .outputMode("append").start()
    try {
      // 1 = mutated replay of the INDEXED corpus (cross-run tier drops it);
      // 2 = fresh (survives both tiers)
      input.addData((1L, ts(0), mutated), (2L, ts(0), fresh))
      query.processAllAvailable()
      // 3 = within-stream mutated near-dup of 2 (banded tier drops it)
      input.addData((3L, ts(1), freshMutated))
      query.processAllAvailable()
      input.addData((99L, ts(60, 0), fresh + " heartbeat tail of words"))
      query.processAllAvailable()
      val out = spark.table("curate_fused_out")
        .select("doc_id").as[Long].collect().sorted.toSeq
      assert(out == Seq(2L), s"survivors: $out")
    } finally {
      query.stop()
      spark.conf.unset("spark.sql.streaming.statefulOperator.checkCorrectness.enabled")
    }
    // a probe id conflicting with the banded id is rejected, not ignored
    val e = intercept[IllegalArgumentException] {
      EventStreams.curateDocs(docs, "text", "ts",
        langs = Set("en"), minQuality = 0.5,
        nearDedupIdCol = Some("doc_id"), nearIndexTable = Some("mhfuse_idx"),
        nearIndexIdCol = Some("other_id"))
    }
    assert(e.getMessage.contains("conflicts"))
  }

  test("streaming curateDocs decontaminates against a benchmark map-side") {
    implicit val sqlCtx = spark.sqlContext
    val english = "the quick brown fox jumps over the lazy dog and it was happy for the day " * 3
    val leak = "held out benchmark question on engines and the joins that they run in time"
    val bench = Seq((100L, leak)).toDF("doc_id", "text")
    val input = MemoryStream[(Long, Timestamp, String)]
    val docs = input.toDF().toDF("doc_id", "ts", "text")
    val query = EventStreams.curateDocs(docs, "text", "ts",
      langs = Set("en"), minQuality = 0.5,
      benchmark = Some(bench), contaminationNgram = 5)
      .writeStream.format("memory").queryName("curate_decon_out")
      .outputMode("append").start()
    try {
      input.addData(
        (1L, ts(0), english + "one"),    // clean twin — must survive
        (2L, ts(1), english + leak))     // quotes the benchmark verbatim
      query.processAllAvailable()
      // a contaminated doc arriving in a LATER batch is still dropped: the
      // broadcast Bloom filter is stateless, not tied to the first batch
      input.addData((3L, ts(2), english + "three " + leak))
      query.processAllAvailable()
      val out = spark.table("curate_decon_out").select("doc_id")
        .as[Long].collect().sorted.toSeq
      assert(out == Seq(1L), s"survivors: $out")
      // parity with the batch curate-with-benchmark path on the same rows
      val batchDocs = Seq(
        (1L, english + "one"), (2L, english + leak),
        (3L, english + "three " + leak)).toDF("doc_id", "text")
      val batchOut = graft.pipeline.CorpusPipeline.curate(batchDocs, "text", "doc_id",
        graft.pipeline.CorpusPipeline.Config(langs = Set("en"), minQuality = 0.5,
          nearDupThreshold = 2.0, contaminationNgram = 5, redactPii = true),
        Some(bench)).select("doc_id").as[Long].collect().sorted.toSeq
      assert(batchOut == out, s"stream $out != batch $batchOut")
    } finally query.stop()
  }

  test("multimodal: asMedia wraps binary with typed metadata schema") {
    val df = Seq((1L, "fakejpegbytes"), (2L, "otherbytes")).toDF("id", "payload")
      .withColumn("payload", col("payload").cast("binary"))
    val media = Multimodal.asMedia(df, "id", "payload", "image/jpeg")
    assert(media.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      Multimodal.mediaSchema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(media.count() == 2)
  }

  test("multimodal: feature extraction is deterministic, batched, fixed-dim") {
    val df = Seq((1L, "aaa"), (2L, "bbb"), (3L, "aaa")).toDF("id", "payload")
      .withColumn("payload", col("payload").cast("binary"))
    val media = Multimodal.asMedia(df, "id", "payload", "application/octet-stream")
    val feats = Multimodal.extractFeatures(media, dim = 8)
      .as[(Long, Seq[Float])].collect().sortBy(_._1)
    assert(feats.forall(_._2.length == 8))
    assert(feats(0)._2 == feats(2)._2) // same bytes → same features
    assert(feats(0)._2 != feats(1)._2)
  }

  test("multimodal: real PPM decode produces grid-color features") {
    import graft.multimodal.PpmCodec
    // 4x2 image: left half red, right half blue
    val rgb = Array.tabulate(4 * 2 * 3) { i =>
      val px = i / 3
      val x = px % 4
      ((i % 3, x < 2) match {
        case (0, true) => 255; case (2, false) => 255; case _ => 0
      }).toByte
    }
    val ppm = PpmCodec.encode(PpmCodec.Image(4, 2, rgb))
    val df = Seq((1L, ppm)).toDF("id", "payload")
    val media = Multimodal.asMedia(df, "id", "payload", "image/x-portable-pixmap")
    val feats = Multimodal.extractFeatures(media, dim = 12)
      .as[(Long, Seq[Float])].collect().head._2
    // grid cells: TL,TR,BL,BR — left cells pure red, right cells pure blue
    assert(feats(0) == 1.0f && feats(1) == 0.0f && feats(2) == 0.0f) // TL = red
    assert(feats(3) == 0.0f && feats(5) == 1.0f)                     // TR = blue
  }

  test("multimodal: PGM and PBM decode to gray/bilevel RGB rasters") {
    import graft.multimodal.PpmCodec
    // P5: 2x1, black then mid-gray
    val pgm = "P5\n2 1\n255\n".getBytes("US-ASCII") ++ Array[Byte](0, 128.toByte)
    val g = PpmCodec.decode(pgm).get
    assert(g.width == 2 && g.height == 1)
    assert(g.rgb.toSeq == Seq[Byte](0, 0, 0, 128.toByte, 128.toByte, 128.toByte))
    // P4: 9x1 → 2 row bytes; first bit set (black), rest white
    val pbm = "P4\n9 1\n".getBytes("US-ASCII") ++ Array[Byte](0x80.toByte, 0x00)
    val b = PpmCodec.decode(pbm).get
    assert(b.width == 9 && b.height == 1)
    assert(b.rgb(0) == 0 && b.rgb(3) == -1 && b.rgb(24) == -1) // black, white, white
    // features pipeline accepts them end to end
    val df = Seq((1L, pgm), (2L, pbm)).toDF("id", "payload")
    val media = graft.multimodal.Multimodal.asMedia(df, "id", "payload", "image/x-portable-anymap")
    val feats = graft.multimodal.Multimodal.extractFeatures(media, dim = 12)
      .as[(Long, Seq[Float])].collect().toMap
    assert(feats(1L).length == 12 && feats(2L).length == 12)
    assert(feats(2L)(0) == 0.8f) // first cell: 4 of 5 pixels white → 0.8
  }

  test("multimodal: PPM resize re-encodes pixels at the new dimensions") {
    import graft.multimodal.PpmCodec
    val rgb = Array.fill(8 * 8 * 3)(200.toByte)
    val ppm = PpmCodec.encode(PpmCodec.Image(8, 8, rgb))
    val df = Seq((1L, ppm)).toDF("id", "payload")
    val media = Multimodal.asMedia(df, "id", "payload", "image/x-portable-pixmap")
    val resized = Multimodal.resize(media, 4, 4)
    val out = resized.select("content").as[Array[Byte]].head()
    val img = PpmCodec.decode(out).get
    assert(img.width == 4 && img.height == 4 && img.rgb.length == 4 * 4 * 3)
    assert(resized.select("width").head().getInt(0) == 4)
  }

  test("multimodal: real PNG/BMP decode via the JDK matches the PPM raster") {
    import graft.multimodal.{ImageCodec, PpmCodec}
    // same 4x2 left-red/right-blue raster as the PPM test, encoded as PNG
    val rgb = Array.tabulate(4 * 2 * 3) { i =>
      val px = i / 3
      val x = px % 4
      ((i % 3, x < 2) match {
        case (0, true) => 255; case (2, false) => 255; case _ => 0
      }).toByte
    }
    val raster = PpmCodec.Image(4, 2, rgb)
    val png = ImageCodec.encodePng(raster)
    // it really is a PNG, and the JDK decodes it back to the exact raster
    assert(png.take(4).toSeq == Seq[Byte](0x89.toByte, 'P', 'N', 'G'))
    assert(ImageCodec.decode(png).get.rgb.toSeq == raster.rgb.toSeq)
    // end to end: PNG content produces the same REAL features as PPM
    val df = Seq((1L, png), (2L, PpmCodec.encode(raster))).toDF("id", "payload")
    val media = Multimodal.asMedia(df, "id", "payload", "image/png")
    val feats = Multimodal.extractFeatures(media, dim = 12)
      .as[(Long, Seq[Float])].collect().toMap
    assert(feats(1L) == feats(2L), "PNG and PPM of one raster diverged")
    assert(feats(1L)(0) == 1.0f && feats(1L)(1) == 0.0f) // TL = red — not stub noise
  }

  test("multimodal: resize resamples PNG content and updates the mime") {
    import graft.multimodal.{ImageCodec, PpmCodec}
    val png = ImageCodec.encodePng(PpmCodec.Image(8, 8, Array.fill(8 * 8 * 3)(200.toByte)))
    val df = Seq((1L, png)).toDF("id", "payload")
    val media = Multimodal.asMedia(df, "id", "payload", "image/png")
    val resized = Multimodal.resize(media, 4, 4)
    val row = resized.select("content", "mime", "width").head()
    val img = ImageCodec.decode(row.getAs[Array[Byte]](0)).get
    assert(img.width == 4 && img.height == 4)
    assert(img.rgb.forall(_ == 200.toByte))
    assert(row.getString(1) == "image/png" && row.getInt(2) == 4)
  }

  test("multimodal: corrupt blobs fall back to stub features, never fail") {
    val df = Seq((1L, "P6 not really a ppm"), (2L, "junk")).toDF("id", "payload")
      .withColumn("payload", col("payload").cast("binary"))
    val media = Multimodal.asMedia(df, "id", "payload", "image/x-portable-pixmap")
    val feats = Multimodal.extractFeatures(media, dim = 12)
      .as[(Long, Seq[Float])].collect()
    assert(feats.length == 2 && feats.forall(_._2.length == 12))
  }

  test("multimodal: perceptual dedup collapses re-encoded, resized, and near twins") {
    import graft.multimodal.{ImageCodec, PpmCodec}
    // base: left half black, right half white (a real luminance gradient —
    // dHash compares horizontal neighbors)
    def halves(lightLeft: Boolean) = Array.tabulate(8 * 8 * 3) { i =>
      val x = (i / 3) % 8
      (if ((x < 4) == lightLeft) 255 else 0).toByte
    }
    val base = PpmCodec.Image(8, 8, halves(lightLeft = false))
    // near twin: one white pixel in the black half flips exactly one
    // comparison bit after the 9x8 grid resample
    val nearRgb = halves(lightLeft = false)
    nearRgb(0) = 255.toByte; nearRgb(1) = 255.toByte; nearRgb(2) = 255.toByte
    val near = PpmCodec.Image(8, 8, nearRgb)
    val reversed = PpmCodec.Image(8, 8, halves(lightLeft = true))
    val df = Seq(
      (1L, PpmCodec.encode(base)),                       // cluster: PPM
      (2L, ImageCodec.encodePng(base)),                  // cluster: PNG re-encode
      (3L, PpmCodec.encode(PpmCodec.resize(base, 4, 4))), // cluster: resized copy
      (4L, PpmCodec.encode(near)),                       // cluster: 1-bit near twin
      (5L, ImageCodec.encodePng(reversed)),              // distinct — survives
      (6L, "definitely not an image".getBytes("UTF-8"))  // corrupt — survives
    ).toDF("id", "payload")
    val media = Multimodal.asMedia(df, "id", "payload", "image/mixed")
    val hashes = Multimodal.perceptualHash(media)
      .select("media_id", "phash").as[(Long, Option[Long])].collect().toMap
    // re-encode and blocky resize are hash-IDENTICAL; the tweak is 1 bit;
    // the reversed gradient is far outside the radius; corrupt is null
    assert(hashes(1L).isDefined && hashes(1L) == hashes(2L) && hashes(1L) == hashes(3L))
    assert(hashes(6L).isEmpty)
    def dist(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(dist(hashes(1L).get, hashes(4L).get) == 1,
      s"near twin distance: ${dist(hashes(1L).get, hashes(4L).get)}")
    assert(dist(hashes(1L).get, hashes(5L).get) > 4,
      s"distinct image too close: ${dist(hashes(1L).get, hashes(5L).get)}")
    val out = Multimodal.dedupePerceptual(media, maxHamming = 4)
    val ids = out.select("media_id").as[Long].collect().sorted.toSeq
    assert(ids == Seq(1L, 5L, 6L), s"survivors: $ids")
  }

  test("multimodal: perceptual dedup survives an image flood via the exact tier") {
    import graft.multimodal.PpmCodec
    // 5k re-posts of one image + 2 distinct: identical fingerprints must
    // collapse in the exact groupBy BEFORE the banded quadratic stage, so
    // the flood contributes exactly ONE row to the band self-join
    def solidPpm(v: Int) = PpmCodec.encode(
      PpmCodec.Image(4, 4, Array.tabulate(4 * 4 * 3)(i =>
        (if ((i / 3) % 4 < 2) v else 255 - v).toByte)))
    val flood = (1L to 5000L).map(i => (i, solidPpm(10)))
    val rest = Seq((9001L, solidPpm(200)), (9002L, solidPpm(120)))
    val df = (flood ++ rest).toDF("id", "payload")
    val media = Multimodal.asMedia(df, "id", "payload", "image/x-portable-pixmap")
    val out = Multimodal.dedupePerceptual(media, maxHamming = 2)
      .select("media_id").as[Long].collect().sorted.toSeq
    // min-id representative of the flood + the distinct images (whose own
    // hashes differ from each other and the flood by > 2 bits or collapse
    // legitimately — pin exact expectation)
    assert(out.head == 1L, s"flood representative wrong: ${out.take(3)}")
    assert(out.size <= 3 && out.contains(1L), s"survivors: $out")
    assert(!out.exists(i => i > 1L && i <= 5000L), "flood member survived")
  }

  test("multimodal: perceptual registry dedups re-encoded media across runs") {
    import graft.multimodal.{ImageCodec, PpmCodec}
    def halves(lightLeft: Boolean) = Array.tabulate(8 * 8 * 3) { i =>
      val x = (i / 3) % 8
      (if ((x < 4) == lightLeft) 255 else 0).toByte
    }
    val base = PpmCodec.Image(8, 8, halves(lightLeft = false))
    val reversed = PpmCodec.Image(8, 8, halves(lightLeft = true))
    graft.sources.Warehouse.dropTableAndLocation(spark, "preg_test")
    Multimodal.createPerceptualRegistry(spark, "preg_test", buckets = 4)
    def media(rows: (Long, Array[Byte])*) = Multimodal.asMedia(
      rows.toDF("id", "payload"), "id", "payload", "image/mixed")
    // run 1: PPM + its PNG re-encode (same fingerprint — keep-min), plus
    // a corrupt blob (survives, never registers)
    val out1 = Multimodal.dedupePerceptualAgainstRegistry(media(
        1L -> PpmCodec.encode(base),
        2L -> ImageCodec.encodePng(base),
        3L -> "corrupt one".getBytes("UTF-8")), "preg_test")
      .select("media_id").as[Long].collect().sorted.toSeq
    assert(out1 == Seq(1L, 3L), s"run 1 survivors: $out1")
    assert(spark.table("preg_test").count() == 1)
    // run 2: a PNG re-post AND a blocky resize of run 1's image are both
    // dropped by the registry (re-encode/resize are fingerprint-exact);
    // new content registers; corrupt still passes
    val out2 = Multimodal.dedupePerceptualAgainstRegistry(media(
        10L -> ImageCodec.encodePng(base),
        11L -> PpmCodec.encode(PpmCodec.resize(base, 4, 4)),
        12L -> ImageCodec.encodePng(reversed),
        13L -> "corrupt two".getBytes("UTF-8")), "preg_test")
      .select("media_id").as[Long].collect().sorted.toSeq
    assert(out2 == Seq(12L, 13L), s"run 2 survivors: $out2")
    assert(spark.table("preg_test").count() == 2)
    // report-only replay: run 2's new image is registered now, so only
    // the (evidence-free) corrupt blob survives — and nothing grows
    val out3 = Multimodal.dedupePerceptualAgainstRegistry(media(
        20L -> ImageCodec.encodePng(reversed),
        21L -> "corrupt three".getBytes("UTF-8")), "preg_test",
        update = false)
      .select("media_id").as[Long].collect().sorted.toSeq
    assert(out3 == Seq(21L), s"report-only survivors: $out3")
    assert(spark.table("preg_test").count() == 2,
      "update=false must not append")
  }

  test("multimodal: perceptual hamming index dedups NEAR replays across runs") {
    import graft.multimodal.{ImageCodec, PpmCodec}
    import graft.dedup.Dedup
    def halves(lightLeft: Boolean) = Array.tabulate(8 * 8 * 3) { i =>
      val x = (i / 3) % 8
      (if ((x < 4) == lightLeft) 255 else 0).toByte
    }
    val base = PpmCodec.Image(8, 8, halves(lightLeft = false))
    // near replay: one corner pixel flipped — 1 dHash bit (pinned in the
    // batch perceptual spec); far outside: the reversed gradient
    val nearRgb = halves(lightLeft = false)
    nearRgb(0) = 255.toByte; nearRgb(1) = 255.toByte; nearRgb(2) = 255.toByte
    val near = PpmCodec.Image(8, 8, nearRgb)
    val reversed = PpmCodec.Image(8, 8, halves(lightLeft = true))
    for (t <- Seq("pham_idx", "pham_idx_hspec"))
      graft.sources.Warehouse.dropTableAndLocation(spark, t)
    def media(rows: (Long, Array[Byte])*) = Multimodal.asMedia(
      rows.toDF("id", "payload"), "id", "payload", "image/mixed")
    // day 0: index the historical image corpus's fingerprints
    Dedup.writeHammingIndex(
      Multimodal.perceptualHash(media(100L -> PpmCodec.encode(base)))
        .select($"media_id".as("id"), $"phash".as("h")),
      "pham_idx", maxHamming = 4, buckets = 4)
    // run 1: the 1-bit NEAR replay (the exact-fingerprint registry would
    // miss it) drops; new content + corrupt survive, survivor registers
    val out1 = Multimodal.dedupePerceptualAgainstIndex(media(
        1L -> PpmCodec.encode(near),
        2L -> ImageCodec.encodePng(reversed),
        3L -> "corrupt blob".getBytes("UTF-8")), "pham_idx")
      .select("media_id").as[Long].collect().sorted.toSeq
    assert(out1 == Seq(2L, 3L), s"run 1 survivors: $out1")
    // run 2: a re-encode of run 1's survivor is caught by the grown index
    val out2 = Multimodal.dedupePerceptualAgainstIndex(media(
        10L -> PpmCodec.encode(reversed)), "pham_idx", update = false)
      .select("media_id").as[Long].collect().toSeq
    assert(out2.isEmpty, s"run 2 survivors: $out2")
  }

  test("streaming hamming-index probe drops mutated replays of the indexed corpus in batch 1") {
    implicit val sqlCtx = spark.sqlContext
    val base = "the quick brown fox jumps over the lazy dog while the cat sleeps " +
      "on the warm windowsill and the birds sing in the garden every morning " +
      "as the sun rises over the quiet town and the day begins for everyone"
    val mutated = base.replace("windowsill", "doorstep") // flips few SimHash bits
    val fresh = "an entirely different document about distributed query engines " +
      "and their optimizers planning joins over columnar storage layouts for " +
      "modern large scale analytics workloads running in production clusters"
    import graft.dedup.Dedup
    import graft.sources.Warehouse
    for (tb <- Seq("hprobe_idx", "hprobe_idx_hspec"))
      Warehouse.dropTableAndLocation(spark, tb)
    // historical corpus indexed by a prior batch run, radius 6
    Dedup.writeHammingIndex(
      Seq((100L, base)).toDF("doc_id", "text")
        .select($"doc_id".as("id"), Dedup.simhash($"text").as("h")),
      "hprobe_idx", maxHamming = 6, buckets = 2)
    val idxBefore = spark.table("hprobe_idx").count()
    val input = MemoryStream[(Long, Timestamp, String)]
    val docs = input.toDF().toDF("doc_id", "ts", "text")
    val query = EventStreams.dedupeSimhashAgainstIndex(docs, "text", "doc_id",
        "ts", "hprobe_idx", watermark = "10 minutes")
      .writeStream.format("memory").queryName("hprobe_out")
      .outputMode("append").start()
    try {
      // batch 1: a MUTATED replay of the indexed doc (an exact registry
      // would miss it), a fresh doc, and a null-text row (no evidence)
      input.addData((1L, ts(0), mutated), (2L, ts(1), fresh),
        (3L, ts(2), null.asInstanceOf[String]))
      query.processAllAvailable()
      // advance the watermark so the verdict windows close
      input.addData((99L, ts(60, 0), fresh + " heartbeat tail"))
      query.processAllAvailable()
      val out = spark.table("hprobe_out")
        .select("doc_id").as[Long].collect().sorted.toSeq
      assert(out == Seq(2L, 3L), s"survivors: $out")
      // the stream only PROBES — the index is never stream-mutated
      assert(spark.table("hprobe_idx").count() == idxBefore)
    } finally query.stop()
  }

  test("streaming semantic-index probe drops cosine replays of the indexed corpus in batch 1") {
    implicit val sqlCtx = spark.sqlContext
    import graft.similarity.Similarity
    import graft.sources.Warehouse
    for (tb <- Seq("semprobe_idx", "semprobe_idx_centroids"))
      Warehouse.dropTableAndLocation(spark, tb)
    // historical corpus indexed by a prior batch run
    Similarity.writeIvfIndex(
      Seq((100L, Seq(1f, 0f, 0f, 0f)), (101L, Seq(0f, 1f, 0f, 0f)))
        .toDF("doc_id", "emb"),
      "doc_id", "emb", "semprobe_idx", nCentroids = 2, lloydIters = 1,
      buckets = 2)
    val idxBefore = spark.table("semprobe_idx").count()
    val input = MemoryStream[(Long, Timestamp, Seq[Float])]
    val docs = input.toDF().toDF("doc_id", "ts", "emb")
    val query = EventStreams.dedupeSemanticAgainstIndex(docs, "emb", "doc_id",
        "ts", "semprobe_idx", threshold = 0.9, watermark = "10 minutes")
      .writeStream.format("memory").queryName("semprobe_out")
      .outputMode("append").start()
    try {
      // batch 1: a SCALED replay of an indexed vector (cosine 1.0 with no
      // shared text or fingerprint bits — only the semantic identity sees
      // it), an orthogonal fresh vector, and a null-embedding row (no
      // evidence, must survive)
      input.addData(
        (1L, ts(0), Seq(2f, 0f, 0f, 0f)),
        (2L, ts(1), Seq(0f, 0f, 1f, 0f)),
        (3L, ts(2), null.asInstanceOf[Seq[Float]]))
      query.processAllAvailable()
      // advance the watermark so the verdict windows close
      input.addData((99L, ts(60, 0), Seq(0f, 0f, 0f, 1f)))
      query.processAllAvailable()
      val out = spark.table("semprobe_out")
        .select("doc_id").as[Long].collect().sorted.toSeq
      assert(out == Seq(2L, 3L), s"survivors: $out")
      // the stream only PROBES — the index is never stream-mutated
      assert(spark.table("semprobe_idx").count() == idxBefore)
    } finally query.stop()
  }

  test("stream-stream interval join matches within the window; left_outer emits timeouts") {
    implicit val sqlCtx = spark.sqlContext
    val imps = MemoryStream[(Long, Timestamp)]
    val clicks = MemoryStream[(Long, Timestamp, String)]
    val joined = EventStreams.intervalJoin(
      imps.toDF().toDF("ad_id", "its"),
      clicks.toDF().toDF("ad_id", "cts", "target"),
      "ad_id", "its", "cts", within = "10 minutes", watermark = "5 minutes",
      joinType = "left_outer")
    val query = joined.writeStream.format("memory").queryName("ij_out")
      .outputMode("append").start()
    try {
      // impressions: ad 1 at t0, ad 2 at t1, ad 3 at t2
      imps.addData((1L, ts(0)), (2L, ts(1)), (3L, ts(2)))
      // clicks: ad 1 inside its window; ad 2 AFTER its window (t1+12min);
      // ad 3 never clicks
      clicks.addData((1L, ts(4), "a"), (2L, ts(13), "b"))
      query.processAllAvailable()
      // advance both watermarks far enough to close every join window so
      // the unmatched left rows (2 and 3) emit their outer results
      imps.addData((99L, ts(40)))
      clicks.addData((99L, ts(40), "hb"))
      query.processAllAvailable()
      val rows = spark.table("ij_out")
        .select("ad_id", "target")
        .collect().map(r => (r.getLong(0),
          if (r.isNullAt(1)) null else r.getString(1)))
        .filter(_._1 != 99L).sortBy(_._1).toList
      assert(rows == List((1L, "a"), (2L, null), (3L, null)), s"joined: $rows")
    } finally query.stop()
    // ambiguous non-key columns are rejected loudly
    val e = intercept[IllegalArgumentException] {
      EventStreams.intervalJoin(
        imps.toDF().toDF("ad_id", "ts2"),
        clicks.toDF().toDF("ad_id", "ts2", "target"),
        "ad_id", "ts2", "ts2")
    }
    assert(e.getMessage.contains("ambiguous"))
  }

  test("curateDocs fuses MinHash and semantic index probes into one verdict") {
    implicit val sqlCtx = spark.sqlContext
    val base = "the quick brown fox jumps over the lazy dog while the cat sleeps " +
      "on the warm windowsill and the birds sing in the garden every morning " +
      "as the sun rises over the quiet town and the day begins for everyone"
    val mutated = base.replace("windowsill", "doorstep") // near-dup of the INDEXED text
    val paraphrase = "a speedy auburn fox leaps across a sleepy hound as the kitten " +
      "rests beside a sunlit window ledge and songbirds greet the dawn above a " +
      "peaceful village where each new day quietly begins for all the residents"
    val fresh = "an entirely different english document about the history of " +
      "the spark engine that is long enough to pass the quality gate and it was " +
      "written for this test of the streaming intake path with both index probes"
    import graft.dedup.Dedup
    import graft.similarity.Similarity
    import graft.sources.Warehouse
    for (tb <- Seq("cdsem_mh_idx", "cdsem_mh_idx_sigs", "cdsem_mh_idx_mhspec",
        "cdsem_ivf_idx", "cdsem_ivf_idx_centroids"))
      Warehouse.dropTableAndLocation(spark, tb)
    Dedup.writeMinhashIndex(Seq((100L, base)).toDF("doc_id", "text"),
      "text", "doc_id", "cdsem_mh_idx", buckets = 2)
    Similarity.writeIvfIndex(
      Seq((100L, Seq(1f, 0f, 0f, 0f)), (101L, Seq(0f, 1f, 0f, 0f)))
        .toDF("doc_id", "emb"),
      "doc_id", "emb", "cdsem_ivf_idx", nCentroids = 2, lloydIters = 1,
      buckets = 2)
    val input = MemoryStream[(Long, Timestamp, String, Seq[Float])]
    val docs = input.toDF().toDF("doc_id", "ts", "text", "emb")
    val query = EventStreams.curateDocs(docs, "text", "ts",
      langs = Set("en"), minQuality = 0.5, watermark = "10 minutes",
      nearIndexTable = Some("cdsem_mh_idx"), nearIndexIdCol = Some("doc_id"),
      semanticIndexTable = Some("cdsem_ivf_idx"), embCol = Some("emb"))
      .writeStream.format("memory").queryName("cdsem_out")
      .outputMode("append").start()
    try {
      // 1 = text-mutated replay of the indexed corpus (MinHash tier, its
      //     embedding is fresh); 2 = PARAPHRASE: fresh text that shares no
      //     shingles with the corpus but replays an indexed embedding
      //     (only the semantic tier can drop it); 3 = fresh on both
      //     identities (survives the fused verdict)
      input.addData(
        (1L, ts(0), mutated, Seq(0f, 0f, 1f, 0f)),
        (2L, ts(1), paraphrase, Seq(2f, 0f, 0f, 0f)),
        (3L, ts(2), fresh, Seq(0f, 0f, 0f, 1f)))
      query.processAllAvailable()
      input.addData((99L, ts(60, 0), fresh + " heartbeat tail of words",
        null.asInstanceOf[Seq[Float]]))
      query.processAllAvailable()
      val out = spark.table("cdsem_out")
        .select("doc_id").as[Long].collect().sorted.toSeq
      assert(out == Seq(3L), s"survivors: $out")
      // probes never stream-mutate either index
      assert(spark.table("cdsem_mh_idx_sigs").count() == 1L)
      assert(spark.table("cdsem_ivf_idx").count() == 2L)
    } finally query.stop()
    // configuration contracts fail loudly, not silently
    val e1 = intercept[IllegalArgumentException] {
      EventStreams.curateDocs(docs, "text", "ts",
        langs = Set("en"), minQuality = 0.5,
        semanticIndexTable = Some("cdsem_ivf_idx"), embCol = Some("emb"))
    }
    assert(e1.getMessage.contains("nearIndexIdCol"))
    val e2 = intercept[IllegalArgumentException] {
      EventStreams.curateDocs(docs, "text", "ts",
        langs = Set("en"), minQuality = 0.5,
        nearIndexIdCol = Some("doc_id"),
        semanticIndexTable = Some("cdsem_ivf_idx"))
    }
    assert(e2.getMessage.contains("embCol"))
    val e3 = intercept[IllegalArgumentException] {
      EventStreams.curateDocs(docs, "text", "ts",
        langs = Set("en"), minQuality = 0.5,
        nearDedupIdCol = Some("doc_id"),
        semanticIndexTable = Some("cdsem_ivf_idx"), embCol = Some("emb"))
    }
    assert(e3.getMessage.contains("banded"))
  }

  test("curateMediaStream gates, dedups cross-batch, probes the hamming index, keeps corrupt") {
    import graft.dedup.Dedup
    import graft.multimodal.{ImageCodec, PpmCodec}
    import graft.pipeline.MediaPipeline
    import graft.pipeline.MediaPipeline.MediaConfig
    implicit val sqlCtx = spark.sqlContext
    // three mutually-distant 8×8 patterns: dHash puts each light region's
    // right edge at a different column (the video-dedup spec's trick)
    def pattern(edge: Int) = PpmCodec.Image(8, 8, Array.tabulate(8 * 8 * 3) {
      i => (if ((i / 3) % 8 < edge) 255 else 0).toByte
    })
    val base = pattern(4)
    val fresh = pattern(6)
    val historical = pattern(2)
    // near replay of the HISTORICAL image: one corner pixel flipped
    val nearRgb = Array.tabulate(8 * 8 * 3)(i =>
      (if ((i / 3) % 8 < 2) 255 else 0).toByte)
    nearRgb(0) = 0.toByte; nearRgb(1) = 0.toByte; nearRgb(2) = 0.toByte
    val nearHist = PpmCodec.Image(8, 8, nearRgb)
    for (t <- Seq("cms_hidx", "cms_hidx_hspec"))
      graft.sources.Warehouse.dropTableAndLocation(spark, t)
    Dedup.writeHammingIndex(
      Multimodal.perceptualHash(Multimodal.asMedia(
          Seq((100L, PpmCodec.encode(historical))).toDF("id", "payload"),
          "id", "payload", "image/mixed"))
        .select($"media_id".as("id"), $"phash".as("h")),
      "cms_hidx", maxHamming = 4, buckets = 2)
    val idxBefore = spark.table("cms_hidx").count()
    val input = MemoryStream[(Long, Timestamp, Array[Byte])]
    val media = input.toDF().toDF("media_id", "ts", "content")
      .withColumn("mime", lit("image/mixed"))
    val query = MediaPipeline.curateMediaStream(media, "ts",
        MediaConfig(minWidth = Some(6), keepUnprobed = true,
          hammingIndexTable = Some("cms_hidx")),
        watermark = "10 minutes")
      .writeStream.format("memory").queryName("cms_out")
      .outputMode("append").start()
    try {
      // batch 1: an UNDERSIZED blocky resize of base arrives FIRST — the
      // gate must drop it before the dedup state, or it would claim
      // base's fingerprint slot and base (id 2) would never survive;
      // a corrupt blob (keepUnprobed) must ride through every tier
      input.addData(
        (1L, ts(0), PpmCodec.encode(PpmCodec.resize(base, 4, 4))),
        (2L, ts(1), PpmCodec.encode(base)),
        (3L, ts(2), "corrupt blob one".getBytes("UTF-8")))
      query.processAllAvailable()
      // batch 2: a PNG re-encode of batch 1's survivor (within-watermark
      // state drop), a near replay of the INDEXED historical corpus
      // (index probe drop — the state never saw it), a fresh image, and
      // a second corrupt blob (null fingerprints never match)
      input.addData(
        (4L, ts(3), ImageCodec.encodePng(base)),
        (5L, ts(4), PpmCodec.encode(nearHist)),
        (6L, ts(5), ImageCodec.encodePng(fresh)),
        (7L, ts(6), "corrupt blob two".getBytes("UTF-8")))
      query.processAllAvailable()
      // heartbeat pushes the watermark so the probe's verdict windows close
      input.addData((99L, ts(60, 0), PpmCodec.encode(pattern(7))))
      query.processAllAvailable()
      val rows = spark.table("cms_out")
        .select("media_id", "width", "phash")
        .collect().map(r => r.getLong(0) -> (r.isNullAt(1), r.isNullAt(2))).toMap
      assert(rows.keySet == Set(1L, 2L, 3L, 6L, 7L) - 1L,
        s"survivors: ${rows.keySet.toSeq.sorted}")
      // evidence columns survive the chain: probed width + carried phash
      // on real images, both null on the corrupt blobs
      assert(rows(2L) == ((false, false)) && rows(6L) == ((false, false)))
      assert(rows(3L) == ((true, true)) && rows(7L) == ((true, true)))
      // the stream only PROBES — the index is never stream-mutated
      assert(spark.table("cms_hidx").count() == idxBefore)
    } finally query.stop()
  }

  test("multimodal: streaming perceptual dedup drops re-encoded re-posts cross-batch") {
    import graft.multimodal.{ImageCodec, PpmCodec}
    implicit val sqlCtx = spark.sqlContext
    def halves(lightLeft: Boolean) = Array.tabulate(8 * 8 * 3) { i =>
      val x = (i / 3) % 8
      (if ((x < 4) == lightLeft) 255 else 0).toByte
    }
    val base = PpmCodec.Image(8, 8, halves(lightLeft = false))
    val reversed = PpmCodec.Image(8, 8, halves(lightLeft = true))
    val input = MemoryStream[(Long, Timestamp, Array[Byte])]
    val media = input.toDF().toDF("media_id", "ts", "content")
      .withColumn("mime", lit("image/mixed"))
    val query = Multimodal.dedupePerceptualStream(media, "ts", "1 hour")
      .writeStream.format("memory").queryName("pdedup_out")
      .outputMode("append").start()
    try {
      input.addData(
        (1L, ts(0), PpmCodec.encode(base)),
        (2L, ts(1), "corrupt blob one".getBytes("UTF-8")))
      query.processAllAvailable()
      // batch 2: a PNG re-post of batch 1's image (dropped), a resized
      // re-post (dropped: blocky resize is hash-identical), a distinct
      // image (kept), and a second corrupt blob (kept — nulls never match)
      input.addData(
        (3L, ts(2), ImageCodec.encodePng(base)),
        (4L, ts(3), PpmCodec.encode(PpmCodec.resize(base, 4, 4))),
        (5L, ts(4), ImageCodec.encodePng(reversed)),
        (6L, ts(5), "corrupt blob two".getBytes("UTF-8")))
      query.processAllAvailable()
      val ids = spark.table("pdedup_out").select("media_id").as[Long]
        .collect().sorted.toSeq
      assert(ids == Seq(1L, 2L, 5L, 6L), s"survivors: $ids")
    } finally query.stop()
  }

  test("multimodal: video perceptual dedup — re-encodes collapse, reordered cuts survive") {
    import javax.imageio.{IIOImage, ImageIO}
    import graft.multimodal.{ImageCodec, PpmCodec}
    // three mutually-distinct black/white frames (primaries survive GIF
    // palette quantization; solid colors would all dHash to 0)
    def pattern(f: (Int, Int) => Boolean, size: Int) = {
      val bi = new java.awt.image.BufferedImage(size, size,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until size; x <- 0 until size)
        bi.setRGB(x, y, if (f(x * 8 / size, y * 8 / size)) 0xFFFFFF else 0)
      bi
    }
    // dHash sets bits only on LIGHT→DARK transitions, so each frame puts
    // its light region's right edge at a different column
    val fLeft: (Int, Int) => Boolean = (x, _) => x < 4    // light left half
    val fRight: (Int, Int) => Boolean = (x, _) => x < 2   // light quarter
    val fQuarter: (Int, Int) => Boolean = (x, _) => x < 6 // light 3/4
    // move row 0's edge one column left: exactly the row-0 bits flip
    val fLeftTweak: (Int, Int) => Boolean = (x, y) => x < 4 && !(x == 3 && y == 0)
    def gif(size: Int, fs: ((Int, Int) => Boolean)*) = {
      val writer = ImageIO.getImageWritersByFormatName("gif").next()
      val bos = new java.io.ByteArrayOutputStream()
      val ios = ImageIO.createImageOutputStream(bos)
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      for (f <- fs) writer.writeToSequence(new IIOImage(pattern(f, size), null, null), null)
      writer.endWriteSequence(); writer.dispose(); ios.close()
      bos.toByteArray
    }
    // premise: the three frames are far apart in dHash space; the tweak
    // is within the radius of fLeft
    def png(f: (Int, Int) => Boolean) = ImageCodec.encodePng(PpmCodec.Image(8, 8,
      Array.tabulate(8 * 8 * 3)(i => (if (f((i / 3) % 8, (i / 3) / 8)) 255 else 0).toByte)))
    val dhMap = Multimodal.perceptualHash(Multimodal.asMedia(
        Seq((0L, png(fLeft)), (1L, png(fRight)), (2L, png(fQuarter)),
          (3L, png(fLeftTweak))).toDF("id", "payload"), "id", "payload", "image/png"))
      .select("media_id", "phash").as[(Long, Long)].collect().toMap
    def dh(f: (Int, Int) => Boolean) = f match {
      case `fLeft` => dhMap(0L); case `fRight` => dhMap(1L)
      case `fQuarter` => dhMap(2L); case _ => dhMap(3L)
    }
    def dist(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(dist(dh(fLeft), dh(fRight)) > 2 && dist(dh(fLeft), dh(fQuarter)) > 2 &&
      dist(dh(fRight), dh(fQuarter)) > 2, "premise: frames too close")
    val tweakDist = dist(dh(fLeft), dh(fLeftTweak))
    assert(tweakDist >= 1 && tweakDist <= 2, s"premise: tweak distance $tweakDist")
    val df = Seq(
      (1L, gif(8, fLeft, fRight, fQuarter)),    // base animation
      (2L, gif(16, fLeft, fRight, fQuarter)),   // scaled re-encode: exact tier
      (3L, gif(8, fLeftTweak, fRight, fQuarter)), // 1 frame tweaked: near tier
      (4L, gif(8, fQuarter, fRight, fLeft)),    // SAME frames reordered: survives
      (5L, "definitely not a gif".getBytes("UTF-8"))) // corrupt: survives
      .toDF("id", "payload")
    val media = Multimodal.asMedia(df, "id", "payload", "image/gif")
    val out = Multimodal.dedupeVideoPerceptual(media, n = 3, minMatches = 2,
        maxHamming = 2)
      .select("media_id").as[Long].collect().sorted.toSeq
    // 2 collapses exactly (blocky resize is per-frame hash-identical), 3
    // near-collapses (2 of 3 frames match, 1 within radius), 4 misaligns
    // (only the middle position matches), 5 has no evidence
    assert(out == Seq(1L, 4L, 5L), s"survivors: $out")
  }

  test("multimodal: audio perceptual dedup — WAV/AIFF re-encodes collapse, other content survives") {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    import graft.multimodal.AudioCodec
    val rate = 8000
    def clip(amp: Int => Double, freq: Double) = Array.tabulate[Short](rate) { i =>
      (math.sin(2 * math.Pi * freq * i / rate) * 32767 * amp(i)).toInt.toShort
    }
    def encode(samples: Array[Short], kind: AudioFileFormat.Type, big: Boolean) = {
      val raw = new Array[Byte](samples.length * 2)
      for (i <- samples.indices) {
        val s = samples(i)
        if (big) { raw(i * 2) = ((s >> 8) & 0xFF).toByte; raw(i * 2 + 1) = (s & 0xFF).toByte }
        else { raw(i * 2) = (s & 0xFF).toByte; raw(i * 2 + 1) = ((s >> 8) & 0xFF).toByte }
      }
      val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, rate, 16, 1, 2, rate, big)
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(new AudioInputStream(
        new java.io.ByteArrayInputStream(raw), fmt, samples.length), kind, bos)
      bos.toByteArray
    }
    // base: 440 Hz under a rising ramp (envelope bits mostly "up")
    val ramp = (i: Int) => 0.9 * i / rate
    val baseClip = clip(ramp, 440)
    // near: one mid-clip dip flips a couple of envelope delta signs
    val dip = (i: Int) => ramp(i) * (if (i * 33 / rate == 16) 0.7 else 1.0)
    val nearClip = clip(dip, 440)
    // different pitch, same envelope: brightness half separates it
    val brightClip = clip(ramp, 2500)
    val wav = encode(baseClip, AudioFileFormat.Type.WAVE, big = false)
    val aiff = encode(baseClip, AudioFileFormat.Type.AIFF, big = true)
    // premise: re-encodes decode to the same PCM hence the same
    // fingerprint; the dip is within the radius; the pitch change is not
    val fp = Seq(wav, aiff, encode(nearClip, AudioFileFormat.Type.WAVE, big = false),
      encode(brightClip, AudioFileFormat.Type.WAVE, big = false))
      .map(b => AudioCodec.fingerprint(AudioCodec.decode(b).get))
    def dist(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(fp(0) == fp(1), "premise: WAV and AIFF fingerprints diverged")
    assert(dist(fp(0), fp(2)) >= 1 && dist(fp(0), fp(2)) <= 4,
      s"premise: dip distance ${dist(fp(0), fp(2))}")
    assert(dist(fp(0), fp(3)) > 4, s"premise: pitch distance ${dist(fp(0), fp(3))}")
    val df = Seq(
      (1L, wav),
      (2L, aiff),                                               // re-encode: exact tier
      (3L, encode(nearClip, AudioFileFormat.Type.WAVE, big = false)),  // near tier
      (4L, encode(brightClip, AudioFileFormat.Type.WAVE, big = false)), // survives
      (5L, "mp3-shaped junk bytes".getBytes("UTF-8")))          // corrupt: survives
      .toDF("id", "payload")
    val media = Multimodal.asMedia(df, "id", "payload", "audio/mixed")
    val out = Multimodal.dedupeAudioPerceptual(media, maxHamming = 4)
      .select("media_id").as[Long].collect().sorted.toSeq
    assert(out == Seq(1L, 4L, 5L), s"survivors: $out")
  }

  test("multimodal: audio hamming index dedups NEAR re-posts across runs") {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    import graft.dedup.Dedup
    val rate = 8000
    def clip(amp: Int => Double, freq: Double) = Array.tabulate[Short](rate) { i =>
      (math.sin(2 * math.Pi * freq * i / rate) * 32767 * amp(i)).toInt.toShort
    }
    def encode(samples: Array[Short], kind: AudioFileFormat.Type, big: Boolean) = {
      val raw = new Array[Byte](samples.length * 2)
      for (i <- samples.indices) {
        val s = samples(i)
        if (big) { raw(i * 2) = ((s >> 8) & 0xFF).toByte; raw(i * 2 + 1) = (s & 0xFF).toByte }
        else { raw(i * 2) = (s & 0xFF).toByte; raw(i * 2 + 1) = ((s >> 8) & 0xFF).toByte }
      }
      val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, rate, 16, 1, 2, rate, big)
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(new AudioInputStream(
        new java.io.ByteArrayInputStream(raw), fmt, samples.length), kind, bos)
      bos.toByteArray
    }
    val ramp = (i: Int) => 0.9 * i / rate
    val dip = (i: Int) => ramp(i) * (if (i * 33 / rate == 16) 0.7 else 1.0)
    val baseClip = clip(ramp, 440)
    def media(rows: (Long, Array[Byte])*) = Multimodal.asMedia(
      rows.toDF("id", "payload"), "id", "payload", "audio/mixed")
    for (t <- Seq("aham_idx", "aham_idx_hspec"))
      graft.sources.Warehouse.dropTableAndLocation(spark, t)
    // day 0: index the historical clip's envelope fingerprint
    Dedup.writeHammingIndex(
      Multimodal.audioHash(media(
          100L -> encode(baseClip, AudioFileFormat.Type.WAVE, big = false)))
        .select($"media_id".as("id"), $"ahash".as("h")),
      "aham_idx", maxHamming = 4, buckets = 4)
    // run 1: the AIFF re-encode (distance 0) AND the mid-clip dip (a few
    // bits — the exact registry would miss it) drop; the different-pitch
    // clip and the corrupt blob survive, and the survivor registers
    val out1 = Multimodal.dedupeAudioPerceptualAgainstIndex(media(
        1L -> encode(baseClip, AudioFileFormat.Type.AIFF, big = true),
        2L -> encode(clip(dip, 440), AudioFileFormat.Type.WAVE, big = false),
        3L -> encode(clip(ramp, 2500), AudioFileFormat.Type.WAVE, big = false),
        4L -> "not audio".getBytes("UTF-8")), "aham_idx")
      .select("media_id").as[Long].collect().sorted.toSeq
    assert(out1 == Seq(3L, 4L), s"run 1 survivors: $out1")
    // run 2: a re-post of run 1's survivor is caught by the grown index
    val out2 = Multimodal.dedupeAudioPerceptualAgainstIndex(media(
        10L -> encode(clip(ramp, 2500), AudioFileFormat.Type.AIFF, big = true)),
      "aham_idx", update = false)
      .select("media_id").as[Long].collect().toSeq
    assert(out2.isEmpty, s"run 2 survivors: $out2")
  }

  test("multimodal: streaming audio dedup drops WAV→AIFF re-posts cross-batch") {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    implicit val sqlCtx = spark.sqlContext
    val rate = 8000
    def clip(amp: Int => Double, freq: Double) = Array.tabulate[Short](rate) { i =>
      (math.sin(2 * math.Pi * freq * i / rate) * 32767 * amp(i)).toInt.toShort
    }
    def encode(samples: Array[Short], kind: AudioFileFormat.Type, big: Boolean) = {
      val raw = new Array[Byte](samples.length * 2)
      for (i <- samples.indices) {
        val s = samples(i)
        if (big) { raw(i * 2) = ((s >> 8) & 0xFF).toByte; raw(i * 2 + 1) = (s & 0xFF).toByte }
        else { raw(i * 2) = (s & 0xFF).toByte; raw(i * 2 + 1) = ((s >> 8) & 0xFF).toByte }
      }
      val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, rate, 16, 1, 2, rate, big)
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(new AudioInputStream(
        new java.io.ByteArrayInputStream(raw), fmt, samples.length), kind, bos)
      bos.toByteArray
    }
    val ramp = (i: Int) => 0.9 * i / rate
    val baseClip = clip(ramp, 440)
    val brightClip = clip(ramp, 2500)
    val input = MemoryStream[(Long, Timestamp, Array[Byte])]
    val media = input.toDF().toDF("media_id", "ts", "content")
    val query = Multimodal.dedupeAudioPerceptualStream(media, "ts", "1 hour")
      .writeStream.format("memory").queryName("adedup_out")
      .outputMode("append").start()
    try {
      input.addData(
        (1L, ts(0), encode(baseClip, AudioFileFormat.Type.WAVE, big = false)),
        (2L, ts(1), "corrupt audio one".getBytes("UTF-8")))
      query.processAllAvailable()
      // batch 2: an AIFF re-post of batch 1's clip (dropped — identical
      // PCM, identical fingerprint), a different-pitch clip (kept), and a
      // second corrupt blob (kept — nulls never match)
      input.addData(
        (3L, ts(2), encode(baseClip, AudioFileFormat.Type.AIFF, big = true)),
        (4L, ts(3), encode(brightClip, AudioFileFormat.Type.WAVE, big = false)),
        (5L, ts(4), "corrupt audio two".getBytes("UTF-8")))
      query.processAllAvailable()
      val ids = spark.table("adedup_out").select("media_id").as[Long]
        .collect().sorted.toSeq
      assert(ids == Seq(1L, 2L, 4L, 5L), s"survivors: $ids")
    } finally query.stop()
  }

  test("multimodal: streaming video dedup drops rescaled re-posts, keeps reordered cuts") {
    import javax.imageio.{IIOImage, ImageIO}
    implicit val sqlCtx = spark.sqlContext
    def pattern(f: (Int, Int) => Boolean, size: Int) = {
      val bi = new java.awt.image.BufferedImage(size, size,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until size; x <- 0 until size)
        bi.setRGB(x, y, if (f(x * 8 / size, y * 8 / size)) 0xFFFFFF else 0)
      bi
    }
    val fA: (Int, Int) => Boolean = (x, _) => x < 4
    val fB: (Int, Int) => Boolean = (x, _) => x < 2
    val fC: (Int, Int) => Boolean = (x, _) => x < 6
    def gif(size: Int, fs: ((Int, Int) => Boolean)*) = {
      val writer = ImageIO.getImageWritersByFormatName("gif").next()
      val bos = new java.io.ByteArrayOutputStream()
      val ios = ImageIO.createImageOutputStream(bos)
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      for (f <- fs) writer.writeToSequence(new IIOImage(pattern(f, size), null, null), null)
      writer.endWriteSequence(); writer.dispose(); ios.close()
      bos.toByteArray
    }
    val input = MemoryStream[(Long, Timestamp, Array[Byte])]
    val media = input.toDF().toDF("media_id", "ts", "content")
    val query = Multimodal.dedupeVideoPerceptualStream(media, n = 3, "ts", "1 hour")
      .writeStream.format("memory").queryName("vdedup_out")
      .outputMode("append").start()
    try {
      input.addData(
        (1L, ts(0), gif(8, fA, fB, fC)),
        (2L, ts(1), "not a gif".getBytes("UTF-8")))
      query.processAllAvailable()
      // batch 2: a SCALED re-encode of batch 1's animation (dropped —
      // per-frame dHash is resample-invariant, so the full vector keys
      // identically), a reordered cut of the same frames (kept — order is
      // content), a second corrupt blob (kept)
      input.addData(
        (3L, ts(2), gif(16, fA, fB, fC)),
        (4L, ts(3), gif(8, fC, fB, fA)),
        (5L, ts(4), "still not a gif".getBytes("UTF-8")))
      query.processAllAvailable()
      val ids = spark.table("vdedup_out").select("media_id").as[Long]
        .collect().sorted.toSeq
      assert(ids == Seq(1L, 2L, 4L, 5L), s"survivors: $ids")
    } finally query.stop()
  }

  test("multimodal: real WAV decode yields duration, rate, and RMS features") {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    // 1 second of 8 kHz mono: first half a full-scale 440 Hz tone, second
    // half silence — window RMS must separate the halves
    val rate = 8000
    val pcm = new Array[Byte](rate * 2)
    for (i <- 0 until rate / 2) {
      val s = (math.sin(2 * math.Pi * 440 * i / rate) * 32767 * 0.9).toInt.toShort
      pcm(i * 2) = (s & 0xFF).toByte
      pcm(i * 2 + 1) = ((s >> 8) & 0xFF).toByte
    }
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, rate, 16, 1, 2, rate, false)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, rate), AudioFileFormat.Type.WAVE, bos)
    val wav = bos.toByteArray
    val decoded = graft.multimodal.AudioCodec.decode(wav).get
    assert(decoded.sampleRate == 8000f && decoded.samples.length == rate)
    assert(decoded.durationMs == 1000L)
    // Spark path: real features + metadata for the WAV, stub + null
    // metadata for an undecodable blob, one row each, no failure
    val df = Seq((1L, wav), (2L, "mp3-shaped junk bytes here".getBytes("UTF-8")))
      .toDF("id", "payload")
    val media = Multimodal.asMedia(df, "id", "payload", "audio/wav")
    val out = Multimodal.extractAudioFeatures(media, dim = 4)
      .as[(Long, Option[Long], Option[Float], Seq[Float])].collect()
      .map(r => r._1 -> r).toMap
    assert(out.size == 2)
    val (_, dur, sr, feats) = out(1L)
    assert(dur.contains(1000L) && sr.contains(8000f) && feats.length == 4)
    // tone halves carry ~0.64 RMS (0.9 amplitude sine), silence ~0
    assert(feats(0) > 0.5f && feats(1) > 0.5f, s"tone windows: $feats")
    assert(feats(2) < 0.01f && feats(3) < 0.01f, s"silent windows: $feats")
    val (_, dur2, sr2, feats2) = out(2L)
    assert(dur2.isEmpty && sr2.isEmpty && feats2.length == 4)
  }

  test("multimodal: animated GIF frames really decode via sampleFramesDecoded") {
    import javax.imageio.{IIOImage, ImageIO}
    // 3-frame animated GIF: solid red, green, blue (primaries survive GIF
    // palette quantization exactly)
    def solid(rgb: Int) = {
      val bi = new java.awt.image.BufferedImage(4, 4,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 4; x <- 0 until 4) bi.setRGB(x, y, rgb)
      bi
    }
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    for (c <- Seq(0xFF0000, 0x00FF00, 0x0000FF))
      writer.writeToSequence(new IIOImage(solid(c), null, null), null)
    writer.endWriteSequence(); writer.dispose(); ios.close()
    val gif = bos.toByteArray
    val (total, frameAt) = graft.multimodal.ImageCodec.frames(gif).get
    assert(total == 3)
    assert(frameAt(0).get.rgb(0) == -1.toByte.toInt.toByte) // red channel 255
    val df = Seq((1L, gif), (2L, "not a gif at all here".getBytes("UTF-8")))
      .toDF("id", "payload")
    val media = Multimodal.asMedia(df, "id", "payload", "image/gif")
    val out = Multimodal.sampleFramesDecoded(media, 3)
      .select("media_id", "frame_idx", "content")
      .as[(Long, Int, Option[Array[Byte]])].collect()
    assert(out.length == 6)
    // the GIF's 3 samples decode to the 3 distinct solid frames, as PNG
    val gifFrames = out.filter(_._1 == 1L).sortBy(_._2)
      .map(_._3.get).map(b => graft.multimodal.ImageCodec.decode(b).get)
    assert(gifFrames.map(f => (f.rgb(0), f.rgb(1), f.rgb(2))).toSeq == Seq(
      (-1, 0, 0), (0, -1, 0), (0, 0, -1))
      .map(t => (t._1.toByte, t._2.toByte, t._3.toByte)))
    // non-multi-frame content degrades to the stub shape, never fails
    assert(out.filter(_._1 == 2L).forall(_._3.isEmpty))
  }

  test("multimodal: frame sampling explodes n rows per video") {
    val df = Seq((5L, "video")).toDF("id", "payload")
      .withColumn("payload", col("payload").cast("binary"))
    val media = Multimodal.asMedia(df, "id", "payload", "video/mp4")
    val frames = Multimodal.sampleFrames(media, 4)
    assert(frames.count() == 4)
    assert(frames.agg(max("frame_idx")).head().getInt(0) == 3)
  }

  test("streaming debounce: in-order parity with the batch operator; " +
    "state carries across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val query = EventStreams.debounceStream(input.toDS(),
        cooldownSeconds = 300)
      .writeStream.format("memory").queryName("debounce_out")
      .outputMode("append").start()
    val all = Seq(
      Event(1, ts(0), 7, "a", 1.0),   // kept (first)
      Event(2, ts(2), 7, "a", 1.0),   // 2 min gap -> suppressed
      Event(3, ts(10), 7, "a", 1.0),  // 8 min after e2 -> kept
      Event(4, ts(12), 8, "a", 1.0),  // other key, first -> kept
      // batch 2: gap measured against e3 (10:00), not e1
      Event(5, ts(14), 7, "a", 1.0),  // 4 min after e3 -> suppressed
      Event(6, ts(20), 7, "a", 1.0))  // 6 min after e5 -> kept
    try {
      input.addData(all.take(4): _*)
      query.processAllAvailable()
      input.addData(all.drop(4): _*)
      query.processAllAvailable()
      val got = spark.table("debounce_out").select("event_id")
        .as[Long].collect().toSet
      assert(got == Set(1L, 3L, 4L, 6L), s"$got")
      // in-order parity with the batch operator over the union
      val batch = graft.operators.EventOps.debounce(
          all.toDF("event_id", "ts", "user_id", "event_type", "value"),
          "user_id", "ts", 300L)
        .select("event_id").as[Long].collect().toSet
      assert(got == batch, s"stream $got vs batch $batch")
    } finally query.stop()
    intercept[IllegalArgumentException] {
      EventStreams.debounceStream(input.toDS(), 0)
    }
  }

  test("kept-chain debounce: gap measured against the last KEPT event — " +
    "a steady drizzle re-fires once per cooldown; batch/stream parity") {
    implicit val sqlCtx = spark.sqlContext
    // drizzle every 2 min, cooldown 5 min: raw-gap debounce keeps only
    // the first event forever; the kept-chain re-fires at 6, 12, 18 min
    val all = (0 until 10).map(i =>
      Event(i + 1L, ts(2 * i), 7, "a", 1.0)) :+
      Event(100L, ts(2), 8, "a", 1.0) // other key, first -> kept
    val df = all.toDF("event_id", "ts", "user_id", "event_type", "value")
    val chain = graft.operators.EventOps.debounceChain(
        df, "user_id", "ts", 300L)
      .select("event_id").as[Long].collect().toSet
    // key 7: 0,6,12,18 min -> events 1,4,7,10
    assert(chain == Set(1L, 4L, 7L, 10L, 100L), s"$chain")
    // the stateless operator on the same drizzle: only the firsts
    val raw = graft.operators.EventOps.debounce(df, "user_id", "ts", 300L)
      .select("event_id").as[Long].collect().toSet
    assert(raw == Set(1L, 100L), s"$raw")
    // streaming twin: same rows, state carries across batches
    val input = MemoryStream[Event]
    val query = EventStreams.debounceChainStream(input.toDS(),
        cooldownSeconds = 300)
      .writeStream.format("memory").queryName("debounce_chain_out")
      .outputMode("append").start()
    try {
      input.addData(all.take(5): _*)
      query.processAllAvailable()
      input.addData(all.drop(5): _*)
      query.processAllAvailable()
      val got = spark.table("debounce_chain_out").select("event_id")
        .as[Long].collect().toSet
      assert(got == chain, s"stream $got vs batch $chain")
    } finally query.stop()
    // null ts is rejected loudly, not silently ordered
    val withNull = df.unionByName(
      Seq((200L, 7L, "a", 1.0)).toDF("event_id", "user_id", "event_type", "value")
        .withColumn("ts", lit(null).cast("timestamp"))
        .select("event_id", "ts", "user_id", "event_type", "value"))
    val ex = intercept[org.apache.spark.SparkException] {
      graft.operators.EventOps.debounceChain(
        withNull, "user_id", "ts", 300L).count()
    }
    assert(ex.getMessage != null)
    intercept[IllegalArgumentException] {
      EventStreams.debounceChainStream(input.toDS(), 0)
    }
  }

  test("streaming CDC apply: each batch publishes the next committed " +
    "snapshot version; history diffs cleanly") {
    implicit val sqlCtx = spark.sqlContext
    import graft.sources.Warehouse
    val root = java.nio.file.Files
      .createTempDirectory("cdc_stream_root").toString + "/snap"
    val ckpt = java.nio.file.Files
      .createTempDirectory("cdc_stream_ckpt").toString
    // (k, v, op, seq)
    val input = MemoryStream[(Long, String, String, Long)]
    val query = graft.streaming.WarehouseStreams.applyChangesStream(
      input.toDF().toDF("k", "v", "op", "seq"), root, "k", Seq("seq"),
      "op", ckpt, numShards = 2)
    try {
      // batch 1: insert-only bootstrap onto the empty root
      input.addData((1L, "a", "I", 1L), (2L, "b", "I", 1L))
      query.processAllAvailable()
      val v1 = Warehouse.latestShards(spark, root).get
      assert(v1.endsWith("/v1"), v1)
      val s1 = spark.read.parquet(v1).select("k", "v")
        .as[(Long, String)].collect().toSet
      assert(s1 == Set((1L, "a"), (2L, "b")), s"$s1")
      // batch 2: update 2, delete 1, insert 3 — applies on v1's snapshot
      input.addData((2L, "b2", "U", 2L), (1L, "a", "D", 2L),
        (3L, "c", "I", 1L))
      query.processAllAvailable()
      val v2 = Warehouse.latestShards(spark, root).get
      assert(v2.endsWith("/v2"), v2)
      val s2 = spark.read.parquet(v2).select("k", "v")
        .as[(Long, String)].collect().toSet
      assert(s2 == Set((2L, "b2"), (3L, "c")), s"$s2")
      // the version history doubles as the change audit
      val diff = Warehouse.diffVersions(spark, root, 1, 2, "k", Seq("v"))
        .as[(Long, String)].collect().toMap
      assert(diff == Map(1L -> "removed", 2L -> "changed", 3L -> "added"),
        s"$diff")
    } finally query.stop()
  }
}
